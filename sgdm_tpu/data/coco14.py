"""COCO 2014 instances dataset (vq-diffusion style) at diffusion scale.

TPU-native rewrite of `dataset/coco14_vqdiffusion.py:55-332 CocoDataset`:
images from `{split}2014/`, per-image instance annotations from
`annotations/instances_{split}2014.json` (:277-284), instance segmentations
rasterized into a class-id segmask feeding the complex getitem contract
(attr n-hot, segmask one-hot, layouts).

Dependency note: the reference rasterizes with pycocotools + cv2; neither is
in the TPU image, so polygon segmentations are filled with PIL ImageDraw
(identical fills for polygon annotations; crowd-RLE annotations — a small
minority — are skipped and land in background).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
from PIL import Image, ImageDraw

from .complex_base import ComplexSegDataset
from ..utils.logging import logger

__all__ = ["Coco14Dataset"]


class Coco14Dataset(ComplexSegDataset):
    dataset_name = "coco64"
    label_num = 81  # 80 things + background 0

    def __init__(self, root: str, split: str = "train", debug: bool = False,
                 **kwargs):
        super().__init__(debug=debug, **kwargs)
        self.root = Path(root).expanduser()
        self.img_dir = self.root / f"{split}2014"
        inst = self.root / "annotations" / f"instances_{split}2014.json"
        if not inst.exists():
            raise FileNotFoundError(inst)
        data = json.loads(inst.read_text())

        # contiguous 1..80 ids from the categories list (bg = 0)
        cats = sorted(data["categories"], key=lambda c: c["id"])
        self.cat_to_idx = {c["id"]: i + 1 for i, c in enumerate(cats)}

        by_image: dict[int, list] = {}
        for ann in data["annotations"]:
            if ann.get("iscrowd"):
                continue  # RLE crowd regions → background (see module doc)
            by_image.setdefault(ann["image_id"], []).append(ann)

        self.images, self.anns = [], []
        for im in data["images"]:
            anns = by_image.get(im["id"])
            if not anns:
                continue
            self.images.append(self.img_dir / im["file_name"])
            self.anns.append(anns)
        if debug:
            self.images = self.images[:200]
            self.anns = self.anns[:200]
        logger.info(f"coco14 {split}: {len(self.images)} annotated images")
        self._init_cond("train" if split.startswith("train") else "val")

    def __len__(self) -> int:
        return len(self.images)

    def get_imagename_by_index(self, index: int) -> str:
        return self.images[index].name

    def _read_img_segmask(self, index: int):
        img = Image.open(self.images[index]).convert("RGB")
        w, h = img.size
        mask = Image.new("L", (w, h), 0)
        draw = ImageDraw.Draw(mask)
        # draw larger instances first so small objects stay visible on top
        anns = sorted(self.anns[index], key=lambda a: -a.get("area", 0))
        for ann in anns:
            seg = ann.get("segmentation")
            if not isinstance(seg, list):
                continue
            cid = self.cat_to_idx[ann["category_id"]]
            for poly in seg:
                if len(poly) >= 6:
                    draw.polygon(poly, fill=cid)
        return img, mask
