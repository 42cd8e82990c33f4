"""COCO-Stuff 27-class segmentation dataset at diffusion scale.

TPU-native rewrite of `dataset/coco17stuff27.py:25-163 CocoStuffDataset`:
STEGO-style cocostuff layout (`images/{split}2017` + `annotations/
{split}2017` PNG label maps), 182 fine → 27 coarse classes via the
`fine_to_coarse_dict.pickle` shipped with the dataset prep (:76-80),
RandomScaleCrop(base 224 → image_size), complex getitem contract.
"""

from __future__ import annotations

import pickle
from pathlib import Path

from PIL import Image

from .complex_base import ComplexSegDataset

__all__ = ["CocoStuffDataset"]


class CocoStuffDataset(ComplexSegDataset):
    dataset_name = "cocostuff64"
    label_num = 27

    def __init__(self, root: str, split: str = "train", debug: bool = False,
                 **kwargs):
        super().__init__(debug=debug, **kwargs)
        self.root = Path(root).expanduser()
        img_dir = self.root / "images" / f"{split}2017"
        ann_dir = self.root / "annotations" / f"{split}2017"
        if not img_dir.exists():
            raise FileNotFoundError(f"COCO-Stuff images not found at {img_dir}")
        self.images = sorted(img_dir.glob("*.jpg"))
        self.masks = [ann_dir / f"{p.stem}.png" for p in self.images]
        if debug:
            self.images = self.images[:200]
            self.masks = self.masks[:200]

        f2c_path = self.root / "fine_to_coarse_dict.pickle"
        if f2c_path.exists():
            with open(f2c_path, "rb") as f:
                d = pickle.load(f)
            # STEGO's dict maps fine id -> coarse id (possibly nested)
            self.fine_to_coarse = d.get("fine_index_to_coarse_index", d)
        else:
            raise FileNotFoundError(
                f"{f2c_path} missing — the 182→27 mapping pickle ships with "
                f"the STEGO cocostuff preparation (reference "
                f"coco17stuff27.py:76-80)"
            )
        self._init_cond("train" if split.startswith("train") else "val")

    def __len__(self) -> int:
        return len(self.images)

    def get_imagename_by_index(self, index: int) -> str:
        return self.images[index].name

    def _read_img_segmask(self, index: int):
        img = Image.open(self.images[index]).convert("RGB")
        mask = Image.open(self.masks[index])
        return img, mask
