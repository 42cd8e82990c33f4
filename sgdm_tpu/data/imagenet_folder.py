"""ImageNet folder loader (iDDPM-style) for from-224 downsampled training.

TPU-native rewrite of the reference's `dataset/imagenet.py` (iDDPM-style
folder loader, SURVEY.md §2.6 "Other datasets"): class-subdirectory layout,
center-crop-to-square then resize to `image_size`, labels from the sorted
class-dir index; h5 condition attach like every other dataset.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image

from .h5cond import ConditionLookup

__all__ = ["ImageNetFolder"]


class ImageNetFolder:
    dataset_name = "inp"

    def __init__(
        self,
        root: str,
        train: bool = True,
        image_size: int = 64,
        size4cluster: int = 224,
        h5_file: str | None = None,
        condition_method: str | None = None,
        condition: dict | None = None,
        num_classes: int = 1000,
        debug: bool = False,
        **_unused,
    ):
        split_dir = Path(root).expanduser() / ("train" if train else "val")
        if not split_dir.exists():
            raise FileNotFoundError(split_dir)
        class_dirs = sorted(p for p in split_dir.iterdir() if p.is_dir())
        self.files: list[Path] = []
        labels: list[int] = []
        for ci, cdir in enumerate(class_dirs):
            for f in sorted(cdir.glob("*.JPEG")) + sorted(cdir.glob("*.jpg")):
                self.files.append(f)
                labels.append(ci)
        self.label_list = np.asarray(labels, dtype=np.int64)
        if debug:
            self.files = self.files[:1200]
            self.label_list = self.label_list[:1200]
        self.image_size = image_size
        self.size4cluster = size4cluster
        self.split_name = "train" if train else "val"
        self.cond = ConditionLookup(
            condition_method, h5_file, self.split_name, self.dataset_name,
            label_list=self.label_list, num_classes=num_classes,
            condition_cfg=condition, id2name=self.id2name,
        )

    def id2name(self, index: int) -> str:
        return self.files[index].name

    def __len__(self) -> int:
        return len(self.files)

    def _center_square(self, img: Image.Image) -> Image.Image:
        w, h = img.size
        s = min(w, h)
        return img.crop(((w - s) // 2, (h - s) // 2,
                         (w + s) // 2, (h + s) // 2))

    def __getitem__(self, i: int) -> dict:
        img = self._center_square(Image.open(self.files[i]).convert("RGB"))
        small = np.array(img.resize((self.image_size, self.image_size),
                                    Image.BICUBIC))
        unsup = np.array(img.resize((self.size4cluster, self.size4cluster),
                                    Image.BILINEAR))
        out = {
            "image": small.astype(np.float32) / 127.5 - 1.0,
            "img4unsup": unsup.astype(np.uint8),
            "id": np.int64(i),
        }
        out.update(self.cond.get(i))
        return out
