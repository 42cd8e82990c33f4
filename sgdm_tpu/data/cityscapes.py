"""Cityscapes 27-class segmentation dataset at diffusion scale.

TPU-native rewrite of the reference's `dataset/cs27.py` (Cityscapes27,
SURVEY.md §2.6): leftImg8bit images + gtFine label maps, the 34 raw ids
collapsed to the 27 STEGO-style classes (ignore/void ids → background),
complex getitem contract shared with VOC/COCO.
"""

from __future__ import annotations

from pathlib import Path

from PIL import Image

from .complex_base import ComplexSegDataset

__all__ = ["CityscapesDataset"]

# raw gtFine ids (0..33) → 27 training classes, STEGO protocol: the 27
# valid ids 7..33 map to 0..26 (bicycle=33 → 26 — an earlier `+1 ... < 27`
# shift silently dropped it), void-ish ids 0..6 collapse into class 0
# (road) since the 27-slot one-hot has no ignore channel.  The reference's
# own cs27 dataset never builds a GT segmask (cityscapes27.py:217 returns
# mask=None); this mapping is our oracle-layout extension.
_RAW_TO_27 = {i: 0 for i in range(34)}
_RAW_TO_27.update({i: i - 7 for i in range(7, 34)})


class CityscapesDataset(ComplexSegDataset):
    dataset_name = "cs64"
    label_num = 27
    fine_to_coarse = _RAW_TO_27

    def __init__(self, root: str, split: str = "train", debug: bool = False,
                 **kwargs):
        super().__init__(debug=debug, **kwargs)
        self.root = Path(root).expanduser()
        img_root = self.root / "leftImg8bit" / split
        ann_root = self.root / "gtFine" / split
        if not img_root.exists():
            raise FileNotFoundError(img_root)
        self.images = sorted(img_root.rglob("*_leftImg8bit.png"))
        self.masks = [
            ann_root / p.parent.name /
            p.name.replace("_leftImg8bit.png", "_gtFine_labelIds.png")
            for p in self.images
        ]
        if debug:
            self.images = self.images[:200]
            self.masks = self.masks[:200]
        self._init_cond("train" if split == "train" else "val")

    def __len__(self) -> int:
        return len(self.images)

    def get_imagename_by_index(self, index: int) -> str:
        return self.images[index].name

    def _read_img_segmask(self, index: int):
        return (Image.open(self.images[index]).convert("RGB"),
                Image.open(self.masks[index]))
