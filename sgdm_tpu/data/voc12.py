"""PASCAL VOC 2012 (augmented) segmentation dataset at diffusion scale.

TPU-native rewrite of `dataset/voc12.py:28-184 VOCSegmentation`: JPEGImages
+ SegmentationClassAug mask pairs listed by the split file (train_aug /
train / val, :102-130), 21 classes (:29-51), RandomScaleCrop(base 224 →
image_size) joint transform, complex getitem contract.
"""

from __future__ import annotations

from pathlib import Path

from PIL import Image

from .complex_base import ComplexSegDataset

__all__ = ["VOCSegmentation", "VOC_CLASSES"]

VOC_CLASSES = [
    "background", "aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
    "car", "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]


class VOCSegmentation(ComplexSegDataset):
    dataset_name = "voc64"
    label_num = 21

    def __init__(self, root: str, split: str = "train_aug", debug: bool = False,
                 **kwargs):
        super().__init__(debug=debug, **kwargs)
        self.root = Path(root).expanduser()
        self.split = split
        list_file = self.root / "ImageSets" / "SegmentationAug" / f"{split}.txt"
        if not list_file.exists():
            list_file = self.root / "ImageSets" / "Segmentation" / f"{split}.txt"
        if not list_file.exists():
            raise FileNotFoundError(
                f"VOC split list not found under {self.root}/ImageSets "
                f"(looked for {split}.txt)"
            )
        lines = [l.strip() for l in list_file.read_text().splitlines() if l.strip()]
        self.images, self.masks = [], []
        for line in lines:
            if " " in line:  # aug lists carry explicit relative paths
                img_rel, mask_rel = line.split()
                self.images.append(self.root / img_rel.lstrip("/"))
                self.masks.append(self.root / mask_rel.lstrip("/"))
            else:
                self.images.append(self.root / "JPEGImages" / f"{line}.jpg")
                self.masks.append(
                    self.root / "SegmentationClassAug" / f"{line}.png"
                )
        if debug:
            self.images = self.images[:200]
            self.masks = self.masks[:200]
        self._init_cond("train" if split.startswith("train") else "val")

    def __len__(self) -> int:
        return len(self.images)

    def get_imagename_by_index(self, index: int) -> str:
        return self.images[index].name

    def _read_img_segmask(self, index: int):
        img = Image.open(self.images[index]).convert("RGB")
        mask = Image.open(self.masks[index])
        return img, mask
