"""FFHQ (flat image-folder) dataset.

TPU-native equivalent of the reference's FFHQ dataset (referenced by
`config/data/ffhq64.yaml` / `ffhq128.yaml`; the dataset file is absent from
the reference snapshot — SURVEY.md §2.6 — so this implements the documented
contract: a flat folder of images, no labels (`skip_id2name('ffhq')` is True
so h5 conditions are indexed positionally), resized to `image_size`, batch
dict {image [-1,1], img4unsup, id}.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image

from .h5cond import ConditionLookup

__all__ = ["FFHQ"]


class FFHQ:
    dataset_name = "ffhq64"

    def __init__(
        self,
        root: str,
        train: bool = True,
        image_size: int = 64,
        size4cluster: int = 224,
        h5_file: str | None = None,
        condition_method: str | None = None,
        condition: dict | None = None,
        val_fraction: float = 0.01,
        debug: bool = False,
        **_unused,
    ):
        root = Path(root).expanduser()
        files = sorted(
            p for p in root.rglob("*")
            if p.suffix.lower() in (".png", ".jpg", ".jpeg")
        )
        if not files:
            raise FileNotFoundError(f"no images under {root}")
        n_val = max(int(len(files) * val_fraction), 1)
        self.files = files[:-n_val] if train else files[-n_val:]
        if debug:
            self.files = self.files[:1200]
        self.image_size = image_size
        self.size4cluster = size4cluster
        self.split_name = "train" if train else "val"
        self.cond = ConditionLookup(
            condition_method, h5_file, self.split_name, self.dataset_name,
            condition_cfg=condition,
        )

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, i: int) -> dict:
        img = Image.open(self.files[i]).convert("RGB")
        small = np.array(img.resize((self.image_size, self.image_size),
                                    Image.BILINEAR))
        unsup = np.array(img.resize((self.size4cluster, self.size4cluster),
                                    Image.BILINEAR))
        out = {
            "image": small.astype(np.float32) / 127.5 - 1.0,
            "img4unsup": unsup.astype(np.uint8),
            "id": np.int64(i),
        }
        out.update(self.cond.get(i))
        return out
