"""Shared base for the segmentation ("complex") datasets (VOC / COCO-Stuff).

TPU-native rewrite of `dataset/transforms/complex_ds_common_util.py:212-284
get_item_complex` + `set_stego` (:165-209): per sample —

  * read (image, segmask) at original size,
  * `img4unsup` = image resized to `size4cluster` (for the offline feature
    extractor),
  * optional LOST bbox → origin-size binary mask (self-boxed runs),
  * optional STEGO mask PNG from `stego_dir` (self-segmented runs),
  * joint RandomScaleCrop of all four,
  * encode: `segmask` one-hot [H,W,C], `attr` n-hot, `stegomask` one-hot +
    `stego_attr` n-hot, `lostbboxmask` [H,W,1], `image` float32 [-1,1],
  * attach h5 conditions (cluster one-hots etc.) via ConditionLookup.

Layout: NHWC numpy (reference emits CHW torch).
"""

from __future__ import annotations

import random
from pathlib import Path
from typing import Any, Mapping

import numpy as np
from PIL import Image

from ..utils.logging import logger
from .h5cond import ConditionLookup, LostLookup
from .transforms import (
    segmask_to_ids,
    RandomScaleCrop,
    bbox_to_mask,
    mask_to_attr_nhot,
    segmask_to_onehot,
)

__all__ = ["ComplexSegDataset"]

_LAYOUT_METHODS = ("clusterlayout", "stegoclusterlayout", "layout")


class ComplexSegDataset:
    """Subclasses set: dataset_name, label_num, and implement
    `_read_img_segmask(i) -> (PIL image, PIL segmask|None)` and
    `get_imagename_by_index(i) -> str`."""

    dataset_name = "complex"
    label_num = 21
    fine_to_coarse: Mapping[int, int] | None = None

    def __init__(
        self,
        image_size: int = 64,
        size4cluster: int = 300,
        base_size: int = 224,
        h5_file: str | None = None,
        lost_file: str | None = None,
        stego_dir: str | None = None,
        stego_k: int = -1,
        condition_method: str | None = None,
        condition: Mapping[str, Any] | None = None,
        debug: bool = False,
        seed: int = 23,
        onehot_on_device: bool = False,
        **_unused: Any,
    ):
        self.image_size = image_size
        self.size4cluster = size4cluster
        self.condition_method = condition_method
        self.condition = condition or {}
        self.debug = debug
        # ship uint8 ID masks (segmask/stegomask [H,W], lostbboxmask
        # [H,W,1]) instead of f32 one-hots; the trainer expands to
        # [B,H,W,K] in one fused device op (`trainer._device_batch`).
        # Cuts the per-sample host build + tunnel transfer ~13× at
        # 64px/K=21 (BASELINE.md round 5).  Default off: the reference
        # batch contract ships one-hots (complex_ds_common_util.py:103-133)
        # and the papervis consumers accept both.
        self.onehot_on_device = onehot_on_device
        self.transform = RandomScaleCrop(
            base_size=base_size, resize_size=image_size,
            rng=random.Random(seed),
        )

        # stego routing (set_stego parity :165-209): active only when the
        # method's `how` is stego
        how = None
        if condition_method in _LAYOUT_METHODS:
            how = (self.condition.get(condition_method) or {}).get("how")
        self.is_stego = bool(
            how == "stego"
            or (condition_method == "stegoclusterlayout")
        )
        if self.is_stego:
            assert stego_dir, f"{condition_method} how=stego requires stego_dir"
            self.stego_mask_dir = Path(stego_dir).expanduser().resolve()
            self.stego_cluster_num = stego_k
            logger.warning(f"is_stego: {self.stego_mask_dir} k={stego_k}")
        else:
            self.stego_mask_dir = None
            self.stego_cluster_num = -1

        # LOST boxes for how=lost runs
        self.lost = None
        if lost_file and (
            condition_method in ("clusterlayout", "layout")
            and how == "lost"
        ):
            self.lost = LostLookup(lost_file)

        self.cond: ConditionLookup | None = None
        self._h5_file = h5_file

    def _init_cond(self, split_name: str) -> None:
        self.split_name = split_name
        self.cond = ConditionLookup(
            self.condition_method,
            self._h5_file,
            split_name,
            self.dataset_name,
            condition_cfg=self.condition,
            id2name=self.get_imagename_by_index,
        )

    # ------------------------------------------------------------------
    def _read_img_segmask(self, index: int):
        raise NotImplementedError

    def get_imagename_by_index(self, index: int) -> str:
        raise NotImplementedError

    def __getitem__(self, index: int) -> dict:
        result: dict[str, Any] = {}
        image, segmask = self._read_img_segmask(index)

        img4unsup = np.array(
            image.resize((self.size4cluster, self.size4cluster), Image.BILINEAR)
        ).astype(np.uint8)

        stegomask = None
        if self.is_stego:
            stem = Path(self.get_imagename_by_index(index)).stem
            stegomask = Image.open(self.stego_mask_dir / f"{stem}.png")

        lostbboxmask = None
        if self.lost is not None:
            bbox = self.lost.get_bbox(self.get_imagename_by_index(index))
            w0, h0 = image.size
            lostbboxmask = Image.fromarray(bbox_to_mask((h0, w0), bbox))

        img, segmask_t, lostmask_t, stegomask_t = self.transform(
            image, segmask, bboxmask=lostbboxmask, stegomask=stegomask
        )

        if lostmask_t is not None:
            result["lostbboxmask"] = lostmask_t[..., None].astype(
                np.uint8 if self.onehot_on_device else np.float32)
        if stegomask_t is not None:
            result["stego_attr"] = mask_to_attr_nhot(
                stegomask_t, self.stego_cluster_num
            )
            result["stegomask"] = (
                segmask_to_ids(stegomask_t, self.stego_cluster_num)
                if self.onehot_on_device
                else segmask_to_onehot(stegomask_t, self.stego_cluster_num)
            )

        result["image"] = (img.astype(np.float32) / 255.0) * 2.0 - 1.0
        if segmask_t is not None:
            result["segmask"] = (
                segmask_to_ids(segmask_t, self.label_num, self.fine_to_coarse)
                if self.onehot_on_device
                else segmask_to_onehot(
                    segmask_t, self.label_num, self.fine_to_coarse)
            )
            result["attr"] = mask_to_attr_nhot(
                segmask_t, self.label_num, self.fine_to_coarse
            )
        result["img4unsup"] = img4unsup
        result["id"] = np.int64(index)

        if self.cond is not None:
            result.update(self.cond.get(index))
        return result
