"""Joint image+mask transforms and mask encodings for the complex datasets.

TPU-native rewrite of `dataset/transforms/complex_ds_common_util.py`:

  * `RandomScaleCrop` (:16-100): short edge scaled to U[1.05, 1.25]·base,
    random crop of base_size, final resize to `resize_size` — bilinear
    scale + default-resample final resize for the image, NEAREST for every
    mask, applied jointly to (img, segmask, lost-bbox-mask, stego-mask),
  * `segmask_to_onehot` (:103-115): 255→0 background, optional fine→coarse
    relabeling (COCO 182→27), one-hot (NHWC here),
  * `mask_to_attr_nhot` (:130-148): n-hot of the classes present,
  * `bbox_to_mask` (:151-162): binary origin-size box mask.

Outputs are numpy NHWC (the reference is CHW torch).
"""

from __future__ import annotations

import random
from typing import Mapping

import numpy as np
from PIL import Image

__all__ = [
    "RandomScaleCrop",
    "segmask_to_onehot",
    "segmask_to_ids",
    "mask_to_attr_nhot",
    "bbox_to_mask",
]


class RandomScaleCrop:
    def __init__(self, base_size: int, resize_size: int, fill: int = 0,
                 rng: random.Random | None = None):
        self.base_size = base_size
        self.crop_size = base_size
        self.resize_size = resize_size
        self.fill = fill
        # the random MODULE is a GIL-protected C Mersenne instance — safe
        # under the loader's thread pool (unlike numpy Generators); draw
        # order across threads is scheduler-dependent, same as the
        # reference's torch-DataLoader-worker randomness
        self.rng = rng or random

    def __call__(self, img: Image.Image, mask: Image.Image | None,
                 bboxmask: Image.Image | None = None,
                 stegomask: Image.Image | None = None):
        short_size = self.rng.randint(
            int(self.base_size * 1.05), int(self.base_size * 1.25)
        )
        w, h = img.size
        if h > w:
            ow = short_size
            oh = int(1.0 * h * ow / w)
        else:
            oh = short_size
            ow = int(1.0 * w * oh / h)
        img = img.resize((ow, oh), Image.BILINEAR)
        resize_nearest = lambda m: (
            None if m is None else m.resize((ow, oh), Image.NEAREST)
        )
        mask, bboxmask, stegomask = map(resize_nearest, (mask, bboxmask, stegomask))

        assert short_size >= self.crop_size, "scale >= 1.05 guarantees this"
        w, h = img.size
        x1 = self.rng.randint(0, w - self.crop_size)
        y1 = self.rng.randint(0, h - self.crop_size)
        box = (x1, y1, x1 + self.crop_size, y1 + self.crop_size)
        crop = lambda m: None if m is None else m.crop(box)
        img, mask, bboxmask, stegomask = map(crop, (img, mask, bboxmask, stegomask))

        rs = (self.resize_size, self.resize_size)
        img_np = np.array(img.resize(rs))  # default resample (parity :72-74)
        to_np = lambda m: (
            None if m is None else np.array(m.resize(rs, resample=Image.NEAREST))
        )
        return img_np, to_np(mask), to_np(bboxmask), to_np(stegomask)


def _relabel(mask: np.ndarray, fine_to_coarse: Mapping[int, int] | None) -> np.ndarray:
    if fine_to_coarse is None:
        return mask
    out = mask.copy()
    for fine in np.unique(mask):
        out[mask == fine] = fine_to_coarse[int(fine)]
    return out


def segmask_to_onehot(
    segmask: np.ndarray, num_classes: int,
    fine_to_coarse: Mapping[int, int] | None = None,
) -> np.ndarray:
    """[H,W] ids → [H,W,C] float32 one-hot; 255 treated as background 0."""
    return np.eye(num_classes, dtype=np.float32)[
        segmask_to_ids(segmask, num_classes, fine_to_coarse)]


def segmask_to_ids(
    segmask: np.ndarray, num_classes: int,
    fine_to_coarse: Mapping[int, int] | None = None,
) -> np.ndarray:
    """[H,W] ids → normalized uint8 ID mask (255→bg 0, fine→coarse) — the
    `onehot_on_device` wire format; `jax.nn.one_hot(ids, K)` on device is
    bit-identical to `segmask_to_onehot` (same normalization path)."""
    ids = segmask.astype(np.int64).copy()
    ids[ids == 255] = 0
    ids = _relabel(ids, fine_to_coarse)
    assert num_classes <= 256, num_classes
    if ids.size and int(ids.max()) >= num_classes:
        # keep the host one-hot path's loud failure on corrupt masks
        # (np.eye(K)[ids] raises IndexError); the uint8 cast below would
        # silently wrap >255 and jax.nn.one_hot would silently zero
        # out-of-range rows
        raise IndexError(
            f"segmask id {int(ids.max())} >= num_classes {num_classes}"
        )
    return ids.astype(np.uint8)


def mask_to_attr_nhot(
    segmask: np.ndarray, num_classes: int,
    fine_to_coarse: Mapping[int, int] | None = None,
) -> np.ndarray:
    """n-hot [C] of classes present in the mask (255 → bg 0)."""
    segmask = segmask.astype(np.int64).copy()
    segmask[segmask == 255] = 0
    attrs = np.unique(_relabel(segmask, fine_to_coarse))
    nhot = np.zeros((num_classes,), dtype=np.float32)
    nhot[attrs] = 1.0
    return nhot


def bbox_to_mask(shape_hw: tuple[int, int], bbox: np.ndarray) -> np.ndarray:
    """Binary [H,W] mask from an (x0,y0,x1,y1) box. Parity: :151-162."""
    m = np.zeros(shape_hw, dtype=np.uint8)
    m[int(bbox[1]):int(bbox[3]), int(bbox[0]):int(bbox[2])] = 1
    return m
