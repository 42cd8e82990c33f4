"""Synthetic datasets for tests, smoke runs and benchmarking.

The reference's poor-man's fixtures are `debug=1` dataset truncation and a
dummy-dataset FID harness (`eval/eval_fid.py:611-641`, SURVEY.md §4).  This
module gives the TPU build a real fixture: a deterministic procedurally-
generated labeled image dataset with the same batch-dict contract as the
real datasets (`image` NHWC float32 in [-1,1], `label` one-hot, `id`,
`img4unsup` uint8), so the full train→sample→FID path runs with zero
downloads.
"""

from __future__ import annotations

import numpy as np

__all__ = ["SyntheticImages", "SyntheticSegImages"]


class SyntheticImages:
    """Gaussian-blob class-conditional images.

    Each class k draws blobs at a class-specific grid position, so a trained
    conditional model is actually class-distinguishable (useful for guidance
    sanity checks, not just plumbing).
    """

    def __init__(
        self,
        size: int = 32,
        channels: int = 3,
        num_classes: int = 10,
        length: int = 1024,
        seed: int = 0,
        cond_key: str = "label",
    ):
        self.size = size
        self.channels = channels
        self.num_classes = num_classes
        self.length = length
        self.seed = seed
        self.cond_key = cond_key

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, i: int) -> dict:
        rng = np.random.default_rng(self.seed * 1_000_003 + i)
        label = i % self.num_classes
        s = self.size
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
        cy = 0.2 + 0.6 * ((label % 4) / 3.0)
        cx = 0.2 + 0.6 * ((label // 4) / 3.0)
        sigma = 0.15 + 0.02 * rng.standard_normal()
        blob = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma ** 2)))
        img = np.stack([blob * (0.5 + 0.5 * ((label + c) % 3) / 2.0)
                        for c in range(self.channels)], axis=-1)
        img += 0.05 * rng.standard_normal(img.shape).astype(np.float32)
        img01 = np.clip(img, 0.0, 1.0).astype(np.float32)
        onehot = np.zeros((self.num_classes,), dtype=np.float32)
        onehot[label] = 1.0
        return {
            "image": img01 * 2.0 - 1.0,  # [-1,1] NHWC
            self.cond_key: onehot,
            "id": np.int64(i),
            "img4unsup": (img01 * 255).astype(np.uint8),
        }


class SyntheticSegImages(SyntheticImages):
    """Blobs + aligned segmentation layouts: the layout-method fixture.

    Extends the batch contract with every layout-conditioning key the
    complex datasets emit (`data/complex_base.py:142-160`): `segmask` /
    `stegomask` one-hots [H,W,K], `attr` / `stego_attr` n-hots, `cluster`
    one-hot, and `lostbboxmask` [H,W,1] — all derived from the same blob
    geometry (mask id = label+1 where the blob exceeds a threshold, box =
    the mask's bounding box), so layout-guided smoke training
    (clusterlayout / stegoclusterlayout / layout) runs with zero
    downloads.  `id2name` via the mask id also lands in `raw_mask` for
    tests that need the pre-one-hot ids.
    """

    def __init__(self, *, stego_k: int | None = None,
                 cluster_k: int | None = None,
                 onehot_on_device: bool = False, **kw):
        super().__init__(**kw)
        self.stego_k = stego_k or self.num_classes + 1
        self.cluster_k = cluster_k or self.num_classes
        # ship uint8 ID masks instead of f32 one-hots (the trainer expands
        # on device): 780→60 KB per 64px sample — the host/transfer fix
        # for the layout pipeline (BASELINE.md round 5)
        self.onehot_on_device = onehot_on_device

    def __getitem__(self, i: int) -> dict:
        out = super().__getitem__(i)
        label = i % self.num_classes
        s = self.size
        blob = (np.asarray(out["image"][..., 0]) + 1) / 2
        mask = np.zeros((s, s), np.int64)
        mask_id = 1 + label % (self.stego_k - 1)
        # relative threshold: channel-0 blob amplitude varies by class
        # (0.5/0.75/1.0 per label%3), so an absolute cut would leave the
        # dimmest classes with noise-pixel masks instead of blob regions
        mask[blob > 0.6 * blob.max()] = mask_id
        ys, xs = np.nonzero(mask)
        if len(ys):
            bbox = np.asarray([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
        else:  # degenerate sample: full-image box
            bbox = np.asarray([0, 0, s, s])
        nhot = np.zeros((self.stego_k,), np.float32)
        nhot[np.unique(mask)] = 1.0
        cl = np.zeros((self.cluster_k,), np.float32)
        cl[label % self.cluster_k] = 1.0
        if self.onehot_on_device:
            ids = mask.astype(np.uint8)
            lost = np.zeros((s, s, 1), np.uint8)
            lost[bbox[1]:bbox[3], bbox[0]:bbox[2], 0] = 1
            out.update(segmask=ids, stegomask=ids)
        else:
            eye = np.eye(self.stego_k, dtype=np.float32)
            onehot = eye[mask]
            lost = np.zeros((s, s, 1), np.float32)
            lost[bbox[1]:bbox[3], bbox[0]:bbox[2], 0] = 1.0
            out.update(segmask=onehot, stegomask=onehot)
        out.update(
            raw_mask=mask, attr=nhot, stego_attr=nhot, cluster=cl,
            lostbboxmask=lost,
        )
        return out
