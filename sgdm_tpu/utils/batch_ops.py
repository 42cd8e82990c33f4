"""Batch-manipulation helpers for visualization/experiments.

TPU-native rewrite of `diffusion_utils/util.py` helpers:

  * `slerp` / `slerp_batch` (:33-61): spherical interpolation used by the
    condition-interpolation visualization,
  * `batch_to_same_firstimage` (:103-111): every row copies row 0,
  * `batch_to_samecondition` (:113-121): rows grouped so each condition
    repeats `samecondition_num` times,
  * `batch_interp_condition`: pairwise condition interpolation chains
    (slerp or linear) for the ImageLogger interp panel
    (callbacks/my_callbacks.py + util.py:165+).

All operate on dicts of numpy arrays.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

__all__ = [
    "slerp",
    "slerp_batch",
    "batch_to_same_firstimage",
    "batch_to_samecondition",
    "batch_to_samecondition_v2",
    "batch_interp_condition",
]


def slerp(val: float, low: np.ndarray, high: np.ndarray) -> np.ndarray:
    """Spherical interpolation of two vectors. Parity: util.py:33-45."""
    low_n = low / np.linalg.norm(low)
    high_n = high / np.linalg.norm(high)
    omega = np.arccos(np.clip(np.dot(low_n, high_n), -1, 1))
    so = np.sin(omega)
    if so == 0:
        return (1.0 - val) * low + val * high
    return np.sin((1.0 - val) * omega) / so * low + np.sin(val * omega) / so * high


def slerp_batch(val: float, low: np.ndarray, high: np.ndarray) -> np.ndarray:
    """[B,C] pairwise slerp. Parity: util.py:48-61."""
    assert low.ndim == 2
    low_n = low / np.linalg.norm(low, axis=1, keepdims=True)
    high_n = high / np.linalg.norm(high, axis=1, keepdims=True)
    omega = np.arccos(np.clip((low_n * high_n).sum(1), -1, 1))
    so = np.sin(omega)
    so = np.where(so == 0, 1e-12, so)
    return (
        (np.sin((1.0 - val) * omega) / so)[:, None] * low
        + (np.sin(val * omega) / so)[:, None] * high
    )


def batch_to_same_firstimage(batch: Mapping[str, np.ndarray]) -> dict:
    """Every sample becomes a copy of sample 0. Parity: util.py:103-111."""
    return {
        k: np.broadcast_to(v[:1], v.shape).copy() for k, v in batch.items()
    }


def batch_to_samecondition(
    batch: Mapping[str, np.ndarray], samecondition_num: int = 7
) -> dict:
    """Row i takes row i // samecondition_num. Parity: util.py:113-121."""
    out = {}
    for k, v in batch.items():
        idx = np.arange(len(v)) // samecondition_num
        idx = np.clip(idx, 0, len(v) - 1)
        out[k] = v[idx].copy()
    return out


def batch_to_samecondition_v2(
    batch: Mapping[str, np.ndarray], different_key: str,
    samecondition_num: int = 7,
) -> dict:
    """Like batch_to_samecondition, but ``different_key`` keeps its original
    rows — e.g. same cluster / different LOST box.  Parity: util.py:122-136
    (drives the same_cluster_diff_lost / diff_cluster_same_lost /
    same_stego_diff_cluster / diff_z_same_stego figure modes)."""
    out = {}
    for k, v in batch.items():
        if k == different_key:
            out[k] = np.asarray(v).copy()
        else:
            idx = np.clip(np.arange(len(v)) // samecondition_num, 0, len(v) - 1)
            out[k] = np.asarray(v)[idx].copy()
    return out


def batch_interp_condition(
    cond: np.ndarray, interp_num: int, how: str = "slerp"
) -> np.ndarray:
    """Chains of interpolated conditions between consecutive pairs.

    Returns [n_pairs * interp_num, C]: for each consecutive pair (i, i+1),
    interp_num points from cond_i to cond_{i+1}.
    """
    assert cond.ndim == 2
    chunks = []
    for i in range(len(cond) - 1):
        lo, hi = cond[i], cond[i + 1]
        for t in np.linspace(0.0, 1.0, interp_num):
            if how == "slerp":
                chunks.append(slerp(float(t), lo, hi))
            else:
                chunks.append((1 - t) * lo + t * hi)
    return np.stack(chunks)
