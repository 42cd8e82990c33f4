"""Native (C++) components, loaded via ctypes.

Build happens lazily on first use (g++ is in the image); the shared object
lands next to the sources.  `make -C sgdm_tpu/native` builds ahead of time.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["dense_crf", "permutohedral_filter", "load_densecrf"]

_HERE = Path(__file__).parent
_LIB: ctypes.CDLL | None = None


def _build() -> Path:
    so = _HERE / "libdensecrf.so"
    src = _HERE / "densecrf.cpp"
    if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", str(so), str(src)]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return so


def load_densecrf() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        so = _build()
        lib = ctypes.CDLL(str(so))
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.dense_crf_inference.argtypes = [
            f32p, u8p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            f32p,
        ]
        lib.dense_crf_inference.restype = None
        lib.permutohedral_filter.argtypes = [
            f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p,
        ]
        lib.permutohedral_filter.restype = None
        _LIB = lib
    return _LIB


def dense_crf(
    unary_logits: np.ndarray,   # [C, H, W] (e.g. cluster-probe log-probs)
    rgb: np.ndarray,            # [H, W, 3] uint8
    iters: int = 10,
    pos_w: float = 3.0,
    pos_xy_std: float = 1.0,
    bi_w: float = 4.0,
    bi_xy_std: float = 67.0,
    bi_rgb_std: float = 3.0,
) -> np.ndarray:
    """Refined probabilities [C, H, W].

    Defaults match the reference STEGO CRF (side_repo/STEGO/src/crf.py:13-18:
    MAX_ITER=10, POS_W=3, POS_XY_STD=1, Bi_W=4, Bi_XY_STD=67, Bi_RGB_STD=3).
    """
    lib = load_densecrf()
    C, H, W = unary_logits.shape
    assert rgb.shape == (H, W, 3) and rgb.dtype == np.uint8
    unary = np.ascontiguousarray(unary_logits, dtype=np.float32)
    out = np.empty_like(unary)
    lib.dense_crf_inference(
        unary.reshape(C, -1), np.ascontiguousarray(rgb),
        H, W, C, iters,
        pos_w, pos_xy_std, bi_w, bi_xy_std, bi_rgb_std,
        out.reshape(C, -1),
    )
    return out


def permutohedral_filter(
    features: np.ndarray, values: np.ndarray
) -> np.ndarray:
    """Gaussian filter values by feature-space distance ([N,fd], [N,vd])."""
    lib = load_densecrf()
    n, fd = features.shape
    vd = values.shape[1]
    out = np.empty((n, vd), dtype=np.float32)
    lib.permutohedral_filter(
        np.ascontiguousarray(features, dtype=np.float32),
        np.ascontiguousarray(values, dtype=np.float32),
        n, fd, vd, out,
    )
    return out
