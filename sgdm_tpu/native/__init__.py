"""Native (C++) components, loaded via ctypes.

Build happens lazily on first use (g++ is in the image); the shared object
lands next to the sources.  `make -C sgdm_tpu/native` builds ahead of time.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["dense_crf", "permutohedral_filter", "load_densecrf",
           "load_batchgather", "gather_image_batch", "gather_rows"]

_HERE = Path(__file__).parent
_LIB: ctypes.CDLL | None = None
_GATHER: ctypes.CDLL | None = None


def _build(stem: str = "densecrf", extra: tuple[str, ...] = ()) -> Path:
    so = _HERE / f"lib{stem}.so"
    src = _HERE / f"{stem}.cpp"
    if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           *extra, "-o", str(so), str(src)]
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


def load_batchgather() -> ctypes.CDLL:
    """The native batch-assembly engine (batchgather.cpp) — the torch-
    DataLoader-worker-pool equivalent of the data plane (reference:
    dataset/imagenet_pickle.py via torch's C++ workers)."""
    global _GATHER
    if _GATHER is None:
        so = _build("batchgather", extra=("-fopenmp",))
        lib = ctypes.CDLL(str(so))
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        c64 = ctypes.c_int64
        for name in ("gather_chw_to_nhwc", "gather_hwc_to_nhwc"):
            fn = getattr(lib, name)
            fn.argtypes = [u8p, i64p, c64, c64, f32p, ctypes.c_void_p]
            fn.restype = None
        lib.gather_rows_f32.argtypes = [f32p, i64p, c64, c64, f32p]
        lib.gather_rows_f32.restype = None
        lib.gather_vals_i64.argtypes = [i64p, i64p, c64, i64p]
        lib.gather_vals_i64.restype = None
        _GATHER = lib
    return _GATHER


def _check_idx(idx: np.ndarray, n: int) -> None:
    """Bounds check BEFORE the GIL-released C gather: an out-of-range index
    would be a silent OOB heap read (corrupt batch) or a SIGSEGV with no
    Python traceback, where numpy fancy indexing raises IndexError."""
    if len(idx) and (idx.min() < 0 or idx.max() >= n):
        raise IndexError(
            f"gather indices out of range [0, {n}): "
            f"min={idx.min()} max={idx.max()}")


def gather_image_batch(
    data: np.ndarray,            # [N, 3*S*S] uint8 (CHW rows) or [N,S,S,3]
    indices: np.ndarray,         # [B] int
    size: int,
    layout: str = "chw",
    want_uint8: bool = True,
) -> tuple[np.ndarray, np.ndarray | None]:
    """One native call: gather rows, CHW→HWC, normalize to f32 [-1,1]
    (bitwise-identical to `img.astype(f32)/255*2-1`), optional raw uint8
    copy.  Returns (images [B,S,S,3] f32, img_u8 [B,S,S,3] | None)."""
    lib = load_batchgather()
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    _check_idx(idx, len(data))
    b = len(idx)
    flat = data.reshape(len(data), -1)
    assert flat.shape[1] == 3 * size * size, (flat.shape, size)
    if not flat.flags["C_CONTIGUOUS"]:
        flat = np.ascontiguousarray(flat)
    out = np.empty((b, size, size, 3), dtype=np.float32)
    u8 = np.empty((b, size, size, 3), dtype=np.uint8) if want_uint8 else None
    fn = (lib.gather_chw_to_nhwc if layout == "chw"
          else lib.gather_hwc_to_nhwc)
    fn(flat, idx, b, size, out,
       u8.ctypes.data_as(ctypes.c_void_p) if u8 is not None else None)
    return out, u8


def gather_rows(rows: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Native f32 row gather ([N,D] → [B,D])."""
    lib = load_batchgather()
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    _check_idx(idx, len(rows))
    rows = np.ascontiguousarray(rows, dtype=np.float32)
    out = np.empty((len(idx), rows.shape[1]), dtype=np.float32)
    lib.gather_rows_f32(rows, idx, len(idx), rows.shape[1], out)
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
