"""Profiling utilities (SURVEY.md §5.1 parity → TPU equivalents).

The reference's observability is `profile=1` (skip eval so a profiler can
watch pure training), per-epoch wall time + peak CUDA memory, and
`iters_per_sec`.  The TPU equivalents here:

  * `trace(log_dir)` — context manager around `jax.profiler` producing a
    Perfetto/XPlane trace of a few training steps,
  * `block_timer` — wall-time a jitted fn with `block_until_ready`,
  * peak-HBM polling lives in `training.trainer._device_stats`.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Callable

import jax

from .logging import logger

__all__ = ["trace", "block_timer"]


@contextlib.contextmanager
def trace(log_dir: str | Path):
    """Capture a jax profiler trace (view with TensorBoard/Perfetto)."""
    log_dir = str(Path(log_dir).expanduser())
    jax.profiler.start_trace(log_dir)
    logger.warning(f"jax profiler trace → {log_dir}")
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_timer(fn: Callable, *args, iters: int = 10, warmup: int = 2,
                **kwargs) -> float:
    """Median-free simple wall-time per call (seconds) with proper syncing."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
