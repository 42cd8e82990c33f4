"""Console logging + experiment tracking.

The reference logs through loguru (console) and wandb (experiment tracking)
— `main.py:86-96`, SURVEY.md §5.5.  Neither is in the TPU image, so:

  * `logger` — a loguru-flavored stdlib logger (colored level + timestamp),
  * `Tracker` — a wandb-API-compatible local tracker: scalars append to
    `metrics.jsonl`, images save under `media/`, the resolved config dumps to
    `config.yaml`.  If a real `wandb` module is importable it is used
    transparently (same call sites).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from pathlib import Path
from typing import Any, Mapping

import numpy as np

__all__ = ["logger", "Tracker", "get_tracker"]

_FMT = "\x1b[32m%(asctime)s\x1b[0m | \x1b[1m%(levelname)-8s\x1b[0m | %(message)s"


def _build_logger() -> logging.Logger:
    lg = logging.getLogger("sgdm_tpu")
    if not lg.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(_FMT, datefmt="%H:%M:%S"))
        lg.addHandler(h)
        lg.setLevel(os.environ.get("SGDM_LOG_LEVEL", "INFO"))
        lg.propagate = False
    return lg


logger = _build_logger()


class Tracker:
    """Local wandb-compatible experiment tracker."""

    def __init__(self, log_dir: str | Path, name: str = "run", config: Mapping | None = None):
        self.dir = Path(log_dir)
        self.name = name
        self.dir.mkdir(parents=True, exist_ok=True)
        (self.dir / "media").mkdir(exist_ok=True)
        self._metrics_file = open(self.dir / "metrics.jsonl", "a")
        self._step = 0
        if config is not None:
            import yaml

            with open(self.dir / "config.yaml", "w") as f:
                yaml.safe_dump(_to_plain(config), f)

    def log(self, metrics: Mapping[str, Any], step: int | None = None) -> None:
        step = self._step if step is None else step
        self._step = step + 1
        record: dict[str, Any] = {"_step": step, "_time": time.time()}
        for k, v in metrics.items():
            record[k] = self._encode(k, v, step)
        self._metrics_file.write(json.dumps(record) + "\n")
        self._metrics_file.flush()

    def _encode(self, key: str, value: Any, step: int) -> Any:
        v = value
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 2:
            path = self._save_image(key, np.asarray(v), step)
            return {"_type": "image", "path": str(path)}
        if hasattr(v, "item"):
            try:
                return v.item()
            except Exception:
                return float(np.asarray(v).mean())
        return v

    def _save_image(self, key: str, arr: np.ndarray, step: int) -> Path:
        from PIL import Image

        if arr.dtype != np.uint8:
            arr = np.clip((arr + 1) * 127.5, 0, 255).astype(np.uint8)
        if arr.ndim == 4:  # batch → grid
            arr = make_grid(arr)
        if arr.shape[-1] == 1:
            arr = arr[..., 0]
        safe = key.replace("/", "_")
        path = self.dir / "media" / f"{safe}_{step}.png"
        Image.fromarray(arr).save(path)
        return path

    def finish(self) -> None:
        self._metrics_file.close()


def make_grid(batch: np.ndarray, ncol: int | None = None, pad: int = 2) -> np.ndarray:
    """[B,H,W,C] uint8 → one grid image (wandb-grid / torchvision-style)."""
    b, h, w, c = batch.shape
    ncol = ncol or int(np.ceil(np.sqrt(b)))
    nrow = int(np.ceil(b / ncol))
    grid = np.zeros((nrow * (h + pad) - pad, ncol * (w + pad) - pad, c), dtype=batch.dtype)
    for i in range(b):
        r, cidx = divmod(i, ncol)
        grid[r * (h + pad):r * (h + pad) + h, cidx * (w + pad):cidx * (w + pad) + w] = batch[i]
    return grid


def _to_plain(node: Any) -> Any:
    if isinstance(node, Mapping):
        return {k: _to_plain(v) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return [_to_plain(v) for v in node]
    if isinstance(node, (str, int, float, bool)) or node is None:
        return node
    return str(node)


def get_tracker(log_dir: str | Path, name: str = "run", config: Mapping | None = None,
                use_wandb: bool = True) -> Tracker:
    """Return a wandb run if wandb is importable and requested, else a local
    Tracker with the same `.log()` surface."""
    if use_wandb:
        try:
            import wandb  # noqa: F401

            run = wandb.init(project="sgdm-tpu", name=name, dir=str(log_dir),
                             config=_to_plain(config) if config else None)
            return run  # type: ignore[return-value]
        except Exception:
            pass
    return Tracker(log_dir, name=name, config=config)
