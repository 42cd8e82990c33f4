"""Checkpointing with orbax: best-FID + last, resume support.

TPU-native rewrite of the reference checkpoint policy (SURVEY.md §5.4):
Lightning `ModelCheckpoint` monitoring `val/fid_for_ckpt` with `save_last`
and an epoch+FID filename (`config/pl/default.yaml:27-36`), checkpoint
contents = model + EMA shadow + optimizer state (+ step), resume via
`trainer.fit(ckpt_path=...)` (`main.py:126-133`).

Here a checkpoint is the whole `TrainState` pytree (params, ema_params,
opt_state, step, ema_updates) plus a small JSON of monitor metadata.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp

from ..utils.logging import logger

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """best-metric + last checkpointing (lower metric = better, like FID)."""

    def __init__(self, ckpt_dir: str | Path, monitor: str = "val/fid_for_ckpt"):
        self.dir = Path(ckpt_dir).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self._ckpt = ocp.StandardCheckpointer()
        self._meta_path = self.dir / "meta.json"
        self.meta: dict[str, Any] = {"best_score": None, "best_path": None, "last_path": None}
        if self._meta_path.exists():
            self.meta = json.loads(self._meta_path.read_text())

    # ------------------------------------------------------------------
    def save_last(self, state, epoch: int) -> Path:
        """Async save of the rolling 'last' checkpoint.

        orbax's StandardCheckpointer is an AsyncCheckpointer: `save`
        returns once the arrays are staged to host and the file commit
        runs in a background thread — the next epoch trains under the
        write (donated device buffers are safe, staging happened).  The
        commit is atomic (tmp dir renamed at finalize), so a crash
        mid-write leaves no half 'last'.  Call `wait_until_finished()`
        (the trainer does at fit end) before relying on the file.
        """
        self._ckpt.wait_until_finished()  # previous async save, if any
        path = self.dir / "last"
        if path.exists():
            shutil.rmtree(path)
        self._ckpt.save(path, state)
        self.meta["last_path"] = str(path)
        self.meta["last_epoch"] = epoch
        self._flush()
        return path

    def save_best_if_improved(self, state, epoch: int, score: float) -> Path | None:
        """Keep the best (lowest) `monitor` checkpoint; filename embeds
        epoch+score like the reference's `epoch_{epoch:06}-fid_{...}`.
        Blocking (rare event): the old best is only deleted once the new
        one is durable."""
        best = self.meta.get("best_score")
        if best is not None and score >= best:
            return None
        self._ckpt.wait_until_finished()
        path = self.dir / f"epoch_{epoch:06d}-fid_{score:.3f}"
        self._ckpt.save(path, state)
        self._ckpt.wait_until_finished()
        old = self.meta.get("best_path")
        if old and Path(old).exists() and Path(old) != path:
            shutil.rmtree(old)
        self.meta.update(best_score=score, best_path=str(path), best_epoch=epoch)
        self._flush()
        logger.warning(f"best_model_path(score:{score}): {path}")
        return path

    # ------------------------------------------------------------------
    def restore(self, state_template, path: str | Path | None = None):
        """Restore a TrainState (shape/dtype/sharding template for orbax)."""
        self._ckpt.wait_until_finished()  # drain any in-flight async save
        path = Path(path) if path else Path(self.meta["last_path"])

        def abstract(x):
            sharding = getattr(x, "sharding", None)
            if sharding is None:
                sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

        template = jax.tree.map(abstract, state_template)
        return self._ckpt.restore(path.absolute(), template)

    def _flush(self) -> None:
        self._meta_path.write_text(json.dumps(self.meta, indent=2))

    def wait_until_finished(self) -> None:
        """Block until any in-flight async save has committed."""
        self._ckpt.wait_until_finished()

    @property
    def has_checkpoint(self) -> bool:
        self._ckpt.wait_until_finished()
        p = self.meta.get("last_path")
        return bool(p and Path(p).exists())
