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
        # (path, epoch) of an async 'last' save not yet confirmed durable
        self._pending_last: tuple[Path, int] | None = None

    # ------------------------------------------------------------------
    def save_last(self, state, epoch: int) -> Path:
        """Async save of the rolling 'last' checkpoint.

        orbax's StandardCheckpointer is an AsyncCheckpointer: `save`
        returns once the arrays are staged to host and the file commit
        runs in a background thread — the next epoch trains under the
        write (donated device buffers are safe, staging happened).

        Durability invariant: `meta.last_path` ALWAYS names a committed
        checkpoint.  Each save goes to an alternating `last-0`/`last-1`
        dir; meta is repointed and the older dir deleted only once the
        async commit is confirmed (at the next save / restore / drain) —
        so a crash at ANY moment leaves one durable 'last' on disk (orbax
        itself commits atomically via tmp-dir rename).
        """
        self._drain()  # previous save durable → finalize its meta/cleanup
        current = self.meta.get("last_path")
        slot = "last-1" if current and current.endswith("last-0") else "last-0"
        path = self.dir / slot
        if path.exists():  # stale uncommitted leftover from a crash
            shutil.rmtree(path)
        for tmp in self.dir.glob(f"{slot}.orbax-checkpoint-tmp*"):
            shutil.rmtree(tmp)  # mid-commit crash leftovers
        self._ckpt.save(path, state)
        self._pending_last = (path, epoch)
        return path

    def _finalize_pending_last(self) -> None:
        """Point meta at the (now durable) pending 'last'; delete the older
        one.  Callers must have waited on the checkpointer first."""
        if self._pending_last is None:
            return
        path, epoch = self._pending_last
        self._pending_last = None
        old = self.meta.get("last_path")
        self.meta["last_path"] = str(path)
        self.meta["last_epoch"] = epoch
        self._flush()
        # keep the stable user-facing `.../ckpts/last` name as a symlink to
        # the durable slot (atomic tmp+rename swap)
        link = self.dir / "last"
        if link.exists() and not link.is_symlink():
            shutil.rmtree(link)  # legacy real-dir layout
        tmp = self.dir / ".last.tmp"
        if tmp.is_symlink() or tmp.exists():
            tmp.unlink()
        tmp.symlink_to(path.name)
        tmp.replace(link)
        # clean the previous slot — but never the stable symlink itself: a
        # legacy meta (pre-rotation layout) records last_path == '.../last',
        # which at this point IS the fresh symlink (rmtree refuses symlinks
        # and the target is the checkpoint we just committed)
        if (old and old != str(path) and Path(old) != link
                and Path(old).exists() and not Path(old).is_symlink()):
            shutil.rmtree(old)

    def _drain(self) -> None:
        self._ckpt.wait_until_finished()
        self._finalize_pending_last()

    def save_best_if_improved(self, state, epoch: int, score: float) -> Path | None:
        """Keep the best (lowest) `monitor` checkpoint; filename embeds
        epoch+score like the reference's `epoch_{epoch:06}-fid_{...}`.
        Blocking (rare event): the old best is only deleted once the new
        one is durable."""
        best = self.meta.get("best_score")
        if best is not None and score >= best:
            return None
        self._drain()
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
    @staticmethod
    def resolve(path: str | Path) -> Path:
        """Resolve a user-facing checkpoint path.  `.../ckpts/last` keeps
        working as 'the latest checkpoint of that run' even though saves
        rotate between last-0/last-1: the sibling meta.json names the
        durable one."""
        p = Path(path)
        if not p.exists():
            side = p.parent / "meta.json"
            if side.exists():
                lp = json.loads(side.read_text()).get("last_path")
                if lp and Path(lp).exists():
                    return Path(lp)
        return p

    @staticmethod
    def epoch_of(path: str | Path) -> int | None:
        """The epoch a checkpoint path was saved at, if derivable: parsed
        from the best-checkpoint filename (`epoch_{N:06d}-fid_*`) or the
        sibling meta.json for last-checkpoints; None otherwise."""
        import re

        p = Path(path)
        m = re.match(r"epoch_(\d+)-fid_", p.name)
        if m:
            return int(m.group(1))
        side = p.parent / "meta.json"
        if p.name in ("last", "last-0", "last-1") and side.exists():
            le = json.loads(side.read_text()).get("last_epoch")
            return int(le) if le is not None else None
        return None

    def restore(self, state_template, path: str | Path | None = None):
        """Restore a TrainState (shape/dtype/sharding template for orbax)."""
        self._drain()  # in-flight async save → durable + meta repointed
        path = self.resolve(path) if path else Path(self.meta["last_path"])

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
        """Block until any in-flight async save has committed (and the
        'last' meta points at it)."""
        self._drain()

    @property
    def has_checkpoint(self) -> bool:
        self._drain()
        p = self.meta.get("last_path")
        return bool(p and Path(p).exists())
