"""Tests: orbax CheckpointManager best/last/resume policy + local Tracker."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgdm_tpu.training.checkpoints import CheckpointManager
from sgdm_tpu.training.state import TrainState
from sgdm_tpu.utils.logging import Tracker, make_grid


def tiny_state(v: float) -> TrainState:
    params = {"w": jnp.full((4,), v)}
    return TrainState(
        step=jnp.asarray(int(v), dtype=jnp.int32),
        params=params,
        ema_params={"w": jnp.full((4,), v + 0.5)},
        opt_state=(),
        ema_updates=jnp.asarray(0, dtype=jnp.int32),
    )


class TestCheckpointManager:
    def test_save_last_and_restore(self, tmp_path):
        cm = CheckpointManager(tmp_path / "ck")
        s = tiny_state(3.0)
        cm.save_last(s, epoch=2)
        assert cm.has_checkpoint
        restored = cm.restore(tiny_state(0.0))
        np.testing.assert_allclose(np.asarray(restored.params["w"]), 3.0)
        np.testing.assert_allclose(np.asarray(restored.ema_params["w"]), 3.5)
        assert int(restored.step) == 3

    def test_best_policy_keeps_lowest(self, tmp_path):
        cm = CheckpointManager(tmp_path / "ck")
        assert cm.save_best_if_improved(tiny_state(1.0), 0, score=50.0)
        assert cm.save_best_if_improved(tiny_state(2.0), 1, score=30.0)
        # worse score → not saved
        assert cm.save_best_if_improved(tiny_state(3.0), 2, score=40.0) is None
        assert cm.meta["best_score"] == 30.0
        best = cm.restore(tiny_state(0.0), cm.meta["best_path"])
        np.testing.assert_allclose(np.asarray(best.params["w"]), 2.0)
        # filename embeds epoch + score (reference ModelCheckpoint pattern)
        assert "epoch_000001" in cm.meta["best_path"]
        assert "fid_30" in cm.meta["best_path"]

    def test_crash_during_async_save_keeps_previous_last(self, tmp_path):
        """A crash while an async 'last' save is in flight must leave
        meta pointing at the PREVIOUS durable checkpoint — the old slot is
        only deleted after the new commit is confirmed."""
        cm = CheckpointManager(tmp_path / "ck")
        cm.save_last(tiny_state(1.0), epoch=1)
        cm.wait_until_finished()
        first_path = cm.meta["last_path"]
        # second save starts async; "crash" = the meta finalize never runs
        # (wait for the raw commit first so no orbax thread outlives the
        # simulated crash — a real crash kills it)
        cm.save_last(tiny_state(2.0), epoch=2)
        cm._ckpt.wait_until_finished()
        del cm
        cm2 = CheckpointManager(tmp_path / "ck")  # fresh process
        # a mid-commit crash can also leave an orbax tmp dir on the slot
        # the next save will reuse — it must be swept, not crash the save
        stale = tmp_path / "ck" / "last-1.orbax-checkpoint-tmp"
        stale.mkdir(exist_ok=True)
        (stale / "junk").write_text("x")
        assert cm2.meta["last_path"] == first_path
        assert cm2.meta["last_epoch"] == 1
        assert cm2.has_checkpoint
        restored = cm2.restore(tiny_state(0.0))
        np.testing.assert_allclose(np.asarray(restored.params["w"]), 1.0)
        # recovery: the next save reuses/clears the stale slot and rotates
        cm2.save_last(tiny_state(3.0), epoch=3)
        cm2.wait_until_finished()
        restored = cm2.restore(tiny_state(0.0))
        np.testing.assert_allclose(np.asarray(restored.params["w"]), 3.0)
        assert cm2.meta["last_epoch"] == 3

    def test_stable_last_symlink_and_epoch_of(self, tmp_path):
        """`.../ckpts/last` stays a valid stable name (symlink to the
        durable slot) and epoch_of reads the persisted epoch through it."""
        cm = CheckpointManager(tmp_path / "ck")
        cm.save_last(tiny_state(5.0), epoch=4)
        cm.wait_until_finished()
        link = tmp_path / "ck" / "last"
        assert link.is_symlink() and link.exists()
        restored = cm.restore(tiny_state(0.0), link)
        np.testing.assert_allclose(np.asarray(restored.params["w"]), 5.0)
        assert CheckpointManager.epoch_of(link) == 4
        assert CheckpointManager.epoch_of(cm.meta["last_path"]) == 4
        assert CheckpointManager.epoch_of(
            tmp_path / "ck" / "epoch_000007-fid_12.500") == 7

    def test_async_save_last_overlaps_then_drains(self, tmp_path):
        """save_last is async (commit in a background thread); mutating the
        live state right after must not corrupt the saved snapshot, and
        wait_until_finished / restore drain the in-flight write."""
        cm = CheckpointManager(tmp_path / "ck")
        s = tiny_state(7.0)
        cm.save_last(s, epoch=1)
        # simulate the next train step donating/overwriting the buffers
        s = tiny_state(-1.0)
        cm.wait_until_finished()
        restored = cm.restore(tiny_state(0.0))
        np.testing.assert_allclose(np.asarray(restored.params["w"]), 7.0)
        # back-to-back saves serialize correctly (wait-at-entry)
        cm.save_last(tiny_state(8.0), epoch=2)
        cm.save_last(tiny_state(9.0), epoch=3)
        restored = cm.restore(tiny_state(0.0))
        np.testing.assert_allclose(np.asarray(restored.params["w"]), 9.0)
        assert cm.meta["last_epoch"] == 3

    def test_meta_persists(self, tmp_path):
        cm = CheckpointManager(tmp_path / "ck")
        cm.save_best_if_improved(tiny_state(1.0), 0, score=10.0)
        cm2 = CheckpointManager(tmp_path / "ck")
        assert cm2.meta["best_score"] == 10.0


class TestTracker:
    def test_scalars_jsonl(self, tmp_path):
        tr = Tracker(tmp_path, config={"a": 1})
        tr.log({"loss": 0.5, "n": jnp.asarray(3)}, step=7)
        tr.finish()
        rec = json.loads((tmp_path / "metrics.jsonl").read_text().splitlines()[0])
        assert rec["_step"] == 7
        assert rec["loss"] == 0.5
        assert rec["n"] == 3
        assert (tmp_path / "config.yaml").exists()

    def test_images_saved(self, tmp_path):
        tr = Tracker(tmp_path)
        grid = np.zeros((16, 16, 3), np.uint8)
        tr.log({"images/sample": grid}, step=1)
        rec = json.loads((tmp_path / "metrics.jsonl").read_text().splitlines()[0])
        assert rec["images/sample"]["_type"] == "image"
        assert (tmp_path / "media" / "images_sample_1.png").exists()


class TestMakeGrid:
    def test_grid_shape(self):
        batch = np.zeros((6, 8, 8, 3), np.uint8)
        g = make_grid(batch, ncol=3, pad=2)
        assert g.shape == (2 * 8 + 2, 3 * 8 + 2 * 2, 3)

    def test_legacy_real_dir_last_migrates(self, tmp_path):
        """A pre-rotation layout (meta.last_path == '.../last', a real
        orbax dir) migrates cleanly: next save rotates to last-0, replaces
        'last' with a symlink, and must not rmtree the fresh symlink."""
        import json

        cm = CheckpointManager(tmp_path / "ck")
        cm.save_last(tiny_state(1.0), epoch=0)
        cm.wait_until_finished()
        # forge the legacy layout: move the slot dir to 'last' (real dir)
        import shutil as _sh

        real = Path(cm.meta["last_path"])
        legacy = tmp_path / "ck" / "last"
        if legacy.is_symlink():
            legacy.unlink()
        _sh.move(str(real), str(legacy))
        cm.meta["last_path"] = str(legacy)
        cm._flush()

        cm2 = CheckpointManager(tmp_path / "ck")
        cm2.save_last(tiny_state(2.0), epoch=1)
        cm2.wait_until_finished()  # must not raise on the symlink
        restored = cm2.restore(tiny_state(0.0))
        np.testing.assert_allclose(np.asarray(restored.params["w"]), 2.0)
        assert (tmp_path / "ck" / "last").is_symlink()
