"""Tests: orbax CheckpointManager best/last/resume policy + local Tracker."""

import json

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
