"""End-to-end training tests: fused train step, EMA, DP over an 8-CPU mesh.

This replaces the reference's GPU-only integration smoke test
(`test_unittest.py`, SURVEY.md §4) with a real CPU-runnable pyramid: the
train step must reduce the loss on a tiny dataset, and the same step must
compile and run sharded over the virtual 8-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgdm_tpu.diffusion import GaussianDiffusion
from sgdm_tpu.models import UNetModel
from sgdm_tpu.parallel.mesh import create_mesh, shard_batch
from sgdm_tpu.training.optim import create_optimizer, lambda_linear_schedule
from sgdm_tpu.training.state import (
    create_train_state,
    make_eval_step,
    make_sample_fn,
    make_train_step,
)


def tiny_setup(cond_dim=0, mesh=None):
    model = UNetModel(
        model_channels=16, out_channels=1, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions=(2,), num_heads=2,
        resblock_updown=True, cond_dim=cond_dim,
    )
    diffusion = GaussianDiffusion(num_timesteps=100)
    tx = create_optimizer("adamw", lr=2e-3, wd=0.0, scheduler=None)
    batch = {"image": jnp.zeros((8, 8, 8, 1))}
    if cond_dim:
        batch["cond"] = jnp.zeros((8, cond_dim))
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch, batch)
    step = make_train_step(
        model, diffusion, tx, cond_drop_prob=0.1 if cond_dim else 0.0,
        mesh=mesh,
    )
    return model, diffusion, tx, state, step


class TestLRSchedule:
    def test_warmup_then_flat(self):
        s = lambda_linear_schedule(1e-3, warm_up_steps=500)
        assert float(s(0)) == pytest.approx(1e-9, rel=1e-3)
        assert float(s(250)) == pytest.approx(0.5e-3, rel=1e-2)
        assert float(s(500)) == pytest.approx(1e-3, rel=1e-4)
        assert float(s(100000)) == pytest.approx(1e-3, rel=1e-4)


class TestTrainStep:
    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_loss_decreases(self):
        # constant-image dataset → model must quickly beat the eps=0 baseline
        _, _, _, state, step = tiny_setup()
        rng = jax.random.PRNGKey(42)
        x = jnp.full((8, 8, 8, 1), 0.5)
        first = None
        for i in range(60):
            state, metrics = step(state, {"image": x}, rng)
            if first is None:
                first = float(metrics["loss"])
        last = float(metrics["loss"])
        assert last < first, (first, last)
        assert np.isfinite(last)

    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_step_counter_and_ema(self):
        _, _, _, state, step = tiny_setup()
        x = jnp.full((8, 8, 8, 1), 0.5)
        s1, _ = step(state, {"image": x}, jax.random.PRNGKey(0))
        assert int(s1.step) == 1
        assert int(s1.ema_updates) == 1
        # warmup decay is tiny at n=1 ⇒ ema ≈ params
        diff = jax.tree.map(lambda e, p: float(jnp.abs(e - p).max()),
                            s1.ema_params, s1.params)
        assert max(jax.tree.leaves(diff)) < 0.2

    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_conditional_training(self):
        _, _, _, state, step = tiny_setup(cond_dim=6)
        x = jnp.full((8, 8, 8, 1), 0.5)
        cond = jax.nn.one_hot(jnp.arange(8) % 6, 6)
        state, metrics = step(state, {"image": x, "cond": cond}, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
class TestDataParallel:
    def test_train_step_on_8_device_mesh(self):
        cpus = jax.devices("cpu")
        assert len(cpus) == 8, "conftest must force 8 CPU devices"
        mesh = create_mesh(cpus)
        _, _, _, state, step = tiny_setup(mesh=mesh)
        x = jnp.full((8, 8, 8, 1), 0.5)
        batch = shard_batch({"image": x}, mesh)
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        # params replicated: every device has the full tree
        leaf = jax.tree.leaves(state.params)[0]
        assert len(leaf.sharding.device_set) == 8

    def test_sharded_matches_single_device(self):
        mesh = create_mesh(jax.devices("cpu"))
        model, diffusion, tx, state0, _ = tiny_setup()
        step_single = make_train_step(model, diffusion, tx)
        step_mesh = make_train_step(model, diffusion, tx, mesh=mesh)
        x = jax.random.normal(jax.random.PRNGKey(9), (8, 8, 8, 1))
        rng = jax.random.PRNGKey(1)
        s_a, m_a = step_single(state0, {"image": x}, rng)
        # donate_argnums invalidates state0 buffers → rebuild identically
        _, _, _, state0b, _ = tiny_setup()
        s_b, m_b = step_mesh(state0b, shard_batch({"image": x}, mesh), rng)
        np.testing.assert_allclose(
            float(m_a["loss"]), float(m_b["loss"]), rtol=1e-4
        )


class TestEvalAndSample:
    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_eval_step(self):
        model, diffusion, _, state, _ = tiny_setup()
        ev = make_eval_step(model, diffusion)
        out = ev(state.params, {"image": jnp.zeros((4, 8, 8, 1))},
                 jax.random.PRNGKey(0))
        assert np.isfinite(float(out["loss"]))

    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_sample_fn_guided(self):
        model, diffusion, _, state, _ = tiny_setup(cond_dim=6)
        sample = make_sample_fn(
            model, diffusion, sampling_method="ddim", num_steps=5,
            cond_scale=2.0,
        )
        cond = jax.nn.one_hot(jnp.arange(4) % 6, 6)
        imgs, inter = sample(state.ema_params, jax.random.PRNGKey(0),
                             4, 8, 1, cond=cond)
        assert imgs.shape == (4, 8, 8, 1)
        assert imgs.dtype == jnp.uint8
        assert inter["pred_x0"].shape[0] == 5


class TestResume:
    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_checkpoint_roundtrip_through_manager(self, tmp_path):
        from sgdm_tpu.training.checkpoints import CheckpointManager

        _, _, _, state, step = tiny_setup()
        x = jnp.full((8, 8, 8, 1), 0.5)
        for i in range(3):
            state, _ = step(state, {"image": x}, jax.random.PRNGKey(0))
        cm = CheckpointManager(tmp_path / "ck")
        cm.save_last(state, epoch=0)
        _, _, _, fresh, step2 = tiny_setup()
        restored = cm.restore(fresh)
        assert int(restored.step) == 3
        # training continues from the restored state
        restored, m = step2(restored, {"image": x}, jax.random.PRNGKey(1))
        assert int(restored.step) == 4
        assert np.isfinite(float(m["loss"]))


class TestMuDtype:
    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_bf16_first_moment_knob(self):
        """optim.params.mu_dtype=bfloat16: μ stored in bf16 (traffic/memory
        knob), ν stays f32, and a step stays close to the f32-μ step."""
        model = UNetModel(
            model_channels=16, out_channels=1, num_res_blocks=1,
            channel_mult=(1, 2), attention_resolutions=(2,), num_heads=2,
            resblock_updown=True,
        )
        diffusion = GaussianDiffusion(num_timesteps=100)
        batch = {"image": jax.random.normal(jax.random.PRNGKey(3),
                                            (8, 8, 8, 1))}

        def run(mu_dtype):
            tx = create_optimizer("adamw", lr=2e-3, scheduler=None,
                                  mu_dtype=mu_dtype)
            state = create_train_state(
                model, tx, jax.random.PRNGKey(0), batch, batch)
            step = make_train_step(model, diffusion, tx, cond_drop_prob=0.0)
            state, m = step(state, batch, jax.random.PRNGKey(1))
            return state, float(m["loss"])

        s16, l16 = run("bfloat16")
        mu_leaf = jax.tree.leaves(s16.opt_state[0].mu)[0]
        nu_leaf = jax.tree.leaves(s16.opt_state[0].nu)[0]
        assert mu_leaf.dtype == jnp.bfloat16
        assert nu_leaf.dtype == jnp.float32

        s32, l32 = run(None)
        assert jax.tree.leaves(s32.opt_state[0].mu)[0].dtype == jnp.float32
        np.testing.assert_allclose(l16, l32, rtol=1e-5)  # loss is pre-update
        for a, b in zip(jax.tree.leaves(s32.params),
                        jax.tree.leaves(s16.params)):
            np.testing.assert_allclose(a, b, rtol=0, atol=3e-5)


class TestTrainerKnobs:
    def _trainer(self, extra_pl=None, **kw):
        from sgdm_tpu.training.trainer import SelfGuidedDiffusionTrainer

        pl = {"trainer": {"strategy": None, **(extra_pl or {})}}
        return SelfGuidedDiffusionTrainer(
            condition_method=None, cond_scale=0.0,
            dynamic={
                "target": "sgdm_tpu.models.UNetModel",
                "params": dict(model_channels=16, out_channels=3,
                               num_res_blocks=1, channel_mult=[1, 2],
                               attention_resolutions=[2], num_heads=2),
            },
            diffusion_model={
                "target": "sgdm_tpu.diffusion.GaussianDiffusion",
                "params": {"num_timesteps": 10},
            },
            optim={"name": "adamw", "params": {"lr": 1e-4},
                   "scheduler_config": None},
            pl=pl, **kw,
        )

    def test_precision_knob_sets_compute_dtype(self):
        """pl.trainer.precision is honored when compute_dtype is absent
        (the config's '32 = full fp32' comment was previously a lie)."""
        assert self._trainer({"precision": 32})._dtype == jnp.float32
        assert self._trainer({"precision": "32"})._dtype == jnp.float32
        assert self._trainer({"precision": "bf16"})._dtype == jnp.bfloat16
        # explicit compute_dtype wins
        assert self._trainer({"precision": 32},
                             compute_dtype="bfloat16")._dtype == jnp.bfloat16

    def test_fsdp_clone_disables_flash_attention(self, monkeypatch):
        monkeypatch.setenv("SGDM_FORCE_CPU", "1")
        from sgdm_tpu.training.trainer import SelfGuidedDiffusionTrainer

        t = SelfGuidedDiffusionTrainer(
            condition_method=None, cond_scale=0.0,
            dynamic={
                "target": "sgdm_tpu.models.UNetModel",
                "params": dict(model_channels=16, out_channels=3,
                               num_res_blocks=1, channel_mult=[1, 2],
                               attention_resolutions=[2], num_heads=2),
            },
            diffusion_model={
                "target": "sgdm_tpu.diffusion.GaussianDiffusion",
                "params": {"num_timesteps": 10},
            },
            optim={"name": "adamw", "params": {"lr": 1e-4},
                   "scheduler_config": None},
            pl={"trainer": {"strategy": "data_parallel", "fsdp": True}},
        )
        # Pallas kernels (incl. auto flash attention) cannot be GSPMD-
        # partitioned over sharded params — the trainer must opt out
        assert t.model.flash_attention is False

    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_check_val_cadence(self, tmp_path, monkeypatch):
        """check_val_every_n_epoch=2 runs validation on epochs 1 and 3
        only (Lightning cadence)."""
        monkeypatch.setenv("SGDM_FORCE_CPU", "1")
        from sgdm_tpu.data.datamodule import DataModuleFromConfig

        t = self._trainer({"check_val_every_n_epoch": 2}, log_dir=tmp_path)
        ran = []
        monkeypatch.setattr(
            t, "_run_validation",
            lambda dm, epoch, *a, **k: ran.append(epoch))
        ds = {"target": "sgdm_tpu.data.synthetic.SyntheticImages",
              "params": dict(size=8, num_classes=4, length=16)}
        dm = DataModuleFromConfig(batch_size=8, train=ds, num_workers=0)
        t.fit(dm, max_epochs=4)
        assert ran == [1, 3]


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_cluster_lookup_end_to_end():
    """condition_method=cluster_lookup: the learned per-image table needs
    `image_batch_ids` at INIT (or the Embed param is never created), at
    every train step, and through the sampling API — the three plumbing
    points that previously filtered the ids out."""
    model = UNetModel(
        model_channels=8, out_channels=1, num_res_blocks=1,
        channel_mult=(1,), attention_resolutions=(), num_heads=1,
        resblock_updown=False, cond_dim=4,
        condition_method="cluster_lookup", lookup_table_size=32,
    )
    diffusion = GaussianDiffusion(num_timesteps=10)
    tx = create_optimizer("adamw", lr=1e-3, wd=0.0, scheduler=None)
    batch = {
        "image": jnp.full((4, 8, 8, 1), 0.5),
        "image_batch_ids": jnp.arange(4, dtype=jnp.int32),
    }
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), batch,
        {"image_batch_ids": batch["image_batch_ids"]},
    )
    assert "lookup_table" in state.params, list(state.params)

    step = make_train_step(model, diffusion, tx, cond_drop_prob=0.1)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    sample = make_sample_fn(model, diffusion, sampling_method="ddim",
                            num_steps=2, cond_scale=2.0,
                            pallas_inference=False)
    imgs, _ = sample(state.ema_params, jax.random.PRNGKey(2), 4, 8, 1,
                     image_batch_ids=batch["image_batch_ids"])
    assert np.asarray(imgs).shape == (4, 8, 8, 1)
