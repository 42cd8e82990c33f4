"""FSDP/ZeRO-3 state sharding (`parallel/fsdp.py`): spec rules + numerics.

The reference replicates params + Adam moments + EMA on every DDP rank
(Lightning DDP, SURVEY.md §2.2).  FSDP shards all of them over the 'data'
axis with GSPMD-inserted all-gather/reduce-scatter; the contract is that
sharding changes placement only — one train step on the FSDP mesh must
reproduce the single-device step, standalone and combined with tensor
parallelism (hybrid 2-D layout).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sgdm_tpu.diffusion import GaussianDiffusion
from sgdm_tpu.models import UNetModel
from sgdm_tpu.parallel.fsdp import (
    fsdp_param_pspecs,
    shard_train_state,
    state_sharding,
    train_state_pspecs,
)
from sgdm_tpu.parallel.mesh import create_mesh, shard_batch
from sgdm_tpu.training.optim import create_optimizer
from sgdm_tpu.training.state import create_train_state, make_train_step


def cpu_devices():
    return jax.devices("cpu")


def _setup(cond_dim=16):
    model = UNetModel(
        model_channels=32, out_channels=3, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions=(2,), num_heads=4,
        resblock_updown=True, cond_dim=cond_dim,
    )
    diffusion = GaussianDiffusion(num_timesteps=50)
    tx = create_optimizer("adamw", lr=1e-3, scheduler=None)
    b = 8
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(7), (b, 16, 16, 3)),
        "cond": jax.nn.one_hot(jnp.arange(b) % cond_dim, cond_dim),
    }
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), batch, {"cond": batch["cond"]}
    )
    return model, diffusion, tx, state, batch


def _flat_specs(specs):
    return {
        "/".join(str(k.key) for k in path): spec
        for path, spec in jax.tree_util.tree_flatten_with_path(
            specs, is_leaf=lambda x: isinstance(x, P))[0]
    }


class TestPspecRules:
    def test_large_leaves_shard_largest_free_dim(self):
        _, _, _, state, _ = _setup()
        flat = _flat_specs(
            fsdp_param_pspecs(state.params, axis_size=8, min_size=1024))
        # mid-block conv kernel [3,3,64,64]: both channel dims divisible,
        # largest (tied) dim gets the shard
        spec = flat["backbone/mid_res1/in_conv/kernel"]
        assert spec in (P(None, None, "data", None),
                        P(None, None, None, "data")), spec
        # time embed dense [32,128] → shard dim 1 (largest divisible)
        assert flat["time_embed_1/kernel"] == P(None, "data")

    def test_small_leaves_replicate(self):
        _, _, _, state, _ = _setup()
        flat = _flat_specs(
            fsdp_param_pspecs(state.params, axis_size=8, min_size=1024))
        assert flat["backbone/down_0_0/out_norm/scale"] == P()
        assert flat["backbone/down_0_0/in_conv/bias"] == P()

    def test_composes_with_tp_base(self):
        from sgdm_tpu.parallel.tp import unet_param_pspecs

        _, _, _, state, _ = _setup()
        base = unet_param_pspecs(state.params, axis_size=2)
        flat = _flat_specs(fsdp_param_pspecs(
            state.params, axis_size=4, min_size=1024, base_pspecs=base))
        # TP claimed Cout of in_conv → FSDP takes Cin
        k = "backbone/mid_res1/in_conv/kernel"
        assert flat[k] == P(None, None, "data", "model"), flat[k]
        # TP row-split out_conv on Cin → FSDP takes Cout
        k = "backbone/mid_res1/out_conv/kernel"
        assert flat[k] == P(None, None, "model", "data"), flat[k]

    def test_state_pspecs_cover_moments_and_scalars(self):
        _, _, _, state, _ = _setup()
        specs = train_state_pspecs(state, axis_size=8, min_size=1024)
        mu = _flat_specs(specs.opt_state[0].mu)
        prm = _flat_specs(specs.params)
        k = "backbone/mid_res1/in_conv/kernel"
        assert mu[k] == prm[k] != P()
        assert specs.step == P()
        assert specs.opt_state[0].count == P()

    def test_indivisible_or_1d_mesh_replicates(self):
        _, _, _, state, _ = _setup()
        for spec in jax.tree.leaves(
                fsdp_param_pspecs(state.params, axis_size=7),
                is_leaf=lambda x: isinstance(x, P)):
            assert spec == P()
        mesh = Mesh(np.asarray(cpu_devices()[:1]).reshape(1), ("data",))
        sh = state_sharding(state, mesh)
        for s in jax.tree.leaves(sh, is_leaf=lambda x: hasattr(x, "spec")):
            assert s.spec == P()


class TestNumerics:
    def test_fsdp_step_matches_single_device(self):
        model, diffusion, tx, state0, batch = _setup()
        step_single = make_train_step(model, diffusion, tx,
                                      cond_drop_prob=0.0)
        s_a, m_a = step_single(state0, batch, jax.random.PRNGKey(1))
        ref_params = jax.device_get(s_a.params)
        ref_mu = jax.device_get(s_a.opt_state[0].mu)

        mesh = create_mesh(cpu_devices())  # 1-D ('data',) × 8
        _, _, _, state0b, _ = _setup()  # donate invalidated state0
        sh = state_sharding(state0b, mesh)
        state_f = shard_train_state(state0b, mesh)
        # the sharding actually happened: params live in 8 distinct shards
        leaf = state_f.params["backbone"]["mid_res1"]["in_conv"]["kernel"]
        assert len(leaf.sharding.device_set) == 8
        assert "data" in str(leaf.sharding.spec)

        step_f = make_train_step(model, diffusion, tx, cond_drop_prob=0.0,
                                 mesh=mesh, state_shardings=sh)
        s_b, m_b = step_f(state_f, shard_batch(batch, mesh),
                          jax.random.PRNGKey(1))
        np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                                   rtol=1e-4)
        # updated state stays FSDP-sharded (the memory win persists)
        out_leaf = s_b.params["backbone"]["mid_res1"]["in_conv"]["kernel"]
        assert "data" in str(out_leaf.sharding.spec)
        for pa, pb in zip(jax.tree.leaves(ref_params),
                          jax.tree.leaves(jax.device_get(s_b.params))):
            np.testing.assert_allclose(pa, pb, rtol=2e-4, atol=1e-6)
        for a, b in zip(jax.tree.leaves(ref_mu),
                        jax.tree.leaves(
                            jax.device_get(s_b.opt_state[0].mu))):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)

    def test_hybrid_fsdp_tp_matches_single_device(self):
        model, diffusion, tx, state0, batch = _setup()
        step_single = make_train_step(model, diffusion, tx,
                                      cond_drop_prob=0.0)
        s_a, m_a = step_single(state0, batch, jax.random.PRNGKey(1))
        ref_params = jax.device_get(s_a.params)

        devs = cpu_devices()
        mesh = Mesh(np.asarray(devs[:8]).reshape(4, 2), ("data", "model"))
        _, _, _, state0b, _ = _setup()
        sh = state_sharding(state0b, mesh)  # TP base + FSDP over 'data'
        state_h = jax.device_put(state0b, sh)
        leaf = state_h.params["backbone"]["mid_res1"]["in_conv"]["kernel"]
        assert leaf.sharding.spec == P(None, None, "data", "model")
        assert len(leaf.sharding.device_set) == 8

        step_h = make_train_step(model, diffusion, tx, cond_drop_prob=0.0,
                                 mesh=mesh, state_shardings=sh)
        s_b, m_b = step_h(state_h, shard_batch(batch, mesh),
                          jax.random.PRNGKey(1))
        np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                                   rtol=1e-4)
        for pa, pb in zip(jax.tree.leaves(ref_params),
                          jax.tree.leaves(jax.device_get(s_b.params))):
            np.testing.assert_allclose(pa, pb, rtol=2e-4, atol=1e-6)

    def test_fsdp_with_grad_accum_matches_single_device(self):
        """accumulate_grad_batches scans micro-batches inside the jitted
        step; with FSDP the grad carry must reduce over 'data' correctly
        at each micro-step (GSPMD-derived) — compare vs the single-device
        accumulated step."""
        model, diffusion, tx, state0, batch = _setup()
        step_single = make_train_step(model, diffusion, tx,
                                      cond_drop_prob=0.0,
                                      accumulate_grad_batches=2)
        s_a, m_a = step_single(state0, batch, jax.random.PRNGKey(1))
        ref_params = jax.device_get(s_a.params)

        mesh = create_mesh(cpu_devices())
        _, _, _, state0b, _ = _setup()
        sh = state_sharding(state0b, mesh)
        step_f = make_train_step(model, diffusion, tx, cond_drop_prob=0.0,
                                 accumulate_grad_batches=2, mesh=mesh,
                                 state_shardings=sh)
        s_b, m_b = step_f(shard_train_state(state0b, mesh),
                          shard_batch(batch, mesh), jax.random.PRNGKey(1))
        np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                                   rtol=1e-4)
        assert int(s_b.step) == 1
        for pa, pb in zip(jax.tree.leaves(ref_params),
                          jax.tree.leaves(jax.device_get(s_b.params))):
            np.testing.assert_allclose(pa, pb, rtol=2e-4, atol=1e-6)

    def test_fsdp_sampling_matches_replicated(self):
        """FSDP-sharded EMA params sample identically — jit propagates the
        committed input shardings into the scan (GSPMD all-gathers per
        layer)."""
        from sgdm_tpu.training.state import make_sample_fn

        model, diffusion, tx, state, batch = _setup()
        sample = make_sample_fn(
            model, diffusion, sampling_method="ddim", num_steps=4,
            cond_scale=2.0, pallas_inference=False,
        )
        cond = batch["cond"][:4]
        imgs_ref, _ = sample(state.ema_params, jax.random.PRNGKey(0),
                             4, 16, 3, cond=cond)

        mesh = create_mesh(cpu_devices())
        specs = fsdp_param_pspecs(state.ema_params, axis_size=8)
        sh = jax.tree.map(
            lambda s: jax.sharding.NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P))
        ema_f = jax.device_put(state.ema_params, sh)
        imgs_f, _ = sample(ema_f, jax.random.PRNGKey(0), 4, 16, 3,
                           cond=cond)
        diff = np.abs(np.asarray(imgs_ref, np.int32)
                      - np.asarray(imgs_f, np.int32))
        assert diff.max() <= 1, diff.max()

    def test_fsdp_checkpoint_roundtrip(self, tmp_path):
        """Orbax save/restore of an FSDP-sharded TrainState resumes
        bit-identically onto the same shardings."""
        from sgdm_tpu.training.checkpoints import CheckpointManager

        model, diffusion, tx, state0, batch = _setup()
        mesh = create_mesh(cpu_devices())
        sh = state_sharding(state0, mesh)
        step = make_train_step(model, diffusion, tx, cond_drop_prob=0.0,
                               mesh=mesh, state_shardings=sh)
        state = shard_train_state(state0, mesh)
        state, _ = step(state, shard_batch(batch, mesh),
                        jax.random.PRNGKey(1))

        mgr = CheckpointManager(tmp_path / "ck")
        mgr.save_last(state, epoch=1)

        _, _, _, template, _ = _setup()
        restored = mgr.restore(shard_train_state(template, mesh))
        r2, m2 = step(restored, shard_batch(batch, mesh),
                      jax.random.PRNGKey(5))
        sA, mA = step(jax.device_put(state, sh), shard_batch(batch, mesh),
                      jax.random.PRNGKey(5))
        np.testing.assert_allclose(float(mA["loss"]), float(m2["loss"]),
                                   rtol=1e-6)


class TestTrainerWiring:
    def test_trainer_fsdp_flag_shards_state(self, monkeypatch):
        """pl.trainer.fsdp=true → FSDP-sharded state through the trainer's
        own config path (composing with tensor_parallel when set)."""
        monkeypatch.setenv("SGDM_FORCE_CPU", "1")
        from sgdm_tpu.training.trainer import SelfGuidedDiffusionTrainer

        trainer = SelfGuidedDiffusionTrainer(
            condition_method="label", cond_dim=4, cond_scale=2.0,
            dynamic={
                "target": "sgdm_tpu.models.UNetModel",
                "params": dict(
                    model_channels=32, out_channels=3, num_res_blocks=1,
                    channel_mult=[1, 2], attention_resolutions=[2],
                    num_heads=4, resblock_updown=True, cond_dim=4,
                ),
            },
            diffusion_model={
                "target": "sgdm_tpu.diffusion.GaussianDiffusion",
                "params": {"num_timesteps": 20},
            },
            optim={"name": "adamw", "params": {"lr": 1e-4},
                   "scheduler_config": None},
            pl={"trainer": {"strategy": "data_parallel", "fsdp": True}},
            compute_dtype="float32",
        )
        assert trainer.fsdp
        batch = {
            "image": jnp.zeros((8, 16, 16, 3)),
            "cond": jax.nn.one_hot(jnp.arange(8) % 4, 4),
        }
        trainer._init_state(batch)
        k = trainer.state.params["backbone"]["mid_res1"]["in_conv"][
            "kernel"]
        assert "data" in str(k.sharding.spec), k.sharding
        assert trainer._state_shardings is not None
