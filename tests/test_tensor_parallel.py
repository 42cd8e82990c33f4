"""Tensor-parallel ('model' axis) shardings: spec rules + numerics.

The reference has no model parallelism (DDP only, SURVEY.md §2.2); this
covers the scaling extension `parallel/tp.py` adds: Megatron-style
column/row sharding of the UNet over a 2-D ('data','model') mesh, with
GSPMD inserting the collectives.  The contract is that sharding changes
placement only — one train step on the 2-D mesh must reproduce the
single-device step bit-for-tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from sgdm_tpu.diffusion import GaussianDiffusion
from sgdm_tpu.models import UNetModel
from sgdm_tpu.parallel.mesh import create_mesh, shard_batch
from sgdm_tpu.parallel.tp import (
    shard_train_state,
    state_sharding,
    train_state_pspecs,
    unet_param_pspecs,
)
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


def _tp_mesh(data=2, tp=4):
    devs = cpu_devices()
    assert len(devs) >= data * tp
    return Mesh(
        np.asarray(devs[: data * tp]).reshape(data, tp), ("data", "model")
    )


class TestPspecRules:
    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_unet_rules(self):
        model, _, tx, state, _ = _setup()
        specs = unet_param_pspecs(state.params, axis_size=4)
        flat = {
            "/".join(str(k.key) for k in path): spec
            for path, spec in jax.tree_util.tree_flatten_with_path(
                specs, is_leaf=lambda x: isinstance(x, P))[0]
        }
        # ResBlock conv pair: column then row
        assert flat["backbone/down_0_0/in_conv/kernel"] == P(
            None, None, None, "model")
        assert flat["backbone/down_0_0/in_conv/bias"] == P("model")
        assert flat["backbone/down_0_0/out_conv/kernel"] == P(
            None, None, "model", None)
        assert flat["backbone/down_0_0/out_conv/bias"] == P()
        # the GN between the pair rides the sharded channels
        assert flat["backbone/down_0_0/out_norm/scale"] == P("model")
        # attention column/row
        assert flat["backbone/mid_attn/qkv/kernel"] == P(None, "model")
        assert flat["backbone/mid_attn/proj_out/kernel"] == P("model", None)
        # embedding MLP column/row
        assert flat["time_embed_1/kernel"] == P(None, "model")
        assert flat["time_embed_2/kernel"] == P("model", None)
        # replicated leaves: FiLM proj, skip proj, input GN
        assert flat["backbone/down_0_0/emb_proj/kernel"] == P()
        assert flat["backbone/down_1_0/skip_proj/kernel"] == P()
        assert flat["backbone/down_0_0/in_norm/scale"] == P()

    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_indivisible_falls_back_replicated(self):
        _, _, _, state, _ = _setup()
        specs = unet_param_pspecs(state.params, axis_size=7)
        for spec in jax.tree.leaves(
                specs, is_leaf=lambda x: isinstance(x, P)):
            assert spec == P()

    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_state_pspecs_cover_opt_state(self):
        _, _, _, state, _ = _setup()
        specs = train_state_pspecs(state, axis_size=4)
        mu_specs = specs.opt_state[0].mu
        flat = {
            "/".join(str(k.key) for k in path): spec
            for path, spec in jax.tree_util.tree_flatten_with_path(
                mu_specs, is_leaf=lambda x: isinstance(x, P))[0]
        }
        # the Adam moments shard exactly like their parameters
        assert flat["backbone/down_0_0/in_conv/kernel"] == P(
            None, None, None, "model")
        assert specs.step == P()
        assert specs.opt_state[0].count == P()

    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_data_only_mesh_is_fully_replicated(self):
        _, _, _, state, _ = _setup()
        mesh = create_mesh(cpu_devices())  # 1-D ('data',)
        sh = state_sharding(state, mesh)
        for s in jax.tree.leaves(
                sh, is_leaf=lambda x: hasattr(x, "spec")):
            assert s.spec == P()


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
class TestTrainerWiring:
    def test_trainer_builds_tp_mesh_and_shards_state(self, monkeypatch):
        """pl.trainer.tensor_parallel=2 → 2-D mesh + model-sharded state
        through the trainer's own config path."""
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
            pl={"trainer": {"strategy": "data_parallel",
                            "tensor_parallel": 2}},
            compute_dtype="float32",
        )
        assert trainer.mesh.axis_names == ("data", "model")
        assert trainer.mesh.devices.shape == (4, 2)
        batch = {
            "image": jnp.zeros((8, 16, 16, 3)),
            "cond": jax.nn.one_hot(jnp.arange(8) % 4, 4),
        }
        trainer._init_state(batch)
        k = trainer.state.params["backbone"]["down_0_0"]["in_conv"]["kernel"]
        assert k.sharding.spec == P(None, None, None, "model")
        assert trainer._state_shardings is not None


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
class TestNumerics:
    def test_tp_step_matches_single_device(self):
        model, diffusion, tx, state0, batch = _setup()
        step_single = make_train_step(model, diffusion, tx,
                                      cond_drop_prob=0.0)
        s_a, m_a = step_single(state0, batch, jax.random.PRNGKey(1))
        ref_params = jax.device_get(s_a.params)

        mesh = _tp_mesh(data=2, tp=4)
        _, _, _, state0b, _ = _setup()  # donate invalidated state0
        sh = state_sharding(state0b, mesh)
        state_tp = shard_train_state(state0b, mesh)
        # the sharding actually happened: an in_conv kernel lives on 4
        # model shards × 2 data replicas
        leaf = state_tp.params["backbone"]["down_0_0"]["in_conv"]["kernel"]
        assert len(leaf.sharding.device_set) == 8
        assert leaf.sharding.spec == P(None, None, None, "model")

        step_tp = make_train_step(model, diffusion, tx, cond_drop_prob=0.0,
                                  mesh=mesh, state_shardings=sh)
        s_b, m_b = step_tp(state_tp, shard_batch(batch, mesh),
                           jax.random.PRNGKey(1))
        np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                                   rtol=1e-4)
        got = jax.device_get(s_b.params)
        for pa, pb in zip(jax.tree.leaves(ref_params),
                          jax.tree.leaves(got)):
            np.testing.assert_allclose(pa, pb, rtol=2e-4, atol=1e-6)

    def test_tp_unetca_matches_single_device(self):
        """The cross-attention family: to_q column / to_out row sharding
        (shared kv replicated) must also be placement-only."""
        from sgdm_tpu.models import UNetCAModel

        model = UNetCAModel(
            model_channels=32, out_channels=3, num_res_blocks=1,
            channel_mult=(1, 2), attention_resolutions=(2,), num_heads=4,
            cond_dim=16, cond_token_num=1,
        )
        diffusion = GaussianDiffusion(num_timesteps=50)
        tx = create_optimizer("adamw", lr=1e-3, scheduler=None)
        b = 8
        batch = {
            "image": jax.random.normal(jax.random.PRNGKey(3), (b, 16, 16, 3)),
            "cond": jax.nn.one_hot(jnp.arange(b) % 16, 16),
        }

        def fresh():
            return create_train_state(
                model, tx, jax.random.PRNGKey(0), batch,
                {"cond": batch["cond"]})

        step_single = make_train_step(model, diffusion, tx,
                                      cond_drop_prob=0.0)
        s_a, m_a = step_single(fresh(), batch, jax.random.PRNGKey(1))
        ref_params = jax.device_get(s_a.params)

        mesh = _tp_mesh(data=2, tp=4)
        state0 = fresh()
        specs = unet_param_pspecs(state0.params, axis_size=4)
        flat = {
            "/".join(str(k.key) for k in path): spec
            for path, spec in jax.tree_util.tree_flatten_with_path(
                specs, is_leaf=lambda x: isinstance(x, P))[0]
        }
        qs = [k for k in flat if k.endswith("to_q/kernel")]
        assert qs and all(flat[k] == P(None, "model") for k in qs)
        outs = [k for k in flat if k.endswith("to_out/kernel")]
        assert outs and all(flat[k] == P("model", None) for k in outs)
        kvs = [k for k in flat if k.endswith("to_kv/kernel")
               or k.endswith("null_kv")]
        assert kvs and all(flat[k] == P() for k in kvs)

        sh = state_sharding(state0, mesh)
        step_tp = make_train_step(model, diffusion, tx, cond_drop_prob=0.0,
                                  mesh=mesh, state_shardings=sh)
        s_b, m_b = step_tp(shard_train_state(state0, mesh),
                           shard_batch(batch, mesh), jax.random.PRNGKey(1))
        np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                                   rtol=1e-4)
        for pa, pb in zip(jax.tree.leaves(ref_params),
                          jax.tree.leaves(jax.device_get(s_b.params))):
            np.testing.assert_allclose(pa, pb, rtol=2e-4, atol=1e-6)

    def test_tp_sampling_matches_replicated(self):
        """make_sample_fn needs no TP plumbing: jit propagates the
        committed input shardings, so TP-sharded EMA params sample
        identically (GSPMD partitioned denoiser inside the scan)."""
        from sgdm_tpu.training.state import make_sample_fn

        model, diffusion, tx, state, batch = _setup()
        sample = make_sample_fn(
            model, diffusion, sampling_method="ddim", num_steps=4,
            cond_scale=2.0, pallas_inference=False,
        )
        cond = batch["cond"][:4]
        imgs_ref, _ = sample(state.ema_params, jax.random.PRNGKey(0),
                             4, 16, 3, cond=cond)

        mesh = _tp_mesh(data=2, tp=4)
        from sgdm_tpu.parallel.tp import unet_param_pspecs

        specs = unet_param_pspecs(state.ema_params, axis_size=4)
        sh = jax.tree.map(
            lambda s: jax.sharding.NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P))
        ema_tp = jax.device_put(state.ema_params, sh)
        imgs_tp, _ = sample(ema_tp, jax.random.PRNGKey(0), 4, 16, 3,
                            cond=cond)
        # uint8 output: identical up to the float→uint8 rounding edge
        diff = np.abs(np.asarray(imgs_ref, np.int32)
                      - np.asarray(imgs_tp, np.int32))
        assert diff.max() <= 1, diff.max()

    def test_tp_checkpoint_roundtrip(self, tmp_path):
        """Orbax save/restore of a TP-sharded TrainState: restore onto
        the same shardings and continue training bit-identically."""
        from sgdm_tpu.training.checkpoints import CheckpointManager

        model, diffusion, tx, state0, batch = _setup()
        mesh = _tp_mesh(data=2, tp=4)
        sh = state_sharding(state0, mesh)
        step = make_train_step(model, diffusion, tx, cond_drop_prob=0.0,
                               mesh=mesh, state_shardings=sh)
        state = shard_train_state(state0, mesh)
        state, _ = step(state, shard_batch(batch, mesh),
                        jax.random.PRNGKey(1))

        mgr = CheckpointManager(tmp_path / "ck")
        mgr.save_last(state, epoch=1)

        _, _, _, template, _ = _setup()
        # a TP-sharded template makes orbax restore directly into the
        # sharded layout
        restored = mgr.restore(shard_train_state(template, mesh))
        r2, m2 = step(restored, shard_batch(batch, mesh),
                      jax.random.PRNGKey(5))
        # continue from the original in parallel for comparison
        sA, mA = step(jax.device_put(state, sh), shard_batch(batch, mesh),
                      jax.random.PRNGKey(5))
        np.testing.assert_allclose(float(mA["loss"]), float(m2["loss"]),
                                   rtol=1e-6)

    def test_tp_ema_and_moments_match(self):
        model, diffusion, tx, state0, batch = _setup()
        step_single = make_train_step(model, diffusion, tx,
                                      cond_drop_prob=0.0)
        s_a, _ = step_single(state0, batch, jax.random.PRNGKey(2))
        ref_ema = jax.device_get(s_a.ema_params)
        ref_mu = jax.device_get(s_a.opt_state[0].mu)

        mesh = _tp_mesh(data=4, tp=2)
        _, _, _, state0b, _ = _setup()
        sh = state_sharding(state0b, mesh)
        step_tp = make_train_step(model, diffusion, tx, cond_drop_prob=0.0,
                                  mesh=mesh, state_shardings=sh)
        s_b, _ = step_tp(shard_train_state(state0b, mesh),
                         shard_batch(batch, mesh), jax.random.PRNGKey(2))
        for a, b in zip(jax.tree.leaves(ref_ema),
                        jax.tree.leaves(jax.device_get(s_b.ema_params))):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)
        for a, b in zip(jax.tree.leaves(ref_mu),
                        jax.tree.leaves(jax.device_get(s_b.opt_state[0].mu))):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)
