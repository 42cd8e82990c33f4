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
import pytest


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
    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
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

    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_small_leaves_replicate(self):
        _, _, _, state, _ = _setup()
        flat = _flat_specs(
            fsdp_param_pspecs(state.params, axis_size=8, min_size=1024))
        assert flat["backbone/down_0_0/out_norm/scale"] == P()
        assert flat["backbone/down_0_0/in_conv/bias"] == P()

    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
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

    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_state_pspecs_cover_moments_and_scalars(self):
        _, _, _, state, _ = _setup()
        specs = train_state_pspecs(state, axis_size=8, min_size=1024)
        mu = _flat_specs(specs.opt_state[0].mu)
        prm = _flat_specs(specs.params)
        k = "backbone/mid_res1/in_conv/kernel"
        assert mu[k] == prm[k] != P()
        assert specs.step == P()
        assert specs.opt_state[0].count == P()

    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
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


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
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


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
class TestCrossTopologyRestore:
    """Checkpoint portability across device topologies (round-3 VERDICT #6):
    the operation actually performed when scaling a pod run up/down or
    debugging it on one chip.  orbax restores into whatever shardings the
    template carries, so save-on-mesh-A → restore-on-B must be bit-exact
    (values never depend on placement) and the next step must continue
    identically."""

    def _one_step(self, state0, batch, mesh=None, sh=None):
        model, diffusion, tx, _, _ = _setup()
        step = make_train_step(model, diffusion, tx, cond_drop_prob=0.0,
                               mesh=mesh, state_shardings=sh)
        b = shard_batch(batch, mesh) if mesh is not None else batch
        return step, step(state0, b, jax.random.PRNGKey(1))

    @staticmethod
    def _assert_bit_equal(a_state, b_state):
        la = jax.tree.leaves(jax.device_get(
            (a_state.params, a_state.ema_params, a_state.opt_state,
             a_state.step)))
        lb = jax.tree.leaves(jax.device_get(
            (b_state.params, b_state.ema_params, b_state.opt_state,
             b_state.step)))
        assert len(la) == len(lb)
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_fsdp8_save_restores_on_single_device(self, tmp_path):
        """Save on the 8-device FSDP mesh → restore on ONE device (the
        scale-down/debug path): bit-equal state + identical next-step
        loss through the plain single-device step."""
        from sgdm_tpu.training.checkpoints import CheckpointManager

        model, diffusion, tx, state0, batch = _setup()
        mesh = create_mesh(cpu_devices())
        sh = state_sharding(state0, mesh)
        step_f = make_train_step(model, diffusion, tx, cond_drop_prob=0.0,
                                 mesh=mesh, state_shardings=sh)
        state = step_f(shard_train_state(state0, mesh),
                       shard_batch(batch, mesh), jax.random.PRNGKey(1))[0]

        mgr = CheckpointManager(tmp_path / "ck")
        mgr.save_last(state, epoch=1)

        # template on ONE device: fresh single-device state
        _, _, _, template, _ = _setup()
        dev0 = cpu_devices()[0]
        template = jax.device_put(template, jax.sharding.SingleDeviceSharding(dev0))
        restored = mgr.restore(template)
        leaf = restored.params["backbone"]["mid_res1"]["in_conv"]["kernel"]
        assert len(leaf.sharding.device_set) == 1
        self._assert_bit_equal(state, restored)

        # next step continues identically on the new topology
        step_1 = make_train_step(model, diffusion, tx, cond_drop_prob=0.0)
        _, m1 = step_1(restored, batch, jax.random.PRNGKey(5))
        _, mf = step_f(state, shard_batch(batch, mesh),
                       jax.random.PRNGKey(5))
        np.testing.assert_allclose(float(m1["loss"]), float(mf["loss"]),
                                   rtol=1e-6)

    def test_dptp_save_restores_on_fsdp_mesh(self, tmp_path):
        """Save on the hybrid 4×2 dp×tp mesh → restore onto the 1-D
        8-device FSDP mesh (a DIFFERENT mesh shape): bit-equal state +
        identical next-step loss through the FSDP step."""
        from sgdm_tpu.training.checkpoints import CheckpointManager

        model, diffusion, tx, state0, batch = _setup()
        devs = cpu_devices()
        mesh_tp = Mesh(np.asarray(devs[:8]).reshape(4, 2),
                       ("data", "model"))
        sh_tp = state_sharding(state0, mesh_tp)
        step_tp = make_train_step(model, diffusion, tx, cond_drop_prob=0.0,
                                  mesh=mesh_tp, state_shardings=sh_tp)
        state = step_tp(jax.device_put(state0, sh_tp),
                        shard_batch(batch, mesh_tp),
                        jax.random.PRNGKey(1))[0]
        leaf = state.params["backbone"]["mid_res1"]["in_conv"]["kernel"]
        assert leaf.sharding.spec == P(None, None, "data", "model")

        mgr = CheckpointManager(tmp_path / "ck")
        mgr.save_last(state, epoch=1)

        _, _, _, template, _ = _setup()
        mesh_f = create_mesh(devs)  # 1-D ('data',) × 8
        restored = mgr.restore(shard_train_state(template, mesh_f))
        rleaf = restored.params["backbone"]["mid_res1"]["in_conv"]["kernel"]
        assert "model" not in str(rleaf.sharding.spec)
        self._assert_bit_equal(state, restored)

        sh_f = state_sharding(template, mesh_f)
        step_f = make_train_step(model, diffusion, tx, cond_drop_prob=0.0,
                                 mesh=mesh_f, state_shardings=sh_f)
        _, m_f = step_f(restored, shard_batch(batch, mesh_f),
                        jax.random.PRNGKey(5))
        _, m_tp = step_tp(state, shard_batch(batch, mesh_tp),
                          jax.random.PRNGKey(5))
        np.testing.assert_allclose(float(m_f["loss"]), float(m_tp["loss"]),
                                   rtol=1e-6)


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
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
