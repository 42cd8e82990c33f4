"""Tests for the Flax UNet denoisers.

Parity targets: openaimodel.py (concat-cond UNet), openaimodel_ca.py
(cross-attn UNet), crossattetion_lr.py (null-KV attention),
dynamic/diffusionmodules/util.py:151 (timestep embedding).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sgdm_tpu.models import (
    AttentionLR,
    UNetCAModel,
    UNetModel,
    create_denoiser,
    ema_decay_schedule,
    ema_update,
    timestep_embedding,
)

B, S = 2, 16


def tiny_unet(**kw):
    args = dict(
        model_channels=32, out_channels=3, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions=(2,), num_heads=4,
        resblock_updown=True,
    )
    args.update(kw)
    return UNetModel(**args)


def tiny_ca(**kw):
    args = dict(
        model_channels=32, out_channels=3, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions=(2,), num_heads=4,
        cond_dim=10, cond_token_num=1, context_dim=16,
    )
    args.update(kw)
    return UNetCAModel(**args)


class TestTimestepEmbedding:
    def test_matches_torch_reference_formula(self):
        import math
        dim, T = 64, 10
        t = torch.arange(T, dtype=torch.float32)
        half = dim // 2
        freqs = torch.exp(-math.log(10000) * torch.arange(half, dtype=torch.float32) / half)
        args = t[:, None] * freqs[None]
        golden = torch.cat([torch.cos(args), torch.sin(args)], dim=-1).numpy()
        ours = timestep_embedding(jnp.arange(T), dim)
        np.testing.assert_allclose(np.asarray(ours), golden, rtol=1e-4, atol=2e-5)

    def test_odd_dim_padded(self):
        out = timestep_embedding(jnp.arange(4), 7)
        assert out.shape == (4, 7)
        np.testing.assert_allclose(np.asarray(out[:, -1]), 0.0)


class TestUNet:
    @pytest.fixture(scope="class")
    def setup(self):
        m = tiny_unet(cond_dim=10)
        x = jnp.ones((B, S, S, 3))
        t = jnp.array([3, 500])
        cond = jax.nn.one_hot(jnp.array([1, 7]), 10)
        v = m.init(jax.random.PRNGKey(0), x, t, cond=cond)
        return m, v, x, t, cond

    def test_output_shape_and_zero_init(self, setup):
        m, v, x, t, cond = setup
        out = m.apply(v, x, t, cond=cond)
        assert out.shape == (B, S, S, 3)
        # zero-init out conv ⇒ exactly zero at init
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_cond_changes_output(self, setup):
        m, v, x, t, cond = setup
        # perturb out conv so outputs are non-zero
        v2 = jax.tree.map(lambda p: p + 0.01, v)
        o1 = m.apply(v2, x, t, cond=cond)
        o2 = m.apply(v2, x, t, cond=cond * 2.0)
        assert float(jnp.abs(o1 - o2).max()) > 0

    def test_drop_mask_removes_cond_dependence(self, setup):
        m, v, x, t, cond = setup
        v2 = jax.tree.map(lambda p: p + 0.01, v)
        mask = jnp.ones((B,), dtype=bool)
        o1 = m.apply(v2, x, t, cond=cond, cond_drop_mask=mask)
        o2 = m.apply(v2, x, t, cond=cond * 5.0, cond_drop_mask=mask)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)

    def test_unconditional_variant(self):
        m = tiny_unet(cond_dim=0)
        x = jnp.ones((B, S, S, 3))
        t = jnp.array([0, 1])
        v = m.init(jax.random.PRNGKey(0), x, t)
        assert m.apply(v, x, t).shape == (B, S, S, 3)

    def test_clusterlayout_channel_concat(self):
        m = tiny_unet(cond_dim=4, condition_method="clusterlayout")
        x = jnp.ones((B, S, S, 3))
        t = jnp.array([0, 1])
        cond = jnp.ones((B, 4))
        layout = jnp.ones((B, S, S, 2))
        v = m.init(jax.random.PRNGKey(0), x, t, cond=cond, layout=layout)
        out = m.apply(v, x, t, cond=cond, layout=layout)
        assert out.shape == (B, S, S, 3)


class TestUNetCA:
    def test_cond_token_1(self):
        m = tiny_ca()
        x = jnp.ones((B, S, S, 3))
        t = jnp.array([0, 10])
        cond = jnp.ones((B, 10))
        v = m.init(jax.random.PRNGKey(0), x, t, cond=cond)
        out = m.apply(v, x, t, cond=cond)
        assert out.shape == (B, S, S, 3)
        np.testing.assert_allclose(np.asarray(out), 0.0)  # zero-init

    def test_cond_token_many_cls_pool(self):
        m = tiny_ca(cond_token_num=4, use_cls_token_as_pooled=True)
        x = jnp.ones((B, S, S, 3))
        t = jnp.array([0, 10])
        cond = jnp.ones((B, 4, 10))
        v = m.init(jax.random.PRNGKey(0), x, t, cond=cond)
        assert m.apply(v, x, t, cond=cond).shape == (B, S, S, 3)

    def test_layout_only(self):
        m = tiny_ca(cond_dim=0, cond_token_num=0, condition_method="layout")
        x = jnp.ones((B, S, S, 3))
        t = jnp.array([0, 10])
        layout = jnp.ones((B, S, S, 21))
        v = m.init(jax.random.PRNGKey(0), x, t, layout=layout)
        assert m.apply(v, x, t, layout=layout).shape == (B, S, S, 3)

    def test_stego_cluster_layout(self):
        m = tiny_ca(condition_method="stegoclusterlayout")
        x = jnp.ones((B, S, S, 3))
        t = jnp.array([0, 10])
        cond = jnp.ones((B, 10))
        layout = jnp.ones((B, S, S, 27))
        v = m.init(jax.random.PRNGKey(0), x, t, cond=cond, layout=layout)
        assert m.apply(v, x, t, cond=cond, layout=layout).shape == (B, S, S, 3)


class TestAttentionLR:
    def test_self_plus_context(self):
        m = AttentionLR(heads=4, dim_head=8, context_dim=16)
        x = jnp.ones((B, 4, 4, 32))
        ctx = jnp.ones((B, 16, 16))
        v = m.init(jax.random.PRNGKey(0), x, ctx)
        out = m.apply(v, x, ctx)
        assert out.shape == x.shape

    def test_null_kv_param_exists(self):
        m = AttentionLR(heads=4, dim_head=8, context_dim=16)
        x = jnp.ones((B, 4, 4, 32))
        v = m.init(jax.random.PRNGKey(0), x, jnp.ones((B, 16, 16)))
        assert v["params"]["null_kv"].shape == (2, 8)

    def test_multi_query_kv_shape(self):
        # to_kv projects to 2*dim_head — single-head KV shared across heads
        m = AttentionLR(heads=4, dim_head=8, context_dim=16)
        x = jnp.ones((B, 4, 4, 32))
        v = m.init(jax.random.PRNGKey(0), x, jnp.ones((B, 16, 16)))
        assert v["params"]["to_kv"]["kernel"].shape == (32, 16)  # 2*dim_head


class TestFactory:
    def test_selects_ca_from_use_ca_block(self):
        m = create_denoiser(
            use_ca_block=True, model_channels=32, out_channels=3,
            cond_token_num=1, cond_dim=8, context_dim=16,
            channel_mult=[1, 2], attention_resolutions=[2], num_res_blocks=1,
            num_heads=4, use_fp16=False, legacy=False, transformer_depth=1,
            image_size=16, in_channels=3,
        )
        assert isinstance(m, UNetCAModel)

    def test_selects_concat_otherwise(self):
        m = create_denoiser(
            model_channels=32, out_channels=3, cond_dim=8,
            channel_mult=[1, 2], attention_resolutions=[2], num_res_blocks=1,
            num_heads=4, resblock_updown=True, image_size=16, in_channels=3,
        )
        assert isinstance(m, UNetModel)


class TestEMA:
    def test_warmup_decay(self):
        # min(decay, (1+n)/(10+n)) — parity dynamic/ema.py:30-32
        assert float(ema_decay_schedule(0.9999, jnp.array(1))) == pytest.approx(2 / 11)
        assert float(ema_decay_schedule(0.9999, jnp.array(10 ** 6))) == pytest.approx(0.9999)

    def test_update_moves_toward_params(self):
        ema = {"w": jnp.zeros(3)}
        params = {"w": jnp.ones(3)}
        new = ema_update(ema, params, jnp.array(1), 0.9999)
        d = 2 / 11
        np.testing.assert_allclose(np.asarray(new["w"]), (1 - d) * 1.0, rtol=1e-6)

    def test_matches_torch_litema_sequence(self):
        # run 5 steps against a literal torch-free reimplementation of
        # LitEma's arithmetic (shadow -= (1-d)*(shadow - param))
        ema_j = {"w": jnp.array([0.0])}
        shadow = np.array([0.0])
        param_seq = [1.0, 2.0, -1.0, 0.5, 3.0]
        n = 0
        for p in param_seq:
            n += 1
            d = min(0.9999, (1 + n) / (10 + n))
            shadow = shadow - (1 - d) * (shadow - np.array([p]))
            ema_j = ema_update(ema_j, {"w": jnp.array([p])}, jnp.array(n), 0.9999)
        np.testing.assert_allclose(np.asarray(ema_j["w"]), shadow, rtol=1e-6)


class TestRematPolicies:
    """use_checkpoint ∈ {False, True, 'conv'} must be numerically identical
    (the 'conv' policy saves conv outputs — layers.py 'rb_conv' tags — and
    recomputes only the cheap GN/FiLM/SiLU chains in the backward)."""

    def _loss_and_grad(self, use_checkpoint):
        import jax

        model = UNetModel(
            model_channels=16, out_channels=3, num_res_blocks=1,
            channel_mult=(1, 2), attention_resolutions=(2,), num_heads=2,
            cond_dim=6, resblock_updown=True,
            use_checkpoint=use_checkpoint,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
        t = jnp.array([3, 7])
        cond = jax.random.normal(jax.random.PRNGKey(1), (2, 6))
        params = model.init(jax.random.PRNGKey(2), x, t, cond=cond)["params"]

        def loss(p):
            out = model.apply({"params": p}, x, t, cond=cond)
            return (out ** 2).mean()

        l, g = jax.value_and_grad(loss)(params)
        return float(l), g

    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_conv_policy_matches_no_remat(self):
        import jax

        l0, g0 = self._loss_and_grad(False)
        for ck in ("conv", True):
            l1, g1 = self._loss_and_grad(ck)
            assert l0 == pytest.approx(l1, rel=1e-6)
            for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
