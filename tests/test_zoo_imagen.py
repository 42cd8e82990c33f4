"""Imagen lucidrains UNet (models/zoo_imagen.py).

Parity target: dynamic/diffusionmodules/unet_imagen_lucidrains_simple.py
(:755-1204) — shape/finite checks, null-token cond-drop semantics, the
per-sample cond_drop_prob vector path, the batch-doubled CFG combine,
and the memory-efficient / cross-embed-downsample / linear-attention
flag coverage.  (The reference copies are dead zoo code and not
importable here — einops_exts absent — so behavioral tests, not
weight transplants.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgdm_tpu.models.zoo_imagen import BaseUnet64, ImagenUNet


def _tiny(**kw):
    cfg = dict(
        dim=16, dim_mults=(1, 2), num_resnet_blocks=1,
        layer_attns=(False, True), layer_cross_attns=(False, True),
        attn_heads=2, attn_dim_head=8, text_embed_dim=12, max_text_len=1,
        resnet_groups=4, attn_pool_num_latents=4, learned_sinu_pos_emb_dim=8,
        cond_dim=16,
    )
    cfg.update(kw)
    return ImagenUNet(**cfg)


@pytest.fixture(scope="module")
def tiny_model_and_vars():
    m = _tiny()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    t = jnp.asarray([3.0, 250.0])
    cond = jnp.asarray(rng.standard_normal((2, 12)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, t, cond)
    return m, v, x, t, cond


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_forward_shape_and_finite(tiny_model_and_vars):
    m, v, x, t, cond = tiny_model_and_vars
    out = m.apply(v, x, t, cond)
    assert out.shape == (2, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_cond_drop_uses_null_tokens(tiny_model_and_vars):
    """drop=1 must ignore the text entirely (null-token swap, :1101-1123)."""
    m, v, x, t, cond = tiny_model_and_vars
    other = cond + 5.0
    a = m.apply(v, x, t, cond, 1.0)
    b = m.apply(v, x, t, other, 1.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    # and drop=0 must NOT ignore it
    c = m.apply(v, x, t, cond, 0.0)
    assert float(jnp.abs(a - c).max()) > 1e-6


def test_per_sample_cond_drop(tiny_model_and_vars):
    """cond_drop_prob as a [B] vector — the CFG driving mode (:1035-1045)."""
    m, v, x, t, cond = tiny_model_and_vars
    mixed = m.apply(v, x, t, cond, jnp.asarray([0.0, 1.0]))
    kept = m.apply(v, x, t, cond, 0.0)
    dropped = m.apply(v, x, t, cond, 1.0)
    np.testing.assert_allclose(np.asarray(mixed[0]), np.asarray(kept[0]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mixed[1]), np.asarray(dropped[1]),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_forward_with_cond_scale_combine(tiny_model_and_vars):
    """(1-s)·ε(z) + s·ε(z,c) from one doubled pass (:1032-1048)."""
    m, v, x, t, cond = tiny_model_and_vars
    s = 2.0
    out = m.apply(v, x, t, s, cond, method=m.forward_with_cond_scale)
    eps_zc = m.apply(v, x, t, cond, 0.0)
    eps_z = m.apply(v, x, t, cond, 1.0)
    want = (1.0 - s) * eps_z + s * eps_zc
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # s in {0, 1} single-pass shortcuts
    np.testing.assert_allclose(
        np.asarray(m.apply(v, x, t, 1, cond, method=m.forward_with_cond_scale)),
        np.asarray(eps_zc), atol=0)
    np.testing.assert_allclose(
        np.asarray(m.apply(v, x, t, 0, cond, method=m.forward_with_cond_scale)),
        np.asarray(eps_z), atol=0)


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_memory_efficient_and_flags():
    """memory_efficient pre-downsample + cross-embed downsample +
    init-conv final residual + linear attention + fixed pos emb
    (:917-928, :955-967, :1004-1012)."""
    m = _tiny(memory_efficient=True, cross_embed_downsample=True,
              init_conv_to_final_conv_residual=True,
              layer_attns=(False, False), use_linear_attn=True,
              use_linear_cross_attn=True, layer_cross_attns=(False, True),
              learned_sinu_pos_emb=False, attn_pool_text=False,
              final_resnet_block=False, channels_out=6)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
    t = jnp.asarray([17.0])
    cond = jnp.asarray(rng.standard_normal((1, 12)), jnp.float32)
    v = m.init(jax.random.PRNGKey(1), x, t, cond)
    out = m.apply(v, x, t, cond)
    assert out.shape == (1, 16, 16, 6)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_multi_token_text_and_rng_drop():
    """max_text_len>1 token sequences + stochastic cond-drop rng."""
    m = _tiny(max_text_len=4)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    t = jnp.asarray([1.0, 2.0])
    cond = jnp.asarray(rng.standard_normal((2, 4, 12)), jnp.float32)
    v = m.init(jax.random.PRNGKey(2), x, t, cond)
    out = m.apply(v, x, t, cond, 0.5,
                  rngs={"cond_drop": jax.random.PRNGKey(3)})
    assert out.shape == (2, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_base_unet64_preset():
    m = BaseUnet64(max_text_len=1, text_embed_dim=2048)
    assert isinstance(m, ImagenUNet)
    assert m.dim == 512 and m.dim_mults == (1, 2, 3, 4)
    assert m.num_resnet_blocks == 3
    assert m.layer_attns == (False, True, True, True)
