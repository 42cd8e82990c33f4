"""Pallas kernel correctness vs XLA references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgdm_tpu.ops.pallas.attention import (
    fused_null_kv_attention,
    fused_self_attention,
)
from sgdm_tpu.ops.pallas.groupnorm import _reference, fused_groupnorm_silu


class TestSelfAttention:
    def test_matches_xla(self):
        rng = jax.random.PRNGKey(0)
        b, h, n, d = 2, 4, 64, 32
        q, k, v = jax.random.normal(rng, (3, b, h, n, d))
        out = fused_self_attention(q, k, v, True)
        scale = 1.0 / d ** 0.25
        logits = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k * scale)
        w = jax.nn.softmax(logits, -1)
        gold = jnp.einsum("bhnm,bhmd->bhnd", w, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(gold),
                                   rtol=2e-5, atol=2e-5)

    def test_grad_flows(self):
        rng = jax.random.PRNGKey(1)
        b, h, n, d = 1, 2, 16, 8
        q, k, v = jax.random.normal(rng, (3, b, h, n, d))

        def loss(q, k, v):
            return (fused_self_attention(q, k, v, True) ** 2).sum()

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        # compare to pure-XLA grads
        scale = 1.0 / d ** 0.25

        def loss_ref(q, k, v):
            logits = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k * scale)
            w = jax.nn.softmax(logits, -1)
            return (jnp.einsum("bhnm,bhmd->bhnd", w, v) ** 2).sum()

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-4)


class TestNullKVAttention:
    def test_matches_xla(self):
        rng = jax.random.PRNGKey(2)
        b, n, h, d, m = 2, 64, 4, 16, 64 + 17
        q = jax.random.normal(rng, (b, n, h, d)) * (d ** -0.5)
        kk = jax.random.normal(jax.random.PRNGKey(3), (b, m, d))
        vv = jax.random.normal(jax.random.PRNGKey(4), (b, m, d))
        out = fused_null_kv_attention(q, kk, vv, True)
        sim = jnp.einsum("bnhd,bjd->bhnj", q, kk)
        w = jax.nn.softmax(sim, -1)
        gold = jnp.einsum("bhnj,bjd->bnhd", w, vv)
        np.testing.assert_allclose(np.asarray(out), np.asarray(gold),
                                   rtol=2e-5, atol=2e-5)


class TestGroupNormSiLU:
    @pytest.mark.parametrize("with_film", [False, True])
    def test_matches_reference(self, with_film):
        rng = jax.random.PRNGKey(5)
        b, hh, ww, c = 2, 8, 8, 64
        x = jax.random.normal(rng, (b, hh, ww, c))
        gamma = jax.random.normal(jax.random.PRNGKey(6), (c,)) * 0.1 + 1
        beta = jax.random.normal(jax.random.PRNGKey(7), (c,)) * 0.1
        fs = jax.random.normal(jax.random.PRNGKey(8), (b, c)) * 0.1 if with_film else None
        fsh = jax.random.normal(jax.random.PRNGKey(9), (b, c)) * 0.1 if with_film else None
        out = fused_groupnorm_silu(x, gamma, beta, fs, fsh, 32, 1e-5, True)
        gold = _reference(x, gamma, beta, fs, fsh, 32, 1e-5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(gold),
                                   rtol=2e-5, atol=2e-5)

    def test_grad_matches_reference(self):
        rng = jax.random.PRNGKey(10)
        b, hh, ww, c = 1, 4, 4, 32
        x = jax.random.normal(rng, (b, hh, ww, c))
        gamma = jnp.ones((c,))
        beta = jnp.zeros((c,))

        g1 = jax.grad(
            lambda x: (fused_groupnorm_silu(x, gamma, beta, None, None, 32,
                                            1e-5, True) ** 2).sum()
        )(x)
        g2 = jax.grad(
            lambda x: (_reference(x, gamma, beta, None, None, 32, 1e-5) ** 2).sum()
        )(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-4)
