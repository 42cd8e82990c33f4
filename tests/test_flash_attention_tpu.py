"""Flash-attention training path vs the XLA einsum path — TPU-only.

models.layers.SelfAttentionBlock routes training-time attention through
jax's TPU flash kernels (Pallas fwd AND bwd).  This parity check runs only
on real TPU hardware (auto-skipped on the CPU CI mesh); it was last
executed manually on-chip in round 2: fwd max |Δ| 0.0039 (≤1 bf16 ulp),
grad rel 0.6 % — see BASELINE.md.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _on_tpu() -> bool:
    if jax.default_backend() != "tpu":
        return False
    dd = jax.config.jax_default_device
    return dd is None or getattr(dd, "platform", "tpu") == "tpu"


pytestmark = pytest.mark.skipif(not _on_tpu(), reason="needs real TPU")


def test_flash_matches_xla_einsum_fwd_and_grad():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    b, h, n, d = 4, 8, 256, 64
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(k2, (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(k3, (b, h, n, d), jnp.bfloat16)

    def xla_attn(q):
        scale = 1.0 / math.sqrt(math.sqrt(d))
        logits = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k * scale,
                            preferred_element_type=jnp.float32)
        w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
        return jnp.einsum("bhnm,bhmd->bhnd", w, v)

    bs = BlockSizes(
        block_q=n, block_k_major=n, block_k=n, block_b=1,
        block_q_major_dkv=n, block_k_major_dkv=n, block_k_dkv=n,
        block_q_dkv=n, block_k_major_dq=n, block_k_dq=n, block_q_dq=n,
    )

    def flash(q):
        return flash_attention(q, k, v, sm_scale=1.0 / math.sqrt(d),
                               block_sizes=bs)

    of = np.asarray(jax.jit(flash)(q), np.float32)
    ox = np.asarray(jax.jit(xla_attn)(q), np.float32)
    assert np.abs(of - ox).max() < 0.02

    gf = np.asarray(jax.jit(jax.grad(
        lambda q: (flash(q).astype(jnp.float32) ** 2).sum()))(q), np.float32)
    gx = np.asarray(jax.jit(jax.grad(
        lambda q: (xla_attn(q).astype(jnp.float32) ** 2).sum()))(q), np.float32)
    rel = np.abs(gf - gx).max() / max(np.abs(gx).max(), 1e-9)
    assert rel < 0.02
