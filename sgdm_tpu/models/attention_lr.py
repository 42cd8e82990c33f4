"""Imagen-style attention with learned null KV (classifier-free-friendly).

TPU-native rewrite of `dynamic/crossattetion_lr.py` (lucidrains-Imagen
lineage):

  * `AttentionLR` (:50-142): pixel tokens are queries; keys/values are
    SINGLE-head (multi-query attention — to_kv projects to one dim_head) and
    shared across heads; the KV sequence is
    [learned null-KV ‖ projected context tokens ‖ self-KV]; the learned
    null-KV is what lets classifier-free guidance "attend to nothing";
    gamma-only LayerNorm sandwich with residual.
  * `CrossAttentionLR` (:144-208): full multi-head cross-attention where the
    queries are appended to K and V (Imagen D.3.1) plus a null-KV slot.

Layout: NHWC in/out.  Softmax in float32 (parity with reference :130 /
:203 softmax dtype).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from flax import linen as nn

__all__ = ["AttentionLR", "CrossAttentionLR", "GammaLayerNorm"]


class GammaLayerNorm(nn.Module):
    """LayerNorm with learned scale and fixed zero bias.

    Parity: crossattetion_lr.py:35-42 (gamma Parameter, beta buffer).
    """

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig = x.dtype
        x32 = x.astype(jnp.float32)
        mean = x32.mean(-1, keepdims=True)
        var = x32.var(-1, keepdims=True)
        gamma = self.param("gamma", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        out = (x32 - mean) * jax.lax.rsqrt(var + 1e-5) * gamma
        return out.astype(orig)


class AttentionLR(nn.Module):
    """Self-attention over pixels with null-KV + context-KV (multi-query)."""

    heads: int = 8
    dim_head: int = 64
    context_dim: int | None = None
    use_pallas: bool | str = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array | None = None) -> jax.Array:
        b, hh, ww, c = x.shape
        n = hh * ww
        inner = self.heads * self.dim_head
        x_seq = x.reshape(b, n, c)
        x_normed = GammaLayerNorm(name="norm")(x_seq)

        q = checkpoint_name(nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x_normed), "rb_conv")
        kv = checkpoint_name(nn.Dense(2 * self.dim_head, use_bias=False, dtype=self.dtype, name="to_kv")(x_normed), "rb_conv")
        k, v = jnp.split(kv, 2, axis=-1)  # [b, n, d] single-head

        q = q.reshape(b, n, self.heads, self.dim_head)
        scale = self.dim_head ** -0.5
        q = q * scale

        null_kv = self.param(
            "null_kv", nn.initializers.normal(1.0), (2, self.dim_head), jnp.float32
        ).astype(k.dtype)
        nk = jnp.broadcast_to(null_kv[0], (b, 1, self.dim_head))
        nv = jnp.broadcast_to(null_kv[1], (b, 1, self.dim_head))
        k = jnp.concatenate([nk, k], axis=1)
        v = jnp.concatenate([nv, v], axis=1)

        if context is not None:
            assert self.context_dim is not None
            ctx = nn.LayerNorm(dtype=jnp.float32, name="context_norm")(context)
            ckv = nn.Dense(2 * self.dim_head, dtype=self.dtype, name="to_context")(ctx)
            ck, cv = jnp.split(ckv, 2, axis=-1)
            k = jnp.concatenate([ck.astype(k.dtype), k], axis=1)
            v = jnp.concatenate([cv.astype(v.dtype), v], axis=1)

        # single-head K shared across query heads (multi-query attention)
        from .layers import _pallas_ok

        if _pallas_ok(self.use_pallas is True):
            from ..ops.pallas.attention import fused_null_kv_attention

            out = fused_null_kv_attention(q, k, v).reshape(b, n, inner)
        else:
            sim = jnp.einsum(
                "bnhd,bjd->bhnj", q, k, preferred_element_type=jnp.float32
            )
            attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(x.dtype)
            out = jnp.einsum("bhnj,bjd->bnhd", attn, v).reshape(b, n, inner)

        out = checkpoint_name(nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_out")(out), "rb_conv")
        out = GammaLayerNorm(name="out_norm")(out)
        return (x_seq + out).reshape(b, hh, ww, c)


class CrossAttentionLR(nn.Module):
    """Full multi-head cross-attention with null-KV and q appended to KV."""

    heads: int = 8
    dim_head: int = 64
    context_dim: int | None = None
    norm_context: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        n = hh * ww
        inner = self.heads * self.dim_head
        x_seq = x.reshape(b, n, c)
        x_normed = GammaLayerNorm(name="norm")(x_seq)
        if self.norm_context:
            context = GammaLayerNorm(name="context_norm")(context)

        q = checkpoint_name(nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x_normed), "rb_conv")
        kv = checkpoint_name(nn.Dense(2 * inner, use_bias=False, dtype=self.dtype, name="to_kv")(context), "rb_conv")
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_split(t):
            return t.reshape(b, -1, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads_split(q), heads_split(k), heads_split(v)

        null_kv = self.param(
            "null_kv", nn.initializers.normal(1.0), (2, self.dim_head), jnp.float32
        ).astype(k.dtype)
        nk = jnp.broadcast_to(null_kv[0], (b, self.heads, 1, self.dim_head))
        nv = jnp.broadcast_to(null_kv[1], (b, self.heads, 1, self.dim_head))
        # Imagen D.3.1: append queries to keys/values too (crossattetion_lr.py:189-190)
        k = jnp.concatenate([nk, k, q], axis=2)
        v = jnp.concatenate([nv, v, q], axis=2)

        q = q * (self.dim_head ** -0.5)
        sim = jnp.einsum("bhnd,bhjd->bhnj", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnj,bhjd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)

        out = checkpoint_name(nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_out")(out), "rb_conv")
        out = GammaLayerNorm(name="out_norm")(out)
        return (x_seq + out).reshape(b, hh, ww, c)
