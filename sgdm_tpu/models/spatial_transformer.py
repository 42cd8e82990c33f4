"""LDM SpatialTransformer (cross-attention transformer over pixels).

TPU-native rewrite of `dynamic/attention.py:153-271` (CrossAttention +
BasicTransformerBlock + SpatialTransformer) — used by the reference only
when `use_spatial_transformer=True` (off in every shipped preset, SURVEY.md
§2.4), ported for config parity: GEGLU feed-forward, self-attn → cross-attn
→ FF blocks with pre-LN, 1x1 conv in/out with zero-init output projection.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["CrossAttention", "BasicTransformerBlock", "SpatialTransformer"]


class GEGLU(nn.Module):
    dim_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # exact erf gelu: torch F.gelu default (dynamic/attention.py GEGLU);
        # flax's tanh approximation would drift ~1e-3/activation vs ported
        # reference weights (vit.py Mlp makes the same choice)
        return h * nn.gelu(gate, approximate=False)


class CrossAttention(nn.Module):
    heads: int = 8
    dim_head: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        b, n, _ = x.shape
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)

        def split(t):
            return t.reshape(b, -1, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        sim = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                         preferred_element_type=jnp.float32) * self.dim_head ** -0.5
        attn = jax.nn.softmax(sim.astype(jnp.float32), -1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


class BasicTransformerBlock(nn.Module):
    heads: int
    dim_head: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        x = x + CrossAttention(self.heads, self.dim_head, self.dtype,
                               name="attn1")(nn.LayerNorm(name="norm1")(x))
        x = x + CrossAttention(self.heads, self.dim_head, self.dtype,
                               name="attn2")(nn.LayerNorm(name="norm2")(x),
                                             context)
        h = nn.LayerNorm(name="norm3")(x)
        h = GEGLU(x.shape[-1] * 4, self.dtype, name="ff_geglu")(h)
        x = x + nn.Dense(x.shape[-1], dtype=self.dtype, name="ff_out")(h)
        return x


class SpatialTransformer(nn.Module):
    heads: int = 8
    dim_head: int = 64
    depth: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        b, hh, ww, c = x.shape
        from .layers import GroupNorm32, zeros_init

        h = GroupNorm32(name="norm")(x)
        h = nn.Conv(self.heads * self.dim_head, (1, 1), dtype=self.dtype,
                    name="proj_in")(h)
        h = h.reshape(b, hh * ww, -1)
        for i in range(self.depth):
            h = BasicTransformerBlock(self.heads, self.dim_head, self.dtype,
                                      name=f"block_{i}")(h, context)
        h = h.reshape(b, hh, ww, -1)
        h = nn.Conv(c, (1, 1), dtype=self.dtype, kernel_init=zeros_init,
                    name="proj_out")(h)
        return x + h
