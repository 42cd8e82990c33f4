"""XCiT (cross-covariance image transformer) in Flax — SSL backbone.

TPU-native port of the `dino_xcit_medium_24_p8` backbone the reference
pulls from torch.hub (`self_sl/ssl_backbone.py:114-118`, arch list
`:365`; consumed CLS-feature-only via `batch_encode_feat`'s
``"xcit" in arch_name`` branch `:168-170`).  The architecture is the
facebookresearch/xcit ``xcit.py`` network (El-Nouby et al., 2021):

  * ConvPatchEmbed — stacked 3x3/stride-2 conv+BN (+GELU between), 3
    stages for patch 8, 4 for patch 16,
  * fixed 2-D sine/cosine positional encoding projected by a 1x1 conv
    (PositionalEncodingFourier),
  * XCA blocks: cross-covariance attention (l2-normalized q/k over the
    TOKEN axis, a d×d per-head attention with a learnable temperature)
    + LPI (two depthwise 3x3 convs over the token grid with a BN between)
    + MLP, each residual branch scaled by a LayerScale gamma,
  * two CaiT-style class-attention blocks after the CLS token is
    appended, then LayerNorm and the CLS feature.

BatchNorms are inference-only and folded into per-channel scale/bias at
weight-load time (`FrozenBN`, same pattern as `models/resnet.py:ConvBN`);
at random init they are the identity.  LayerNorm/softmax/l2-norm run in
float32 islands like `models/vit.py` regardless of ``dtype``.

The two implementation quirks of the upstream class-attention block are
reproduced faithfully (they are part of the published checkpoints'
semantics): (1) ClassAttention returns ``cat(cls', norm1(x)[1:])`` so the
gamma1-scaled residual adds a copy of the NORMED patch tokens, and
(2) the final residual re-adds the untouched patch tokens, doubling them.
Only the CLS path is consumed downstream either way.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .vit import Mlp

__all__ = ["XCiT", "xcit_medium_24_p8", "load_xcit_torch_weights"]


class FrozenBN(nn.Module):
    """Inference BatchNorm folded to y = x * scale + bias (per channel)."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class ConvPatchEmbed(nn.Module):
    """xcit.py ConvPatchEmbed: 3x3/s2 conv+BN stack (GELU between)."""

    patch_size: int
    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.patch_size == 16:
            dims = [self.embed_dim // 8, self.embed_dim // 4,
                    self.embed_dim // 2, self.embed_dim]
        elif self.patch_size == 8:
            dims = [self.embed_dim // 4, self.embed_dim // 2, self.embed_dim]
        else:
            raise ValueError(f"xcit patch_size must be 8/16, got {self.patch_size}")
        for i, d in enumerate(dims):
            x = nn.Conv(d, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype, name=f"conv{i}")(x)
            x = FrozenBN(d, name=f"bn{i}")(x)
            if i < len(dims) - 1:
                x = nn.gelu(x, approximate=False)
        return x  # [B, Hp, Wp, C]


def _fourier_pos(hp: int, wp: int, hidden: int = 32,
                 temperature: float = 10000.0) -> jax.Array:
    """PositionalEncodingFourier's pre-projection table [1, hp, wp, 2*hidden]
    (cumsum-of-ones positions normalized by the LAST row/col + eps, then
    interleaved sin/cos; y-features first)."""
    eps, scale = 1e-6, 2 * math.pi
    ys = jnp.arange(1, hp + 1, dtype=jnp.float32) / (hp + eps) * scale
    xs = jnp.arange(1, wp + 1, dtype=jnp.float32) / (wp + eps) * scale
    y_grid = jnp.broadcast_to(ys[:, None], (hp, wp))
    x_grid = jnp.broadcast_to(xs[None, :], (hp, wp))
    dim_t = jnp.arange(hidden, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / hidden)

    def interleave(pos):
        pos = pos[..., None] / dim_t  # [hp, wp, hidden]
        return jnp.stack(
            [jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])], axis=-1
        ).reshape(hp, wp, hidden)

    return jnp.concatenate([interleave(y_grid), interleave(x_grid)], -1)[None]


class XCA(nn.Module):
    """Cross-covariance attention: d×d per-head attention over features,
    q/k l2-normalized along the token axis, learnable temperature."""

    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        h = self.num_heads
        d = c // h
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, d).transpose(2, 0, 3, 4, 1)  # [3,b,h,d,n]
        q, k, v = qkv[0], qkv[1], qkv[2]

        def l2norm(t):  # F.normalize(dim=-1): x / max(||x||, 1e-12), f32
            t32 = t.astype(jnp.float32)
            nrm = jnp.sqrt(jnp.sum(t32 * t32, axis=-1, keepdims=True))
            return (t32 / jnp.maximum(nrm, 1e-12)).astype(t.dtype)

        temp = self.param("temperature", nn.initializers.ones, (h, 1, 1))
        attn = jnp.einsum("bhdn,bhen->bhde", l2norm(q), l2norm(k),
                          preferred_element_type=jnp.float32)
        attn = attn * temp.astype(jnp.float32)
        attn = jax.nn.softmax(attn, -1).astype(x.dtype)
        out = jnp.einsum("bhde,bhen->bhdn", attn, v)
        out = out.transpose(0, 3, 1, 2).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class LPI(nn.Module):
    """Local patch interaction: depthwise 3x3 → GELU → BN → depthwise 3x3
    over the token grid (xcit.py LPI)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw):
        b, n, c = x.shape
        h, w = hw
        y = x.reshape(b, h, w, c)
        y = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)], feature_group_count=c,
                    dtype=self.dtype, name="conv1")(y)
        y = nn.gelu(y, approximate=False)
        y = FrozenBN(c, name="bn")(y)
        y = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)], feature_group_count=c,
                    dtype=self.dtype, name="conv2")(y)
        return y.reshape(b, n, c)


def _eta_init(eta: float):
    return lambda key, shape: jnp.full(shape, eta, dtype=jnp.float32)


class XCABlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    eta: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw):
        c = x.shape[-1]
        g1 = self.param("gamma1", _eta_init(self.eta), (c,))
        g2 = self.param("gamma2", _eta_init(self.eta), (c,))
        g3 = self.param("gamma3", _eta_init(self.eta), (c,))
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        x = x + g1.astype(x.dtype) * XCA(self.num_heads, self.dtype, name="attn")(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm3")(x)
        x = x + g3.astype(x.dtype) * LPI(self.dtype, name="lpi")(y, hw)
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        x = x + g2.astype(x.dtype) * Mlp(
            int(c * self.mlp_ratio), c, self.dtype, name="mlp")(y)
        return x


class ClassAttn(nn.Module):
    """CaiT-style class attention (xcit.py ClassAttention): only the CLS
    query attends; returns cat(cls', x[:, 1:]) like the upstream module."""

    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_attn: bool = False):
        b, n, c = x.shape
        h = self.num_heads
        d = c // h
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, d).transpose(2, 0, 3, 1, 4)  # [3,b,h,n,d]
        q, k, v = qkv[0], qkv[1], qkv[2]
        qc = q[:, :, :1]  # CLS query [b,h,1,d]
        attn = jnp.sum(qc * k, -1).astype(jnp.float32) * (d ** -0.5)  # [b,h,n]
        attn = jax.nn.softmax(attn, -1)
        cls = jnp.einsum("bhn,bhnd->bhd", attn.astype(x.dtype), v)
        cls = cls.reshape(b, 1, c)
        cls = nn.Dense(c, dtype=self.dtype, name="proj")(cls)
        out = jnp.concatenate([cls, x[:, 1:]], axis=1)
        return (out, attn) if return_attn else (out, None)


class ClassAttentionBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    eta: float = 1.0
    tokens_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_attn: bool = False):
        c = x.shape[-1]
        g1 = self.param("gamma1", _eta_init(self.eta), (c,))
        g2 = self.param("gamma2", _eta_init(self.eta), (c,))
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        y, attn = ClassAttn(self.num_heads, self.dtype, name="attn")(
            y, return_attn)
        # upstream quirk (1): the residual branch is the FULL ClassAttention
        # output — updated CLS plus the norm1'd patch tokens
        x = x + g1.astype(x.dtype) * y
        norm2 = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")
        if self.tokens_norm:
            x = norm2(x).astype(x.dtype)
        else:
            x = jnp.concatenate(
                [norm2(x[:, :1]).astype(x.dtype), x[:, 1:]], axis=1)
        x_res = x
        cls = g2.astype(x.dtype) * Mlp(
            int(c * self.mlp_ratio), c, self.dtype, name="mlp")(x[:, :1])
        # upstream quirk (2): the second residual adds cat(mlp(cls), patches)
        # onto x_res, so patch tokens come out doubled
        x = x_res + jnp.concatenate([cls, x[:, 1:]], axis=1)
        return x, attn


class XCiT(nn.Module):
    """`out=` contract matches models/vit.py VisionTransformer so
    `selfsup.ssl_backbone.SSLBackbone` drives it unmodified:
    "cls" → [B, C]; "tokens" → post-norm [B, 1+N, C] (CLS first);
    "attn_last" → the last class-attention block's CLS attention as
    [B, heads, 1, 1+N] (so `attn[:, :, 0, 1:]` is CLS→patch weight)."""

    patch_size: int = 8
    embed_dim: int = 512
    depth: int = 24
    num_heads: int = 8
    mlp_ratio: float = 4.0
    cls_attn_layers: int = 2
    eta: float = 1e-5
    tokens_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, out: str = "cls"):
        b = x.shape[0]
        y = ConvPatchEmbed(self.patch_size, self.embed_dim, self.dtype,
                           name="patch_embed")(x.astype(self.dtype))
        hp, wp = y.shape[1], y.shape[2]
        tokens = y.reshape(b, hp * wp, self.embed_dim)
        pos = _fourier_pos(hp, wp)  # [1, hp, wp, 64]
        pos = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype,
                      name="pos_proj")(pos.astype(self.dtype))
        tokens = tokens + pos.reshape(1, hp * wp, self.embed_dim)
        for i in range(self.depth):
            tokens = XCABlock(self.num_heads, self.mlp_ratio, self.eta,
                              self.dtype, name=f"block{i}")(tokens, (hp, wp))
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.embed_dim))
        z = jnp.concatenate(
            [jnp.tile(cls.astype(tokens.dtype), (b, 1, 1)), tokens], axis=1)
        attn_last = None
        for i in range(self.cls_attn_layers):
            want_attn = out == "attn_last" and i == self.cls_attn_layers - 1
            z, a = ClassAttentionBlock(
                self.num_heads, self.mlp_ratio, self.eta, self.tokens_norm,
                self.dtype, name=f"cls_block{i}")(z, return_attn=want_attn)
            if a is not None:
                attn_last = a
        z = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         name="norm")(z).astype(jnp.float32)
        if out == "cls":
            return z[:, 0]
        if out == "tokens":
            return z
        if out == "attn_last":
            return attn_last[:, :, None, :]  # [B, h, 1, 1+N]
        raise ValueError(f"unknown out={out!r}")


def xcit_medium_24_p8(dtype=jnp.float32) -> XCiT:
    """dino_xcit_medium_24_p8 (ssl_backbone.py:114-118): 512d/8h/24L/p8,
    LayerScale eta 1e-5, tokens_norm."""
    return XCiT(patch_size=8, embed_dim=512, depth=24, num_heads=8,
                eta=1e-5, tokens_norm=True, dtype=dtype)


def load_xcit_torch_weights(path: str, eps: float = 1e-5) -> dict:
    """facebookresearch/xcit state dict → XCiT params (BN folded).

    Handles both the official attribute spelling (`pos_embeder`) and
    timm's (`pos_embed`); conv OIHW→HWIO, depthwise [C,1,3,3]→[3,3,1,C],
    linear [out,in]→[in,out]."""
    import numpy as np
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
    sd = {k: v for k, v in sd.items() if not k.startswith("head.")}

    def t(key):
        return np.asarray(sd[key].numpy())

    def lin(prefix):
        return {"kernel": jnp.asarray(t(f"{prefix}.weight").T),
                "bias": jnp.asarray(t(f"{prefix}.bias"))}

    def conv(prefix, bias=True):
        out = {"kernel": jnp.asarray(t(f"{prefix}.weight").transpose(2, 3, 1, 0))}
        if bias:
            out["bias"] = jnp.asarray(t(f"{prefix}.bias"))
        return out

    def bn(prefix):
        gamma, beta = t(f"{prefix}.weight"), t(f"{prefix}.bias")
        mean, var = t(f"{prefix}.running_mean"), t(f"{prefix}.running_var")
        scale = gamma / np.sqrt(var + eps)
        return {"scale": jnp.asarray(scale),
                "bias": jnp.asarray(beta - mean * scale)}

    def ln(prefix):
        return {"scale": jnp.asarray(t(f"{prefix}.weight")),
                "bias": jnp.asarray(t(f"{prefix}.bias"))}

    n_stages = 4 if "patch_embed.proj.6.0.weight" in sd else 3
    patch = {}
    for i in range(n_stages):
        patch[f"conv{i}"] = conv(f"patch_embed.proj.{2 * i}.0", bias=False)
        patch[f"bn{i}"] = bn(f"patch_embed.proj.{2 * i}.1")

    pos_key = ("pos_embeder.token_projection"
               if "pos_embeder.token_projection.weight" in sd
               else "pos_embed.token_projection")
    params: dict = {
        "patch_embed": patch,
        "pos_proj": conv(pos_key),
        "cls_token": jnp.asarray(t("cls_token")),
        "norm": ln("norm"),
    }
    depth = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("blocks."))
    for i in range(depth):
        p = f"blocks.{i}"
        params[f"block{i}"] = {
            "gamma1": jnp.asarray(t(f"{p}.gamma1")),
            "gamma2": jnp.asarray(t(f"{p}.gamma2")),
            "gamma3": jnp.asarray(t(f"{p}.gamma3")),
            "norm1": ln(f"{p}.norm1"),
            "norm2": ln(f"{p}.norm2"),
            "norm3": ln(f"{p}.norm3"),
            "attn": {"qkv": lin(f"{p}.attn.qkv"),
                     "proj": lin(f"{p}.attn.proj"),
                     "temperature": jnp.asarray(t(f"{p}.attn.temperature"))},
            "lpi": {"conv1": conv(f"{p}.local_mp.conv1"),
                    "bn": bn(f"{p}.local_mp.bn"),
                    "conv2": conv(f"{p}.local_mp.conv2")},
            "mlp": {"fc1": lin(f"{p}.mlp.fc1"), "fc2": lin(f"{p}.mlp.fc2")},
        }
    n_cls = 1 + max(int(k.split(".")[1]) for k in sd
                    if k.startswith("cls_attn_blocks."))
    for i in range(n_cls):
        p = f"cls_attn_blocks.{i}"
        params[f"cls_block{i}"] = {
            "gamma1": jnp.asarray(t(f"{p}.gamma1")),
            "gamma2": jnp.asarray(t(f"{p}.gamma2")),
            "norm1": ln(f"{p}.norm1"),
            "norm2": ln(f"{p}.norm2"),
            "attn": {"qkv": lin(f"{p}.attn.qkv"),
                     "proj": lin(f"{p}.attn.proj")},
            "mlp": {"fc1": lin(f"{p}.mlp.fc1"), "fc2": lin(f"{p}.mlp.fc2")},
        }
    return params
