"""Imagen (lucidrains) UNet — TPU-native NHWC Flax rewrite.

Covers the reference's two vendored copies of the lucidrains
imagen-pytorch UNet, which differ only in comments:

  * dynamic/diffusionmodules/unet_imagen_lucidrains_simple.py:755-1204
  * dynamic/diffusionmodules/unet_imagen_lucidrains_origin.py:767-1199

(zoo breadth — no shipped reference config instantiates them; SURVEY
§2.4 "unused model zoo").  One Flax module covers both; `BaseUnet64`
reproduces the paper-appendix preset (`..._simple.py:1192-1204`).

Architecture notes (file:line cites are into `..._simple.py`):

  * CrossEmbedLayer init conv — parallel convs at kernel sizes
    (3, 7, 15), channel split dim/2, dim/4, rest (:728-753).
  * Time conditioning: learned-sinusoidal (crowsonkb) or fixed pos emb
    → time hiddens → (a) `num_time_tokens` sequence tokens and (b) a
    FiLM time vector (:843-858).
  * Text conditioning: Linear to cond_dim, per-sample classifier-free
    null-token swap, PerceiverResampler attention pooling with
    mean-pooled extra latents (:152-259), plus a non-attention pooled
    path summed into the time vector (:889-897, :1110-1125).
  * ResnetBlock = GN→SiLU→conv ×2 with FiLM(scale+1, shift) on block2
    only, optional token cross-attention between the blocks, and a
    GlobalContext (attention-style squeeze-excite) output gate
    (:385-471, :643-668).
  * TransformerBlock = full self-attention with one shared k/v head +
    null kv + optional context concat, then a channel feed-forward
    (:263-340, :690-707); linear-attention variant for high-res
    levels (:575-641, :709-726).
  * Skip connections are scaled by 2^-0.5 (:928) and consumed twice
    per level (one per resnet block plus the attn output, :1150-1175).

Layout: NHWC throughout (channel-last is the TPU-native layout — convs
tile onto the MXU without transposes); token attention runs on
[B, H·W, C] reshapes.  Weight-for-weight transplant is NOT a goal here
(the reference copies are dead code and not even importable in this
image — `einops_exts` absent); behavioral parity is covered by shape /
FiLM / CFG / null-token tests in tests/test_zoo_imagen.py.

No masks: the reference's diffusion path always calls with mask=None
(text masks belong to the upstream imagen trainer, not this repo).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ImagenUNet", "BaseUnet64"]


def _cast_tuple(v, length: int) -> tuple:
    if isinstance(v, (tuple, list)):
        assert len(v) == length
        return tuple(v)
    return (v,) * length


class _GammaLN(nn.Module):
    """The file's custom scale-only LayerNorm (:105-124).

    ChanLayerNorm collapses to the same op in NHWC (channels last).
    """

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5, use_bias=False, name="ln")(x)


def _ln(name: str) -> nn.Module:
    """torch nn.LayerNorm (scale + bias), eps 1e-5."""
    return nn.LayerNorm(epsilon=1e-5, name=name)


def _gelu(x):
    return nn.gelu(x, approximate=False)


class _FeedForward(nn.Module):
    """LN → Dense → GELU → LN → Dense, bias-free (:670-688).

    ChanFeedForward is identical in NHWC (1×1 conv ≡ Dense on the
    channel axis).
    """

    dim: int
    mult: float = 2.0

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.mult)
        x = _GammaLN(name="norm_in")(x)
        x = nn.Dense(hidden, use_bias=False, name="proj_in")(x)
        x = _gelu(x)
        x = _GammaLN(name="norm_mid")(x)
        return nn.Dense(self.dim, use_bias=False, name="proj_out")(x)


class _PerceiverAttention(nn.Module):
    """Perceiver cross-attention: latents query [x ‖ latents] (:152-206)."""

    dim: int
    dim_head: int = 64
    heads: int = 8

    @nn.compact
    def __call__(self, x, latents):
        inner = self.dim_head * self.heads
        x = _ln("norm")(x)
        latents = _ln("norm_latents")(latents)
        q = nn.Dense(inner, use_bias=False, name="to_q")(latents)
        kv_in = jnp.concatenate([x, latents], axis=-2)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        sim = jnp.einsum("bhid,bhjd->bhij", q * self.dim_head ** -0.5, k)
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], -1, inner)
        out = nn.Dense(self.dim, use_bias=False, name="to_out")(out)
        return _ln("out_norm")(out)


class _PerceiverResampler(nn.Module):
    """Attention pooling of text tokens to a fixed latent count (:208-259)."""

    dim: int
    depth: int = 2
    dim_head: int = 64
    heads: int = 8
    num_latents: int = 32
    num_latents_mean_pooled: int = 4
    max_seq_len: int = 512
    ff_mult: float = 4.0

    @nn.compact
    def __call__(self, x):
        b, n, _ = x.shape
        pos = self.param("pos_emb", nn.initializers.normal(1.0),
                         (self.max_seq_len, self.dim))
        x_pos = x + pos[:n]
        lat = self.param("latents", nn.initializers.normal(1.0),
                         (self.num_latents, self.dim))
        latents = jnp.broadcast_to(lat, (b,) + lat.shape)
        if self.num_latents_mean_pooled > 0:
            pooled = _GammaLN(name="mean_norm")(x.mean(axis=1))
            pooled = nn.Dense(self.dim * self.num_latents_mean_pooled,
                              name="mean_to_latents")(pooled)
            pooled = pooled.reshape(b, self.num_latents_mean_pooled, self.dim)
            latents = jnp.concatenate([pooled, latents], axis=-2)
        for i in range(self.depth):
            latents = _PerceiverAttention(
                dim=self.dim, dim_head=self.dim_head, heads=self.heads,
                name=f"attn_{i}")(x_pos, latents) + latents
            latents = _FeedForward(dim=self.dim, mult=self.ff_mult,
                                   name=f"ff_{i}")(latents) + latents
        return latents


class _Attention(nn.Module):
    """Global self-attention with ONE shared kv head + null kv (:263-340)."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    context_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, context=None):
        b = x.shape[0]
        inner = self.dim_head * self.heads
        x = _GammaLN(name="norm")(x)
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        kv = nn.Dense(self.dim_head * 2, use_bias=False, name="to_kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(b, -1, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        q = q * self.dim_head ** -0.5

        null_kv = self.param("null_kv", nn.initializers.normal(1.0),
                             (2, self.dim_head))
        nk = jnp.broadcast_to(null_kv[0], (b, 1, self.dim_head)).astype(k.dtype)
        nv = jnp.broadcast_to(null_kv[1], (b, 1, self.dim_head)).astype(v.dtype)
        k = jnp.concatenate([nk, k], axis=-2)
        v = jnp.concatenate([nv, v], axis=-2)

        if context is not None:
            assert self.context_dim is not None
            c = _ln("context_norm")(context)
            c = nn.Dense(self.dim_head * 2, name="to_context")(c)
            ck, cv = jnp.split(c, 2, axis=-1)
            k = jnp.concatenate([ck, k], axis=-2)
            v = jnp.concatenate([cv, v], axis=-2)

        sim = jnp.einsum("bhid,bjd->bhij", q, k)
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, inner)
        out = nn.Dense(self.dim, use_bias=False, name="to_out")(out)
        return _GammaLN(name="out_norm")(out)


class _CrossAttention(nn.Module):
    """Per-head token cross-attention with null kv (:473-533); the
    `linear` variant is the softmax-factorized form (:535-573)."""

    dim: int
    context_dim: int
    dim_head: int = 64
    heads: int = 8
    linear: bool = False

    @nn.compact
    def __call__(self, x, context):
        b, n, _ = x.shape
        inner = self.dim_head * self.heads
        x = _GammaLN(name="norm")(x)
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads(t):
            return t.reshape(b, -1, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        null_kv = self.param("null_kv", nn.initializers.normal(1.0),
                             (2, self.dim_head))
        nk = jnp.broadcast_to(null_kv[0], (b, self.heads, 1, self.dim_head))
        nv = jnp.broadcast_to(null_kv[1], (b, self.heads, 1, self.dim_head))
        k = jnp.concatenate([nk.astype(k.dtype), k], axis=-2)
        v = jnp.concatenate([nv.astype(v.dtype), v], axis=-2)

        if self.linear:
            q = jax.nn.softmax(q, axis=-1) * self.dim_head ** -0.5
            k = jax.nn.softmax(k, axis=-2)
            ctx = jnp.einsum("bhnd,bhne->bhde", k, v)
            out = jnp.einsum("bhnd,bhde->bhne", q, ctx)
        else:
            sim = jnp.einsum("bhid,bhjd->bhij", q * self.dim_head ** -0.5, k)
            attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1)
            out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, use_bias=False, name="to_out")(out)
        return _GammaLN(name="out_norm")(out)


class _LinearAttention(nn.Module):
    """Conv-projected factorized linear attention (:575-641)."""

    dim: int
    dim_head: int = 32
    heads: int = 8
    dropout: float = 0.05
    context_dim: Optional[int] = None

    @nn.compact
    def __call__(self, fmap, context=None, train: bool = False):
        b, hh, ww, _ = fmap.shape
        inner = self.dim_head * self.heads
        fmap = _GammaLN(name="norm")(fmap)

        def proj(name):
            y = nn.Dropout(self.dropout, deterministic=not train)(fmap)
            y = nn.Conv(inner, (1, 1), use_bias=False, name=f"{name}_proj")(y)
            return nn.Conv(inner, (3, 3), padding=1, use_bias=False,
                           feature_group_count=inner, name=f"{name}_dw")(y)

        q, k, v = proj("to_q"), proj("to_k"), proj("to_v")

        def tokens(t):  # 'b x y (h c) -> b h (x y) c'
            return t.reshape(b, hh * ww, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = tokens(q), tokens(k), tokens(v)
        if context is not None:
            assert self.context_dim is not None
            c = _ln("context_norm")(context)
            c = nn.Dense(inner * 2, use_bias=False, name="to_context")(c)
            ck, cv = jnp.split(c, 2, axis=-1)
            ck = ck.reshape(b, -1, self.heads, self.dim_head).transpose(0, 2, 1, 3)
            cv = cv.reshape(b, -1, self.heads, self.dim_head).transpose(0, 2, 1, 3)
            k = jnp.concatenate([k, ck], axis=-2)
            v = jnp.concatenate([v, cv], axis=-2)
        q = jax.nn.softmax(q, axis=-1) * self.dim_head ** -0.5
        k = jax.nn.softmax(k, axis=-2)
        ctx = jnp.einsum("bhnd,bhne->bhde", k, v)
        out = jnp.einsum("bhnd,bhde->bhne", q, ctx)
        out = out.transpose(0, 2, 1, 3).reshape(b, hh, ww, inner)
        out = nn.silu(out)
        out = nn.Conv(self.dim, (1, 1), use_bias=False, name="to_out")(out)
        return _GammaLN(name="out_norm")(out)


class _GlobalContext(nn.Module):
    """Attention-style squeeze-excite output gate (:643-668)."""

    dim_out: int

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        ctx = nn.Conv(1, (1, 1), name="to_k")(x).reshape(b, hh * ww)
        w = jax.nn.softmax(ctx, axis=-1)
        pooled = jnp.einsum("bn,bnc->bc", w, x.reshape(b, hh * ww, c))
        hidden = max(3, self.dim_out // 2)
        y = nn.Dense(hidden, name="net_in")(pooled)
        y = nn.silu(y)
        y = nn.Dense(self.dim_out, name="net_out")(y)
        return jax.nn.sigmoid(y)[:, None, None, :]


class _Block(nn.Module):
    """GN → FiLM(scale+1, shift) → SiLU → 3×3 conv (:385-406)."""

    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="gn")(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        x = nn.silu(x)
        return nn.Conv(self.dim_out, (3, 3), padding=1, name="conv")(x)


class _ResnetBlock(nn.Module):
    """Imagen resnet block (:408-471): block1 → [cross-attn] →
    block2(FiLM from time) → GlobalContext gate → +res_conv(x)."""

    dim: int
    dim_out: int
    cond_dim: Optional[int] = None
    time_cond_dim: Optional[int] = None
    groups: int = 8
    linear_attn: bool = False
    use_gca: bool = False

    @nn.compact
    def __call__(self, x, time_emb=None, cond=None, train: bool = False):
        scale_shift = None
        if self.time_cond_dim is not None and time_emb is not None:
            t = nn.Dense(self.dim_out * 2, name="time_mlp")(nn.silu(time_emb))
            scale_shift = jnp.split(t[:, None, None, :], 2, axis=-1)

        h = _Block(self.dim_out, groups=self.groups, name="block1")(x)
        if self.cond_dim is not None:
            assert cond is not None
            b, hh, ww, c = h.shape
            tok = h.reshape(b, hh * ww, c)
            tok = _CrossAttention(
                dim=self.dim_out, context_dim=self.cond_dim,
                linear=self.linear_attn, name="cross_attn")(tok, cond) + tok
            h = tok.reshape(b, hh, ww, c)
        h = _Block(self.dim_out, groups=self.groups, name="block2")(
            h, scale_shift=scale_shift)
        if self.use_gca:
            h = h * _GlobalContext(dim_out=self.dim_out, name="gca")(h)
        if self.dim != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), name="res_conv")(x)
        return h + x


class _TransformerBlock(nn.Module):
    """Self-attn (+context) then channel FF, both residual (:690-726)."""

    dim: int
    heads: int = 8
    dim_head: int = 32
    ff_mult: float = 2.0
    context_dim: Optional[int] = None
    linear: bool = False

    @nn.compact
    def __call__(self, x, context=None, train: bool = False):
        b, hh, ww, c = x.shape
        if self.linear:
            x = _LinearAttention(
                dim=self.dim, heads=self.heads, dim_head=self.dim_head,
                context_dim=self.context_dim, name="attn")(
                    x, context=context, train=train) + x
        else:
            tok = x.reshape(b, hh * ww, c)
            tok = _Attention(
                dim=self.dim, heads=self.heads, dim_head=self.dim_head,
                context_dim=self.context_dim, name="attn")(tok, context=context) + tok
            x = tok.reshape(b, hh, ww, c)
        return _FeedForward(dim=self.dim, mult=self.ff_mult, name="ff")(x) + x


class _CrossEmbedLayer(nn.Module):
    """Multi-kernel parallel conv embed (:728-753)."""

    dim_out: int
    kernel_sizes: Sequence[int]
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        ks = sorted(self.kernel_sizes)
        dim_scales = [self.dim_out // (2 ** i) for i in range(1, len(ks))]
        dim_scales.append(self.dim_out - sum(dim_scales))
        outs = []
        for k, d in zip(ks, dim_scales):
            p = (k - self.stride) // 2
            outs.append(nn.Conv(d, (k, k), strides=self.stride,
                                padding=[(p, p), (p, p)], name=f"conv_k{k}")(x))
        return jnp.concatenate(outs, axis=-1)


def _downsample(dim_out: int, name: str) -> nn.Module:
    return nn.Conv(dim_out, (4, 4), strides=2, padding=1, name=name)


class _Upsample(nn.Module):
    """Nearest ×2 then 3×3 conv (:344-350), broadcast-reshape upsample
    (same trick as models/layers.py — resize(nearest) lowers poorly)."""

    dim_out: int

    @nn.compact
    def __call__(self, x):
        from .layers import upsample_nearest2x

        x = upsample_nearest2x(x)
        return nn.Conv(self.dim_out, (3, 3), padding=1, name="conv")(x)


class _Parallel2(nn.Module):
    """Summed conv3 + conv1 (the last-level dim change, :967)."""

    dim_out: int

    @nn.compact
    def __call__(self, x):
        return (nn.Conv(self.dim_out, (3, 3), padding=1, name="conv3")(x)
                + nn.Conv(self.dim_out, (1, 1), name="conv1")(x))


class ImagenUNet(nn.Module):
    """The lucidrains Imagen UNet (`unet_imagen_lucidrains_simple.py:755+`).

    Inputs are NHWC; `cond` is [B, text_embed_dim] when max_text_len==1
    (the reference's own smoke test, :1236-1243) or
    [B, max_text_len, text_embed_dim] otherwise.  `cond_drop_prob` may
    be a scalar or a per-sample [B] array (the reference's
    forward_with_cond_scale drives it with per-sample 0/1 vectors).
    """

    dim: int = 128
    max_text_len: int = 256
    text_embed_dim: int = 2048
    attn_pool_text: bool = True
    attn_pool_num_latents: int = 32
    memory_efficient: bool = False
    use_global_context_attn: bool = True
    cond_dim: Optional[int] = None
    num_resnet_blocks: Union[int, Sequence[int]] = 1
    num_time_tokens: int = 2
    learned_sinu_pos_emb: bool = True
    learned_sinu_pos_emb_dim: int = 16
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 3
    channels_out: Optional[int] = None
    attn_dim_head: int = 64
    attn_heads: int = 8
    ff_mult: float = 2.0
    layer_attns: Union[bool, Sequence[bool]] = True
    attend_at_middle: bool = True
    layer_cross_attns: Union[bool, Sequence[bool]] = True
    use_linear_attn: bool = False
    use_linear_cross_attn: bool = False
    cond_on_text: bool = True
    init_dim: Optional[int] = None
    resnet_groups: Union[int, Sequence[int]] = 8
    init_cross_embed_kernel_sizes: Sequence[int] = (3, 7, 15)
    cross_embed_downsample: bool = False
    cross_embed_downsample_kernel_sizes: Sequence[int] = (2, 4)
    init_conv_to_final_conv_residual: bool = False
    scale_skip_connection: bool = True
    final_resnet_block: bool = True
    final_conv_kernel_size: int = 3
    dtype: Any = jnp.float32

    def _keep_mask(self, batch: int, cond_drop_prob) -> jnp.ndarray:
        """prob_mask_like (:101-103): keep with prob 1-p.  Random only
        when a 'cond_drop' rng is supplied; otherwise deterministic
        (exact for the 0/1 per-sample vectors CFG uses)."""
        p = jnp.broadcast_to(jnp.asarray(cond_drop_prob, jnp.float32), (batch,))
        if self.has_rng("cond_drop"):
            u = jax.random.uniform(self.make_rng("cond_drop"), (batch,))
        else:
            if isinstance(cond_drop_prob, (int, float)) and \
                    0.0 < float(cond_drop_prob) < 1.0:
                # u=0.5 would silently disable dropout for p<0.5 (and drop
                # everything for p>=0.5) — the null branch would never train
                raise ValueError(
                    "fractional cond_drop_prob requires rngs={'cond_drop': "
                    "...}; the rng-free path is exact only for the 0/1 "
                    "per-sample vectors CFG sampling uses")
            u = jnp.full((batch,), 0.5)
        return u < (1.0 - p)

    @nn.compact
    def __call__(self, x, timesteps, cond=None, cond_drop_prob=0.0,
                 train: bool = False):
        b = x.shape[0]
        nlev = len(self.dim_mults)
        init_dim = self.init_dim or self.dim
        cond_dim = self.cond_dim or self.dim
        time_cond_dim = self.dim * 4
        num_blocks = _cast_tuple(self.num_resnet_blocks, nlev)
        groups = _cast_tuple(self.resnet_groups, nlev)
        layer_attns = _cast_tuple(self.layer_attns, nlev)
        layer_cross = _cast_tuple(self.layer_cross_attns, nlev)
        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        skip_scale = 2 ** -0.5 if self.scale_skip_connection else 1.0

        x = _CrossEmbedLayer(dim_out=init_dim,
                             kernel_sizes=self.init_cross_embed_kernel_sizes,
                             stride=1, name="init_conv")(x)
        init_conv_residual = x if self.init_conv_to_final_conv_residual else None

        # --- time conditioning (:843-858) ---
        t_in = jnp.asarray(timesteps, jnp.float32)
        if self.learned_sinu_pos_emb:
            w = self.param("sinu_weights", nn.initializers.normal(1.0),
                           (self.learned_sinu_pos_emb_dim // 2,))
            freqs = t_in[:, None] * w[None, :] * 2 * math.pi
            emb = jnp.concatenate(
                [t_in[:, None], jnp.sin(freqs), jnp.cos(freqs)], axis=-1)
        else:
            half = self.dim // 2
            f = jnp.exp(jnp.arange(half) * -(math.log(10000.0) / (half - 1)))
            ang = t_in[:, None] * f[None, :]
            emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        time_hiddens = nn.silu(nn.Dense(time_cond_dim, name="to_time_hiddens")(emb))
        time_tokens = nn.Dense(cond_dim * self.num_time_tokens,
                               name="to_time_tokens")(time_hiddens)
        time_tokens = time_tokens.reshape(b, self.num_time_tokens, cond_dim)
        t = nn.Dense(time_cond_dim, name="to_time_cond")(time_hiddens)

        # --- text conditioning (:1079-1129) ---
        text_tokens = None
        if cond is not None and self.cond_on_text:
            if self.max_text_len == 1:
                assert cond.ndim == 2, "expected [B, D] text embed"
                cond = cond[:, None, :]
            else:
                assert cond.ndim == 3, "expected [B, N, D] text embeds"
            keep = self._keep_mask(b, cond_drop_prob)
            text_tokens = nn.Dense(cond_dim, name="text_to_cond")(cond)
            null_embed = self.param(
                "null_text_embed", nn.initializers.normal(1.0),
                (1, self.max_text_len, cond_dim))
            text_tokens = jnp.where(
                keep[:, None, None], text_tokens,
                null_embed[:, :text_tokens.shape[1]].astype(text_tokens.dtype))
            if self.attn_pool_text:
                text_tokens = _PerceiverResampler(
                    dim=cond_dim, depth=2, dim_head=self.attn_dim_head,
                    heads=self.attn_heads,
                    num_latents=self.attn_pool_num_latents,
                    name="attn_pool")(text_tokens)
            pooled = text_tokens.mean(axis=-2)
            th = _ln("text_hidden_norm")(pooled)
            th = nn.silu(nn.Dense(time_cond_dim, name="to_text_hidden_1")(th))
            th = nn.Dense(time_cond_dim, name="to_text_hidden_2")(th)
            null_hidden = self.param(
                "null_text_hidden", nn.initializers.normal(1.0),
                (1, time_cond_dim))
            th = jnp.where(keep[:, None], th, null_hidden.astype(th.dtype))
            t = t + th

        c = (time_tokens if text_tokens is None
             else jnp.concatenate([time_tokens, text_tokens], axis=-2))
        c = _ln("norm_cond")(c)

        if self.memory_efficient:
            x = _ResnetBlock(dim=init_dim, dim_out=init_dim,
                             time_cond_dim=time_cond_dim, groups=groups[0],
                             use_gca=self.use_global_context_attn,
                             name="init_resnet_block")(x, t, train=train)

        def down_klass(dim_out, name):
            if self.cross_embed_downsample:
                return _CrossEmbedLayer(
                    dim_out=dim_out,
                    kernel_sizes=self.cross_embed_downsample_kernel_sizes,
                    stride=2, name=name)
            return _downsample(dim_out, name)

        # --- down path (:943-975, :1144-1158) ---
        hiddens = []
        for i, (dim_in, dim_out) in enumerate(in_out):
            is_last = i >= nlev - 1
            lin_x = not layer_cross[i] and self.use_linear_cross_attn
            lcond = cond_dim if (layer_cross[i] or lin_x) else None
            cur = dim_in
            if self.memory_efficient:
                x = down_klass(dim_out, f"down_{i}_pre")(x)
                cur = dim_out
            x = _ResnetBlock(dim=cur, dim_out=cur, cond_dim=lcond,
                             linear_attn=lin_x, time_cond_dim=time_cond_dim,
                             groups=groups[i], name=f"down_{i}_init")(
                                 x, t, cond=c, train=train)
            for j in range(num_blocks[i]):
                x = _ResnetBlock(dim=cur, dim_out=cur,
                                 time_cond_dim=time_cond_dim, groups=groups[i],
                                 use_gca=self.use_global_context_attn,
                                 name=f"down_{i}_res_{j}")(x, t, train=train)
                hiddens.append(x)
            if layer_attns[i]:
                x = _TransformerBlock(
                    dim=cur, heads=self.attn_heads, dim_head=self.attn_dim_head,
                    ff_mult=self.ff_mult, context_dim=cond_dim,
                    name=f"down_{i}_attn")(x, context=c, train=train)
            elif self.use_linear_attn:
                x = _TransformerBlock(
                    dim=cur, heads=self.attn_heads, dim_head=self.attn_dim_head,
                    ff_mult=self.ff_mult, context_dim=cond_dim, linear=True,
                    name=f"down_{i}_attn")(x, context=c, train=train)
            hiddens.append(x)
            if not self.memory_efficient:
                if not is_last:
                    x = down_klass(dim_out, f"down_{i}_post")(x)
                else:
                    x = _Parallel2(dim_out, name=f"down_{i}_post")(x)

        # --- middle (:979-983) ---
        mid_dim = dims[-1]
        x = _ResnetBlock(dim=mid_dim, dim_out=mid_dim, cond_dim=cond_dim,
                         time_cond_dim=time_cond_dim, groups=groups[-1],
                         name="mid_block1")(x, t, cond=c, train=train)
        if self.attend_at_middle:
            bm, hm, wm, cm = x.shape
            tok = x.reshape(bm, hm * wm, cm)
            tok = _Attention(dim=mid_dim, heads=self.attn_heads,
                             dim_head=self.attn_dim_head, name="mid_attn")(tok) + tok
            x = tok.reshape(bm, hm, wm, cm)
        x = _ResnetBlock(dim=mid_dim, dim_out=mid_dim, cond_dim=cond_dim,
                         time_cond_dim=time_cond_dim, groups=groups[-1],
                         name="mid_block2")(x, t, cond=c, train=train)

        # --- up path (:987-1000, :1169-1178) ---
        for i, (dim_in, dim_out) in enumerate(reversed(in_out)):
            ri = nlev - 1 - i
            is_last = i == nlev - 1
            lin_x = not layer_cross[ri] and self.use_linear_cross_attn
            lcond = cond_dim if (layer_cross[ri] or lin_x) else None
            skip_dim = hiddens[-1].shape[-1]
            x = jnp.concatenate([x, hiddens.pop() * skip_scale], axis=-1)
            x = _ResnetBlock(dim=dim_out + skip_dim, dim_out=dim_out,
                             cond_dim=lcond, linear_attn=lin_x,
                             time_cond_dim=time_cond_dim, groups=groups[ri],
                             name=f"up_{i}_init")(x, t, cond=c, train=train)
            for j in range(num_blocks[ri]):
                x = jnp.concatenate([x, hiddens.pop() * skip_scale], axis=-1)
                x = _ResnetBlock(dim=dim_out + skip_dim, dim_out=dim_out,
                                 time_cond_dim=time_cond_dim, groups=groups[ri],
                                 use_gca=self.use_global_context_attn,
                                 name=f"up_{i}_res_{j}")(x, t, train=train)
            if layer_attns[ri]:
                x = _TransformerBlock(
                    dim=dim_out, heads=self.attn_heads,
                    dim_head=self.attn_dim_head, ff_mult=self.ff_mult,
                    context_dim=cond_dim, name=f"up_{i}_attn")(
                        x, context=c, train=train)
            elif self.use_linear_attn:
                x = _TransformerBlock(
                    dim=dim_out, heads=self.attn_heads,
                    dim_head=self.attn_dim_head, ff_mult=self.ff_mult,
                    context_dim=cond_dim, linear=True, name=f"up_{i}_attn")(
                        x, context=c, train=train)
            if not is_last or self.memory_efficient:
                x = _Upsample(dim_in, name=f"up_{i}_upsample")(x)

        if init_conv_residual is not None:
            x = jnp.concatenate([x, init_conv_residual], axis=-1)
        if self.final_resnet_block:
            x = _ResnetBlock(dim=x.shape[-1], dim_out=self.dim,
                             time_cond_dim=time_cond_dim, groups=groups[0],
                             use_gca=True, name="final_res_block")(x, t, train=train)
        k = self.final_conv_kernel_size
        return nn.Conv(self.channels_out or self.channels, (k, k),
                       padding=k // 2, name="final_conv")(x)

    def forward_with_cond_scale(self, x, timesteps, cond_scale, cond):
        """CFG combine, (1-s)·ε(z) + s·ε(z,c) (:1032-1048): single pass
        for s∈{0,1}, one batch-doubled pass otherwise."""
        b = x.shape[0]
        if cond_scale == 1:
            return self(x, timesteps, cond=cond, cond_drop_prob=0.0)
        if cond_scale == 0:
            return self(x, timesteps, cond=cond, cond_drop_prob=1.0)
        p = jnp.concatenate([jnp.zeros(b), jnp.ones(b)])
        out = self(jnp.concatenate([x, x], 0),
                   jnp.concatenate([timesteps, timesteps], 0),
                   cond=jnp.concatenate([cond, cond], 0), cond_drop_prob=p)
        eps_zc, eps_z = jnp.split(out, 2, axis=0)
        return (1.0 - cond_scale) * eps_z + cond_scale * eps_zc


def BaseUnet64(**kwargs) -> ImagenUNet:
    """Paper-appendix Base-64 preset (`..._simple.py:1192-1204`)."""
    defaults = dict(
        dim=512,
        dim_mults=(1, 2, 3, 4),
        num_resnet_blocks=3,
        layer_attns=(False, True, True, True),
        layer_cross_attns=(False, True, True, True),
        attn_heads=8,
        ff_mult=2.0,
        memory_efficient=False,
    )
    defaults.update(kwargs)
    return ImagenUNet(**defaults)
