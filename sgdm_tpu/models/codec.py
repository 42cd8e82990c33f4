"""LDM first-stage codec family — TPU-native NHWC Flax rewrite.

Covers `dynamic/diffusionmodules/model.py` (the CompVis
"pytorch_diffusion + derived encoder decoder" file): the DDPM-style
`Model` UNet (:217-366), `Encoder` (:369-460), `Decoder` (:463-568),
`SimpleDecoder` (:571-604), `UpsampleDecoder` (:607-652),
`LatentRescaler` (:655-689), `MergedRescaleEncoder`/`Decoder`
(:692-725), `Upsampler` (:728-744), `Resize` (:747-768) and
`FirstStagePostProcessor` (:770-834).

Zoo breadth: no shipped reference config instantiates any of these, and
the reference file itself cannot import in this image (it requires the
external `ldm` package, model.py:8-9) — so behavioral tests, not weight
transplants (tests/test_codec.py).

Shared pieces (cites into model.py):
  * Normalize = GroupNorm(32, eps=1e-6) (:39-41); swish nonlinearity.
  * ResnetBlock: GN→swish→conv3 ×2 with additive time projection after
    conv1 and a 3×3-or-1×1 shortcut on channel change (:83-142).
  * AttnBlock: single-head 1×1-conv qkv token attention (:151-203);
    LinAttnBlock: the LDM factorized linear attention with heads=1,
    dim_head=C (:145-148, dynamic/attention.py:81-98).
  * Downsample pads asymmetrically (0,1,0,1) then 3×3 stride-2 VALID
    (:61-80); Upsample is nearest ×2 (+ optional conv) (:43-58), done
    as a broadcast-reshape (resize(nearest) lowers poorly on TPU).

Layout: NHWC end to end (channel-last convs tile straight onto the
MXU); attention runs on [B, H·W, C] with f32 softmax.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import upsample_nearest2x as _upsample_nearest2x

__all__ = [
    "LDMModel", "Encoder", "Decoder", "SimpleDecoder", "UpsampleDecoder",
    "LatentRescaler", "MergedRescaleEncoder", "MergedRescaleDecoder",
    "Upsampler", "resize", "FirstStagePostProcessor", "CodecResnetBlock",
    "AttnBlock", "LinAttnBlock",
]


def _swish(x):
    return x * jax.nn.sigmoid(x)


class _Norm(nn.Module):
    """Normalize = GroupNorm(32, eps=1e-6) (model.py:39-41).  Falls back
    to C groups when 32 doesn't divide C (torch would error there too —
    lets tiny test configs run)."""

    num_groups: int = 32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = self.num_groups if c % self.num_groups == 0 else c
        return nn.GroupNorm(num_groups=g, epsilon=1e-6, name="gn")(x)


def _norm(name: str, num_groups: int = 32) -> nn.Module:
    return _Norm(num_groups=num_groups, name=name)


def _ddpm_timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """tensor2tensor-style sinusoid, exp scale /(half-1) (model.py:13-31)."""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                    * -(math.log(10000.0) / (half - 1)))
    ang = jnp.asarray(t, jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class Upsample(nn.Module):
    """Nearest ×2 + optional 3×3 conv (model.py:43-58)."""

    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        x = _upsample_nearest2x(x)
        if self.with_conv:
            x = nn.Conv(x.shape[-1], (3, 3), padding=1, name="conv")(x)
        return x


class Downsample(nn.Module):
    """Asymmetric-pad stride-2 conv, or 2×2 avg-pool (model.py:61-80)."""

    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(x.shape[-1], (3, 3), strides=2, padding="VALID",
                           name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class CodecResnetBlock(nn.Module):
    """model.py:83-142."""

    out_channels: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.0
    temb_channels: int = 512

    @nn.compact
    def __call__(self, x, temb=None, train: bool = False):
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        h = _swish(_norm("norm1")(x))
        h = nn.Conv(out_ch, (3, 3), padding=1, name="conv1")(h)
        if temb is not None and self.temb_channels > 0:
            h = h + nn.Dense(out_ch, name="temb_proj")(_swish(temb))[:, None, None, :]
        h = _swish(_norm("norm2")(h))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(out_ch, (3, 3), padding=1, name="conv2")(h)
        if in_ch != out_ch:
            if self.conv_shortcut:
                x = nn.Conv(out_ch, (3, 3), padding=1, name="conv_shortcut")(x)
            else:
                x = nn.Conv(out_ch, (1, 1), name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head 1×1-conv token attention, residual (model.py:151-203)."""

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = _norm("norm")(x)
        q = nn.Conv(c, (1, 1), name="q")(h).reshape(b, hh * ww, c)
        k = nn.Conv(c, (1, 1), name="k")(h).reshape(b, hh * ww, c)
        v = nn.Conv(c, (1, 1), name="v")(h).reshape(b, hh * ww, c)
        w = jnp.einsum("bic,bjc->bij", q, k) * (c ** -0.5)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bij,bjc->bic", w, v).reshape(b, hh, ww, c)
        return x + nn.Conv(c, (1, 1), name="proj_out")(out)


class LinAttnBlock(nn.Module):
    """LDM linear attention at heads=1, dim_head=C (model.py:145-148;
    dynamic/attention.py:81-98).  NOT residual in the reference."""

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        qkv = nn.Conv(3 * c, (1, 1), use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, hh * ww, 3 * c), 3, axis=-1)
        k = jax.nn.softmax(k, axis=-2)  # softmax over tokens
        ctx = jnp.einsum("bnd,bne->bde", k, v)
        out = jnp.einsum("bde,bnd->bne", ctx, q).reshape(b, hh, ww, c)
        return nn.Conv(c, (1, 1), name="to_out")(out)


def _make_attn(attn_type: str, name: str):
    assert attn_type in ("vanilla", "linear", "none"), attn_type
    if attn_type == "vanilla":
        return AttnBlock(name=name)
    if attn_type == "linear":
        return LinAttnBlock(name=name)
    return lambda x: x


class LDMModel(nn.Module):
    """The DDPM-style codec UNet (`Model`, model.py:217-366)."""

    ch: int = 64
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    resamp_with_conv: bool = True
    resolution: int = 64
    use_timestep: bool = True
    use_linear_attn: bool = False
    attn_type: str = "vanilla"

    @nn.compact
    def __call__(self, x, t=None, context=None, train: bool = False):
        attn_type = "linear" if self.use_linear_attn else self.attn_type
        nres = len(self.ch_mult)
        temb_ch = self.ch * 4
        if context is not None:
            x = jnp.concatenate([x, context], axis=-1)
        temb = None
        if self.use_timestep:
            assert t is not None
            temb = _ddpm_timestep_embedding(t, self.ch)
            temb = nn.Dense(temb_ch, name="temb_dense0")(temb)
            temb = nn.Dense(temb_ch, name="temb_dense1")(_swish(temb))

        curr_res = self.resolution
        in_ch_mult = (1,) + tuple(self.ch_mult)
        hs = [nn.Conv(self.ch, (3, 3), padding=1, name="conv_in")(x)]
        for i in range(nres):
            block_out = self.ch * self.ch_mult[i]
            for j in range(self.num_res_blocks):
                h = CodecResnetBlock(
                    out_channels=block_out, temb_channels=temb_ch,
                    dropout=self.dropout, name=f"down_{i}_block_{j}")(
                        hs[-1], temb, train=train)
                if curr_res in self.attn_resolutions:
                    h = _make_attn(attn_type, f"down_{i}_attn_{j}")(h)
                hs.append(h)
            if i != nres - 1:
                hs.append(Downsample(self.resamp_with_conv,
                                     name=f"down_{i}_downsample")(hs[-1]))
                curr_res //= 2

        h = hs[-1]
        h = CodecResnetBlock(temb_channels=temb_ch, dropout=self.dropout,
                             name="mid_block_1")(h, temb, train=train)
        h = _make_attn(attn_type, "mid_attn_1")(h)
        h = CodecResnetBlock(temb_channels=temb_ch, dropout=self.dropout,
                             name="mid_block_2")(h, temb, train=train)

        for i in reversed(range(nres)):
            block_out = self.ch * self.ch_mult[i]
            for j in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = CodecResnetBlock(
                    out_channels=block_out, temb_channels=temb_ch,
                    dropout=self.dropout, name=f"up_{i}_block_{j}")(
                        h, temb, train=train)
                if curr_res in self.attn_resolutions:
                    h = _make_attn(attn_type, f"up_{i}_attn_{j}")(h)
            if i != 0:
                h = Upsample(self.resamp_with_conv,
                             name=f"up_{i}_upsample")(h)
                curr_res *= 2

        h = _swish(_norm("norm_out")(h))
        return nn.Conv(self.out_ch, (3, 3), padding=1, name="conv_out")(h)


class Encoder(nn.Module):
    """model.py:369-460 — no time embedding, 2·z_channels head."""

    ch: int = 64
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    resamp_with_conv: bool = True
    resolution: int = 64
    z_channels: int = 4
    double_z: bool = True
    use_linear_attn: bool = False
    attn_type: str = "vanilla"

    @nn.compact
    def __call__(self, x, train: bool = False):
        attn_type = "linear" if self.use_linear_attn else self.attn_type
        nres = len(self.ch_mult)
        curr_res = self.resolution
        h = nn.Conv(self.ch, (3, 3), padding=1, name="conv_in")(x)
        for i in range(nres):
            block_out = self.ch * self.ch_mult[i]
            for j in range(self.num_res_blocks):
                h = CodecResnetBlock(
                    out_channels=block_out, temb_channels=0,
                    dropout=self.dropout, name=f"down_{i}_block_{j}")(
                        h, train=train)
                if curr_res in self.attn_resolutions:
                    h = _make_attn(attn_type, f"down_{i}_attn_{j}")(h)
            if i != nres - 1:
                h = Downsample(self.resamp_with_conv,
                               name=f"down_{i}_downsample")(h)
                curr_res //= 2

        h = CodecResnetBlock(temb_channels=0, dropout=self.dropout,
                             name="mid_block_1")(h, train=train)
        h = _make_attn(attn_type, "mid_attn_1")(h)
        h = CodecResnetBlock(temb_channels=0, dropout=self.dropout,
                             name="mid_block_2")(h, train=train)
        h = _swish(_norm("norm_out")(h))
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_ch, (3, 3), padding=1, name="conv_out")(h)


class Decoder(nn.Module):
    """model.py:463-568."""

    ch: int = 64
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    resamp_with_conv: bool = True
    resolution: int = 64
    give_pre_end: bool = False
    tanh_out: bool = False
    use_linear_attn: bool = False
    attn_type: str = "vanilla"

    @nn.compact
    def __call__(self, z, train: bool = False):
        attn_type = "linear" if self.use_linear_attn else self.attn_type
        nres = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        curr_res = self.resolution // 2 ** (nres - 1)
        h = nn.Conv(block_in, (3, 3), padding=1, name="conv_in")(z)
        h = CodecResnetBlock(temb_channels=0, dropout=self.dropout,
                             name="mid_block_1")(h, train=train)
        h = _make_attn(attn_type, "mid_attn_1")(h)
        h = CodecResnetBlock(temb_channels=0, dropout=self.dropout,
                             name="mid_block_2")(h, train=train)
        for i in reversed(range(nres)):
            block_out = self.ch * self.ch_mult[i]
            for j in range(self.num_res_blocks + 1):
                h = CodecResnetBlock(
                    out_channels=block_out, temb_channels=0,
                    dropout=self.dropout, name=f"up_{i}_block_{j}")(
                        h, train=train)
                if curr_res in self.attn_resolutions:
                    h = _make_attn(attn_type, f"up_{i}_attn_{j}")(h)
            if i != 0:
                h = Upsample(self.resamp_with_conv,
                             name=f"up_{i}_upsample")(h)
                curr_res *= 2
        if self.give_pre_end:
            return h
        h = _swish(_norm("norm_out")(h))
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv_out")(h)
        return jnp.tanh(h) if self.tanh_out else h


class SimpleDecoder(nn.Module):
    """1×1 → res ×3 (2x,4x,2x widths) → 1×1 → up ×2 → GN head
    (model.py:571-604)."""

    out_channels: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = nn.Conv(c, (1, 1), name="conv_pre")(x)
        for i, mult in enumerate((2, 4, 2)):
            x = CodecResnetBlock(out_channels=mult * c, temb_channels=0,
                                 name=f"res_{i}")(x, train=train)
        x = nn.Conv(c, (1, 1), name="conv_post")(x)
        x = Upsample(with_conv=True, name="upsample")(x)
        x = _swish(_norm("norm_out")(x))
        return nn.Conv(self.out_channels, (3, 3), padding=1, name="conv_out")(x)


class UpsampleDecoder(nn.Module):
    """(res ×(n+1) → up) per level, GN head (model.py:607-652)."""

    out_channels: int = 3
    ch: int = 64
    num_res_blocks: int = 2
    ch_mult: Sequence[int] = (2, 2)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        nres = len(self.ch_mult)
        for i in range(nres):
            block_out = self.ch * self.ch_mult[i]
            for j in range(self.num_res_blocks + 1):
                x = CodecResnetBlock(
                    out_channels=block_out, temb_channels=0,
                    dropout=self.dropout, name=f"res_{i}_{j}")(x, train=train)
            if i != nres - 1:
                x = Upsample(with_conv=True, name=f"upsample_{i}")(x)
        x = _swish(_norm("norm_out")(x))
        return nn.Conv(self.out_channels, (3, 3), padding=1, name="conv_out")(x)


class LatentRescaler(nn.Module):
    """conv → res×d → nearest-resize(factor) → attn → res×d → 1×1
    (model.py:655-689)."""

    factor: float
    mid_channels: int
    out_channels: int
    depth: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.mid_channels, (3, 3), padding=1, name="conv_in")(x)
        for i in range(self.depth):
            x = CodecResnetBlock(temb_channels=0, name=f"res1_{i}")(x, train=train)
        b, h, w, c = x.shape
        nh, nw = int(round(h * self.factor)), int(round(w * self.factor))
        x = jax.image.resize(x, (b, nh, nw, c), method="nearest")
        x = AttnBlock(name="attn")(x)
        for i in range(self.depth):
            x = CodecResnetBlock(temb_channels=0, name=f"res2_{i}")(x, train=train)
        return nn.Conv(self.out_channels, (1, 1), name="conv_out")(x)


class MergedRescaleEncoder(nn.Module):
    """Encoder (double_z=False) → LatentRescaler (model.py:692-708)."""

    ch: int = 64
    out_ch: int = 4
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    resamp_with_conv: bool = True
    resolution: int = 64
    rescale_factor: float = 1.0
    rescale_module_depth: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        inter = self.ch * self.ch_mult[-1]
        x = Encoder(ch=self.ch, ch_mult=self.ch_mult,
                    num_res_blocks=self.num_res_blocks,
                    attn_resolutions=self.attn_resolutions,
                    dropout=self.dropout, resamp_with_conv=self.resamp_with_conv,
                    resolution=self.resolution, z_channels=inter,
                    double_z=False, name="encoder")(x, train=train)
        return LatentRescaler(factor=self.rescale_factor, mid_channels=inter,
                              out_channels=self.out_ch,
                              depth=self.rescale_module_depth,
                              name="rescaler")(x, train=train)


class MergedRescaleDecoder(nn.Module):
    """LatentRescaler → Decoder (model.py:711-725)."""

    z_channels: int = 4
    out_ch: int = 3
    ch: int = 64
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    resamp_with_conv: bool = True
    resolution: int = 64
    rescale_factor: float = 1.0
    rescale_module_depth: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        tmp = self.z_channels * self.ch_mult[-1]
        x = LatentRescaler(factor=self.rescale_factor, mid_channels=tmp,
                           out_channels=tmp, depth=self.rescale_module_depth,
                           name="rescaler")(x, train=train)
        return Decoder(out_ch=self.out_ch, ch=self.ch, ch_mult=self.ch_mult,
                       num_res_blocks=self.num_res_blocks,
                       attn_resolutions=self.attn_resolutions,
                       dropout=self.dropout,
                       resamp_with_conv=self.resamp_with_conv,
                       resolution=self.resolution, name="decoder")(x, train=train)


class Upsampler(nn.Module):
    """LatentRescaler → all-equal-mult Decoder (model.py:728-744)."""

    in_size: int
    out_size: int
    in_channels: int
    out_channels: int
    ch_mult: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.out_size >= self.in_size
        num_blocks = int(math.log2(self.out_size // self.in_size)) + 1
        factor_up = 1.0 + (self.out_size % self.in_size)
        x = LatentRescaler(factor=factor_up, mid_channels=2 * self.in_channels,
                           out_channels=self.in_channels,
                           name="rescaler")(x, train=train)
        return Decoder(out_ch=self.out_channels, resolution=self.out_size,
                       num_res_blocks=2, attn_resolutions=(),
                       ch=self.in_channels,
                       ch_mult=tuple(self.ch_mult for _ in range(num_blocks)),
                       name="decoder")(x, train=train)


def resize(x: jnp.ndarray, scale_factor: float = 1.0,
           mode: str = "bilinear") -> jnp.ndarray:
    """Functional `Resize` (model.py:747-768): align_corners=False
    interpolation, identity at factor 1 (the learned branch is
    NotImplementedError in the reference too)."""
    if scale_factor == 1.0:
        return x
    b, h, w, c = x.shape
    nh, nw = int(h * scale_factor), int(w * scale_factor)
    method = {"bilinear": "bilinear", "nearest": "nearest",
              "bicubic": "cubic"}[mode]
    return jax.image.resize(x, (b, nh, nw, c), method=method)


class FirstStagePostProcessor(nn.Module):
    """GN-proj then (res → avg-pool down) per mult (model.py:770-834).

    JAX is functional, so the frozen pretrained first-stage encode is
    passed as `encode_fn` (or pass already-encoded features directly):
    the reference wraps the pretrained model and calls `.encode` under
    no_grad (:815-820); `jax.lax.stop_gradient` gives the same
    semantics here.
    """

    ch_mult: Sequence[int]
    n_channels: int
    reshape: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, encode_fn: Optional[Callable] = None,
                 train: bool = False):
        if encode_fn is not None:
            x = encode_fn(x)
        z = jax.lax.stop_gradient(x)
        z = _norm("proj_norm", num_groups=z.shape[-1] // 2)(z)
        z = nn.Conv(self.n_channels, (3, 3), padding=1, name="proj")(z)
        z = _swish(z)
        for i, m in enumerate(self.ch_mult):
            z = CodecResnetBlock(out_channels=m * self.n_channels,
                                 dropout=self.dropout, temb_channels=0,
                                 name=f"block_{i}")(z, train=train)
            z = Downsample(with_conv=False, name=f"down_{i}")(z)
        if self.reshape:
            b, h, w, c = z.shape
            z = z.reshape(b, h * w, c)
        return z
