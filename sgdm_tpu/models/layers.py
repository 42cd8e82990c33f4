"""ADM-UNet building blocks in Flax (NHWC, TPU-native).

TPU-native rewrite of `dynamic/diffusionmodules/util.py` +
`openaimodel.py:207-465` (ResBlock / AttentionBlock / Up-Downsample /
timestep embedding / GroupNorm32 / zero_module).

Design deviations from the torch reference, on purpose:
  * NHWC layout everywhere (TPU conv layout; the reference is NCHW),
  * a `dtype` compute policy: params live in float32, block compute can run
    bfloat16 (MXU-native) with GroupNorm and softmax always in float32 —
    mirroring GroupNorm32's fp32-norm trick (`util.py:210-215`),
  * `zero_module` becomes zero-initialization of the final conv/dense kernels
    (same effect: blocks start as identity contributions).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

__all__ = [
    "timestep_embedding",
    "GroupNorm32",
    "ResBlock",
    "Upsample",
    "Downsample",
    "SelfAttentionBlock",
    "zeros_init",
]

zeros_init = nn.initializers.zeros


def timestep_embedding(timesteps: jax.Array, dim: int, max_period: int = 10000) -> jax.Array:
    """Sinusoidal embeddings, [N] -> [N, dim], cos||sin order.

    Parity: dynamic/diffusionmodules/util.py:151-171 (cos first, then sin;
    odd dims zero-padded). Timesteps may be fractional (EDM passes floats).
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def _pallas_ok(use_pallas: bool) -> bool:
    """Pallas TPU kernels are usable only when the computation will actually
    land on the TPU (utils.tpu.on_tpu_target honors tests that pin
    `jax_default_device` to CPU under the axon 'tpu' backend)."""
    if not use_pallas:
        return False
    from ..utils.tpu import on_tpu_target

    return on_tpu_target()


class GroupNorm32(nn.Module):
    """32-group GroupNorm computed in float32 regardless of activation dtype,
    with an optional fused GN(+FiLM)+SiLU Pallas path.

    Parity: openaimodel normalization() + GroupNorm32 (util.py:199-215).
    The group count is the largest divisor of C that is <= num_groups —
    identical to the reference's fixed 32 groups whenever C % 32 == 0
    (always true for the shipped presets).
    """

    num_groups: int = 32
    use_pallas: bool | str = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        film_scale: jax.Array | None = None,
        film_shift: jax.Array | None = None,
        silu: bool = False,
        param_only: bool = False,
    ) -> jax.Array:
        c = x.shape[-1]
        groups = math.gcd(self.num_groups, c)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if param_only:
            # the fused-ResBlock kernel consumes the raw affine params;
            # declaring them here keeps the tree identical across modes
            return scale, bias

        if silu and x.ndim == 4 and _pallas_ok(bool(self.use_pallas)):
            from ..ops.pallas.groupnorm import fused_groupnorm_silu

            return fused_groupnorm_silu(
                x, scale, bias,
                None if film_scale is None else film_scale.reshape(x.shape[0], c),
                None if film_shift is None else film_shift.reshape(x.shape[0], c),
                groups, 1e-5,
            )

        orig = x.dtype
        # normalization via flax's GroupNorm lowering (measurably faster than
        # a hand-rolled reshape/mean/var chain: 353 vs 261 samples/s on the
        # IN64 flagship); affine applied from our own params so the fused
        # Pallas path shares the identical tree
        xn = nn.GroupNorm(
            num_groups=groups, epsilon=1e-5, use_scale=False, use_bias=False,
            dtype=jnp.float32, name="norm_core",
        )(x.astype(jnp.float32))
        # back to the compute dtype after the fp32 norm+affine — FiLM and
        # SiLU run in model dtype exactly like the reference (GroupNorm32
        # casts to h.dtype before the scale-shift, util.py:210-215)
        h = (xn * scale + bias).astype(orig)
        if film_scale is not None:
            fs = film_scale.reshape(x.shape[0], *((1,) * (x.ndim - 2)), c)
            fsh = film_shift.reshape(x.shape[0], *((1,) * (x.ndim - 2)), c)
            h = h * (1.0 + fs.astype(orig)) + fsh.astype(orig)
        if silu:
            h = nn.silu(h)
        return h.astype(orig)


def upsample_nearest2x(x: jax.Array) -> jax.Array:
    """2x nearest upsample as broadcast+reshape — the ONE shared TPU
    implementation (also used by codec.py / zoo.py / zoo_imagen.py):
    jax.image.resize(nearest) lowers to pad(-inf)+maximum chains on TPU
    (measured ~16 ms/step on the IN64 flagship, BASELINE.md round 2); the
    broadcast is a pure layout op whose backward is a cheap 2x2 reduce."""
    b, h, w, c = x.shape
    return jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, 2, w, 2, c)
    ).reshape(b, h * 2, w * 2, c)


class Upsample(nn.Module):
    """2x nearest upsample + optional 3x3 conv. Parity: openaimodel.py Upsample."""

    use_conv: bool = True
    out_channels: int | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = upsample_nearest2x(x)
        if self.use_conv:
            x = nn.Conv(self.out_channels or x.shape[-1], (3, 3), padding=1,
                        dtype=self.dtype)(x)
        return x


class Downsample(nn.Module):
    """Stride-2 conv (or avg-pool) downsample. Parity: openaimodel.py Downsample."""

    use_conv: bool = True
    out_channels: int | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        if self.use_conv:
            return nn.Conv(
                self.out_channels or c, (3, 3), strides=(2, 2), padding=1,
                dtype=self.dtype,
            )(x)
        assert (self.out_channels or c) == c
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class _ConvParams(nn.Module):
    """Parameter-only stand-in for nn.Conv: declares an identically-named
    and identically-initialized kernel/bias pair (HWIO) so the fused-kernel
    path shares one checkpoint tree with the nn.Conv path."""

    features: int
    in_features: int
    ksize: int = 3
    kernel_init: Any = nn.linear.default_kernel_init
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", self.kernel_init,
            (self.ksize, self.ksize, self.in_features, self.features),
            jnp.float32,
        )
        b = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        return k, b


class ResBlock(nn.Module):
    """Residual block with FiLM time conditioning.

    Parity: openaimodel.py:207-321 — GN→SiLU→conv3x3 in_layers; SiLU→Dense
    emb_layers; scale-shift-norm FiLM `out_norm(h)*(1+scale)+shift`
    (:313-315); zero-init out conv; optional built-in up/down resampling
    (resblock_updown) where h and the skip are resampled by parameter-free
    nearest/avg-pool ops.

    `use_pallas="fused"` routes the whole block (both GNs, both convs,
    FiLM, SiLU, dropout, skip-add) through ONE Pallas kernel with a Pallas
    backward (`ops.pallas.resblock`) — the training-path north star; the
    parameter tree is identical to the unfused path so checkpoints
    interoperate.  Falls back for up/down resampling blocks and
    non-8-aligned widths.
    """

    out_channels: int | None = None
    dropout: float = 0.0
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    use_conv_skip: bool = False
    use_pallas: bool | str = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array, train: bool = False) -> jax.Array:
        c_in = x.shape[-1]
        c_out = self.out_channels or c_in

        # both Pallas modes take the fused kernel: "fused" is the training
        # mode (Pallas backward), True is the sampling mode (fwd only —
        # grad never requested, so the custom VJP is never built).  The
        # up/down resblock_updown variants have a FORWARD-ONLY kernel, so
        # they fuse only in sampling mode (True) without dropout.
        if (
            self.use_pallas in (True, "fused")
            and _pallas_ok(True)
            and x.ndim == 4
            and self.use_scale_shift_norm
            and not self.use_conv_skip
            and x.shape[2] % 8 == 0
        ):
            if not self.up and not self.down:
                return self._fused(x, emb, c_in, c_out, train)
            if (
                self.use_pallas is True
                and c_out == c_in
                and not (train and self.dropout > 0)
                and (x.shape[2] * 2 if self.up else x.shape[2] // 2) % 8 == 0
                and (x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
            ):
                return self._fused(
                    x, emb, c_in, c_out, train,
                    resample="up" if self.up else "down",
                )

        # fallback composition path.  NOTE: only plain `use_pallas=True`
        # (the fwd-only sampling mode) may route GroupNorm32 through the
        # fwd-only GN kernel — in "fused" training mode the up/down blocks
        # landing here must use pure-XLA GN, whose backward fuses (the GN
        # kernel's recompute-VJP measurably hurts training, BASELINE.md r2)
        gn_pallas = self.use_pallas is True
        h = GroupNorm32(use_pallas=gn_pallas, name="in_norm")(x, silu=True)
        if self.up:
            h = Upsample(use_conv=False, dtype=self.dtype)(h)
            x = Upsample(use_conv=False, dtype=self.dtype)(x)
        elif self.down:
            h = Downsample(use_conv=False, dtype=self.dtype)(h)
            x = Downsample(use_conv=False, dtype=self.dtype)(x)
        h = checkpoint_name(
            nn.Conv(c_out, (3, 3), padding=1, dtype=self.dtype, name="in_conv")(h),
            "rb_conv",
        )

        emb_out = nn.Dense(
            2 * c_out if self.use_scale_shift_norm else c_out,
            dtype=self.dtype,
            name="emb_proj",
        )(nn.silu(emb))
        emb_out = emb_out[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            # fused GN + FiLM + SiLU (openaimodel.py:313-315)
            h = GroupNorm32(use_pallas=gn_pallas, name="out_norm")(
                h, film_scale=scale, film_shift=shift, silu=True
            )
        else:
            h = h + emb_out
            h = GroupNorm32(use_pallas=gn_pallas, name="out_norm")(
                h, silu=True
            )
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = checkpoint_name(
            nn.Conv(
                c_out, (3, 3), padding=1, dtype=self.dtype,
                kernel_init=zeros_init, name="out_conv",
            )(h),
            "rb_conv",
        )

        if c_out == c_in:
            skip = x
        elif self.use_conv_skip:
            skip = checkpoint_name(
                nn.Conv(c_out, (3, 3), padding=1, dtype=self.dtype,
                        name="skip_conv")(x),
                "rb_conv",
            )
        else:
            skip = checkpoint_name(
                nn.Conv(c_out, (1, 1), dtype=self.dtype, name="skip_proj")(x),
                "rb_conv",
            )
        return skip + h

    def _fused(self, x, emb, c_in: int, c_out: int, train: bool,
               resample: str | None = None) -> jax.Array:
        """Single fused-kernel path (ops.pallas.resblock.fused_resblock)."""
        from ..ops.pallas.resblock import fused_resblock

        g1, b1 = GroupNorm32(name="in_norm")(x, param_only=True)
        w1, c1 = _ConvParams(c_out, c_in, 3, name="in_conv")()
        emb_out = nn.Dense(2 * c_out, dtype=self.dtype, name="emb_proj")(
            nn.silu(emb)
        )
        film_scale, film_shift = jnp.split(emb_out, 2, axis=-1)  # [B, c_out]
        g2, b2 = GroupNorm32(name="out_norm")(
            jnp.zeros((1, 1, 1, c_out), x.dtype), param_only=True
        )
        w2, c2 = _ConvParams(c_out, c_out, 3, kernel_init=zeros_init,
                             name="out_conv")()
        skw = skb = None
        if c_out != c_in:
            skw, skb = _ConvParams(c_out, c_in, 1, name="skip_proj")()
        rate = float(self.dropout) if train else 0.0
        seed = None
        if rate > 0.0:
            seed = jax.random.bits(
                self.make_rng("dropout"), (1,), jnp.uint32
            ).astype(jnp.int32)
        return fused_resblock(
            x, g1, b1, w1, c1, film_scale, film_shift, g2, b2, w2, c2,
            skw, skb, seed, dropout_rate=rate, resample=resample,
        )


class SelfAttentionBlock(nn.Module):
    """Spatial self-attention at a fixed resolution.

    Parity: openaimodel.py:323-465 AttentionBlock/QKVAttention — fused QKV
    projection, per-head scale 1/sqrt(sqrt(d)) applied to BOTH q and k
    (fp16-stability trick, :446-452), float32 softmax, zero-init output
    projection, residual add.
    """

    num_heads: int = 8
    num_head_channels: int = -1
    use_pallas: bool | str = False
    # None = auto (flash attention whenever the TPU shape gate passes —
    # the measured single-chip training win, independent of the conv
    # use_pallas knob).  The trainer sets False under tensor-parallel /
    # FSDP state shardings: pallas_calls are per-device programs GSPMD
    # cannot partition over sharded operands.
    flash_attention: bool | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        if self.num_head_channels == -1:
            heads = self.num_heads
        else:
            assert c % self.num_head_channels == 0
            heads = c // self.num_head_channels
        d = c // heads

        h = GroupNorm32(name="norm")(x).reshape(b, hh * ww, c)
        # 'rb_conv' tag: under the selective-remat policy (unet._conv_remat)
        # the qkv/proj matmul outputs are saved so attention projections
        # never re-execute in the backward (softmax recomputes from qkv)
        qkv = checkpoint_name(
            nn.DenseGeneral(3 * c, dtype=self.dtype, name="qkv")(h), "rb_conv"
        )
        q, k, v = jnp.split(qkv.reshape(b, hh * ww, 3, heads, d), 3, axis=2)
        q = q.squeeze(2)  # [b, n, heads, d]
        k = k.squeeze(2)
        v = v.squeeze(2)

        # use_pallas=True → the fwd-only fused kernel (sampling path);
        # use_pallas="fused" (train) prefers the flash fwd+bwd route below
        flash_ok = self.flash_attention is not False
        if flash_ok and _pallas_ok(self.use_pallas is True):
            from ..ops.pallas.attention import fused_self_attention

            out = fused_self_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
            ).transpose(0, 2, 1, 3).reshape(b, hh * ww, c)
        elif (
            flash_ok
            and _pallas_ok(True)
            and hh * ww >= 128
            and d % 64 == 0
            # the TPU flash kernel requires the sequence length to divide
            # into its blocks; e.g. n=576 with block 512 fails at lowering —
            # fall back to the einsum path for non-block-divisible shapes
            and (hh * ww) % min(512, hh * ww) == 0
        ):
            # training path: jax's TPU flash attention (Pallas fwd AND bwd
            # kernels — the [B,H,N,N] float32 logits never touch HBM, unlike
            # the XLA einsum+softmax lowering).  1/sqrt(sqrt(d)) on both q
            # and k == sm_scale 1/sqrt(d) exactly.
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes,
                flash_attention,
            )

            n = hh * ww
            bs = BlockSizes(
                block_q=min(512, n), block_k_major=min(512, n),
                block_k=min(512, n), block_b=1,
                block_q_major_dkv=min(512, n), block_k_major_dkv=min(512, n),
                block_k_dkv=min(512, n), block_q_dkv=min(512, n),
                block_k_major_dq=min(512, n), block_k_dq=min(512, n),
                block_q_dq=min(512, n),
            )
            out = flash_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                sm_scale=1.0 / math.sqrt(d), block_sizes=bs,
            ).transpose(0, 2, 1, 3).reshape(b, n, c)
        else:
            scale = 1.0 / math.sqrt(math.sqrt(d))
            logits = jnp.einsum(
                "bnhd,bmhd->bhnm", q * scale, k * scale,
                preferred_element_type=jnp.float32,
            )
            weights = jax.nn.softmax(
                logits.astype(jnp.float32), axis=-1
            ).astype(x.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", weights, v).reshape(b, hh * ww, c)
        out = checkpoint_name(
            nn.DenseGeneral(
                c, dtype=self.dtype, kernel_init=zeros_init, name="proj_out"
            )(out),
            "rb_conv",
        )
        return x + out.reshape(b, hh, ww, c)
