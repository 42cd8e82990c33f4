"""Extra denoiser zoo: the diffae latent MLP and the lucidrains UNets.

TPU-native (NHWC Flax) rewrites of the reference's remaining
instantiable denoiser classes (never used by any shipped config, kept
for zoo completeness — SURVEY §2.4 "unused model zoo"):

  * `LatentFC` ← dynamic/diffusionmodules/latent_fc.py:63-226 — the
    diffae-style latent-DPM MLP: sinusoidal t-emb (64) → 2-layer time
    MLP; N hidden layers with the INPUT re-concatenated at every hidden
    layer (skip_layers = 1..N-1), conditioning as a multiplicative
    `x * (condition_bias + cond_proj)` followed by LayerNorm → SiLU →
    dropout; identity-activation output layer.
  * `VDMUNet` ← dynamic/diffusionmodules/unet_vdm_lucidrain.py:202-315 —
    the lucidrains denoising-diffusion UNet: 7×7 init conv, per-level
    (ResnetBlock ×2 → linear attention → stride-2 4×4 conv down), mid
    block with full attention, symmetric ups with skip concat and 4×4
    transposed-conv upsampling, final res block over [x ‖ init-conv
    residual].  ResnetBlock = (conv→GN(8)→FiLM(scale+1,shift)→SiLU) ×2
    + 1×1 residual; linear attention = softmax(q over tokens) ·
    softmax(k over features) in the efficient-attention factorization.

  * `DDPMUNet` ← dynamic/diffusionmodules/unet_ddpm_lucidrains.py —
    the newer lucidrains DDPM variant (two skips per level, channel
    changes inside the resampling convs).

All expose `forward_with_cond_scale`-compatible calls (unconditional —
cond args accepted and ignored, like the reference's passthrough
`unet_vdm_lucidrain.py:291-292`).  The `VDMUNet` pairs with the
continuous 'vdm' sampler (diffusion/samplers/continuous.py): pass
log-SNR (or any float time) as `t`.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import timestep_embedding

__all__ = ["LatentFC", "VDMUNet", "DDPMUNet"]


_ACTS = {
    "none": lambda x: x,
    "relu": nn.relu,
    "lrelu": lambda x: nn.leaky_relu(x, 0.2),
    "silu": nn.silu,
    "tanh": jnp.tanh,
}


class _MLPLNAct(nn.Module):
    """latent_fc.py:151-226 MLPLNAct: linear → (×cond) → LN → act → drop."""

    out_channels: int
    norm: bool
    use_cond: bool
    activation: str
    condition_bias: float = 1.0
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, cond=None, train: bool = False):
        act = _ACTS[self.activation]
        # kaiming init for relu-family activations (latent_fc.py:187-203)
        kinit = (nn.initializers.kaiming_normal()
                 if self.activation in ("relu", "lrelu", "silu")
                 else nn.linear.default_kernel_init)
        x = nn.Dense(self.out_channels, kernel_init=kinit, name="linear")(x)
        if self.use_cond:
            c = nn.Dense(self.out_channels, kernel_init=kinit,
                         name="linear_emb")(act(cond))
            x = x * (self.condition_bias + c)
        if self.norm:
            x = nn.LayerNorm(name="norm")(x)
        x = act(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class LatentFC(nn.Module):
    """diffae latent-DPM MLP denoiser (latent_fc.py:63-148)."""

    num_layers: int = 10
    num_time_layers: int = 2
    num_channels: int = 2048
    num_time_emb_channels: int = 64
    model_channels: int = 512
    condition_bias: float = 1.0
    time_last_act: bool = False
    dropout: float = 0.0
    use_norm: bool = True
    activation: str = "silu"
    last_act: str = "none"

    @nn.compact
    def __call__(self, x, t, train: bool = False, **_ignored):
        act = _ACTS[self.activation]
        emb = timestep_embedding(t, self.num_time_emb_channels)
        for i in range(self.num_time_layers):
            emb = nn.Dense(self.num_channels, name=f"time_{i}")(emb)
            if i < self.num_time_layers - 1 or self.time_last_act:
                emb = act(emb)

        skip_layers = set(range(1, self.num_layers))
        h = x
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            if i in skip_layers:
                h = jnp.concatenate([h, x], axis=-1)
            h = _MLPLNAct(
                out_channels=(self.num_channels if last
                              else self.model_channels),
                norm=self.use_norm and not last,
                use_cond=not last,
                activation="none" if last else self.activation,
                condition_bias=self.condition_bias,
                dropout=0.0 if last else self.dropout,
                name=f"layer_{i}",
            )(h, emb, train)
        return _ACTS[self.last_act](h)


class _ChannelLayerNorm(nn.Module):
    """Per-channel LayerNorm with biased variance
    (unet_vdm_lucidrain.py:45-54)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = self.param("g", nn.initializers.ones, (c,), jnp.float32)
        b = self.param("b", nn.initializers.zeros, (c,), jnp.float32)
        mean = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * g + b


class _Block(nn.Module):
    """conv3×3 → GN(groups) → FiLM(scale+1, shift) → SiLU
    (unet_vdm_lucidrain.py:102-118)."""

    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = nn.Conv(self.dim_out, (3, 3), padding=1, name="proj")(x)
        x = nn.GroupNorm(num_groups=self.groups, name="norm")(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale[:, None, None, :] + 1) + shift[:, None, None, :]
        return nn.silu(x)


class _ResnetBlock(nn.Module):
    """unet_vdm_lucidrain.py:120-144."""

    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, t_emb):
        emb = nn.Dense(self.dim_out * 2, name="mlp")(nn.silu(t_emb))
        scale, shift = jnp.split(emb, 2, axis=-1)
        h = _Block(self.dim_out, self.groups, name="block1")(
            x, (scale, shift))
        h = _Block(self.dim_out, self.groups, name="block2")(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), name="res_conv")(x)
        return h + x


class _LinearAttention(nn.Module):
    """Efficient-attention factorization (unet_vdm_lucidrain.py:146-173):
    softmax over tokens for q, over features for k."""

    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        hid = self.heads * self.dim_head
        qkv = nn.Conv(hid * 3, (1, 1), use_bias=False, name="to_qkv")(x)
        qkv = qkv.reshape(b, hh * ww, 3, self.heads, self.dim_head)
        q, k, v = [qkv[:, :, i] for i in range(3)]  # [b, n, h, d]
        q = jax.nn.softmax(q, axis=-1) * self.dim_head ** -0.5
        k = jax.nn.softmax(k, axis=1)
        ctx = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bhde,bnhd->bnhe", ctx, q).reshape(b, hh, ww, hid)
        out = nn.Conv(c, (1, 1), name="to_out")(out)
        return _ChannelLayerNorm(name="out_norm")(out)


class _Attention(nn.Module):
    """Standard softmax attention (unet_vdm_lucidrain.py:175-196)."""

    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        hid = self.heads * self.dim_head
        qkv = nn.Conv(hid * 3, (1, 1), use_bias=False, name="to_qkv")(x)
        qkv = qkv.reshape(b, hh * ww, 3, self.heads, self.dim_head)
        q, k, v = [qkv[:, :, i] for i in range(3)]
        sim = jnp.einsum("bnhd,bmhd->bhnm", q * self.dim_head ** -0.5, k)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, hh, ww, hid)
        return nn.Conv(c, (1, 1), name="to_out")(out)


class _PreNormResidual(nn.Module):
    inner: Any

    @nn.compact
    def __call__(self, x):
        return x + self.inner(_ChannelLayerNorm(name="norm")(x))


class VDMUNet(nn.Module):
    """lucidrains denoising-diffusion UNet
    (unet_vdm_lucidrain.py:202-315)."""

    dim: int = 64
    init_dim: int | None = None
    out_dim: int | None = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 3
    resnet_block_groups: int = 8
    learned_variance: bool = False
    learned_sinusoidal_cond: bool = False
    learned_sinusoidal_dim: int = 16

    @nn.compact
    def __call__(self, x, t, **_ignored):
        init_dim = self.init_dim or self.dim
        x = nn.Conv(init_dim, (7, 7), padding=3, name="init_conv")(x)
        r = x

        # time embedding (learned-sinusoidal keeps the raw t as the +1
        # fourier feature, unet_vdm_lucidrain.py:83-100)
        tf = t.astype(jnp.float32)
        if self.learned_sinusoidal_cond:
            w = self.param(
                "sinu_weights", nn.initializers.normal(1.0),
                (self.learned_sinusoidal_dim // 2,), jnp.float32)
            freqs = tf[:, None] * w[None] * 2 * math.pi
            emb = jnp.concatenate(
                [tf[:, None], jnp.sin(freqs), jnp.cos(freqs)], axis=-1)
        else:
            emb = timestep_embedding(tf, self.dim)
        time_dim = self.dim * 4
        emb = nn.Dense(time_dim, name="time_mlp1")(emb)
        emb = nn.gelu(emb)
        emb = nn.Dense(time_dim, name="time_mlp2")(emb)

        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        g = self.resnet_block_groups

        hs = []
        for i, (_, dim_out) in enumerate(in_out):
            last = i == len(in_out) - 1
            x = _ResnetBlock(dim_out, g, name=f"down_{i}_b1")(x, emb)
            x = _ResnetBlock(dim_out, g, name=f"down_{i}_b2")(x, emb)
            x = _PreNormResidual(
                _LinearAttention(), name=f"down_{i}_attn")(x)
            hs.append(x)
            if not last:
                x = nn.Conv(dim_out, (4, 4), strides=(2, 2), padding=1,
                            name=f"down_{i}_ds")(x)

        mid = dims[-1]
        x = _ResnetBlock(mid, g, name="mid_b1")(x, emb)
        x = _PreNormResidual(_Attention(), name="mid_attn")(x)
        x = _ResnetBlock(mid, g, name="mid_b2")(x, emb)

        for i, (dim_in, dim_out) in enumerate(reversed(in_out)):
            last = i == len(in_out) - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = _ResnetBlock(dim_in, g, name=f"up_{i}_b1")(x, emb)
            x = _ResnetBlock(dim_in, g, name=f"up_{i}_b2")(x, emb)
            x = _PreNormResidual(
                _LinearAttention(), name=f"up_{i}_attn")(x)
            if not last:
                # SAME ≡ torch ConvTranspose2d(k=4, s=2, p=1): out = 2·in
                x = nn.ConvTranspose(
                    dim_in, (4, 4), strides=(2, 2), padding="SAME",
                    name=f"up_{i}_us")(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = _ResnetBlock(self.dim, g, name="final_res")(x, emb)
        out_dim = self.out_dim or self.channels * (
            2 if self.learned_variance else 1)
        return nn.Conv(out_dim, (1, 1), name="final_conv")(x)

    def forward_with_cond_scale(self, x, t, cond_scale=None, **kwargs):
        """Unconditional passthrough (unet_vdm_lucidrain.py:291-292)."""
        return self(x, t, **kwargs)


class DDPMUNet(nn.Module):
    """lucidrains DDPM UNet variant (unet_ddpm_lucidrains.py): per-level
    channels stay at dim_in with TWO skip connections pushed per level
    (after block1 and after attn), channel changes happen inside the
    4×4/2 down conv (3×3 on the last level) and the nearest-up + 3×3
    conv (3×3 on the last level); up blocks each consume a
    [x ‖ skip] concat."""

    dim: int = 64
    init_dim: int | None = None
    out_dim: int | None = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 3
    resnet_block_groups: int = 8
    learned_variance: bool = False

    @nn.compact
    def __call__(self, x, t, **_ignored):
        init_dim = self.init_dim or self.dim
        x = nn.Conv(init_dim, (7, 7), padding=3, name="init_conv")(x)
        r = x
        emb = timestep_embedding(t.astype(jnp.float32), self.dim)
        time_dim = self.dim * 4
        emb = nn.Dense(time_dim, name="time_mlp1")(emb)
        emb = nn.gelu(emb)
        emb = nn.Dense(time_dim, name="time_mlp2")(emb)

        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        g = self.resnet_block_groups

        hs = []
        for i, (dim_in, dim_out) in enumerate(in_out):
            last = i == len(in_out) - 1
            x = _ResnetBlock(dim_in, g, name=f"down_{i}_b1")(x, emb)
            hs.append(x)
            x = _ResnetBlock(dim_in, g, name=f"down_{i}_b2")(x, emb)
            x = _PreNormResidual(
                _LinearAttention(), name=f"down_{i}_attn")(x)
            hs.append(x)
            if not last:
                x = nn.Conv(dim_out, (4, 4), strides=(2, 2), padding=1,
                            name=f"down_{i}_ds")(x)
            else:
                x = nn.Conv(dim_out, (3, 3), padding=1,
                            name=f"down_{i}_ds")(x)

        mid = dims[-1]
        x = _ResnetBlock(mid, g, name="mid_b1")(x, emb)
        x = _PreNormResidual(_Attention(), name="mid_attn")(x)
        x = _ResnetBlock(mid, g, name="mid_b2")(x, emb)

        for i, (dim_in, dim_out) in enumerate(reversed(in_out)):
            last = i == len(in_out) - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = _ResnetBlock(dim_out, g, name=f"up_{i}_b1")(x, emb)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = _ResnetBlock(dim_out, g, name=f"up_{i}_b2")(x, emb)
            x = _PreNormResidual(
                _LinearAttention(), name=f"up_{i}_attn")(x)
            if not last:
                from .layers import upsample_nearest2x

                x = upsample_nearest2x(x)
                x = nn.Conv(dim_in, (3, 3), padding=1,
                            name=f"up_{i}_us")(x)
            else:
                x = nn.Conv(dim_in, (3, 3), padding=1,
                            name=f"up_{i}_us")(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = _ResnetBlock(self.dim, g, name="final_res")(x, emb)
        out_dim = self.out_dim or self.channels * (
            2 if self.learned_variance else 1)
        return nn.Conv(out_dim, (1, 1), name="final_conv")(x)

    def forward_with_cond_scale(self, x, t, cond_scale=None, **kwargs):
        return self(x, t, **kwargs)
