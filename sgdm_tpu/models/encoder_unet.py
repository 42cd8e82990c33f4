"""Encoder-half UNet for noisy-image classification (classifier guidance).

TPU-native rewrite of `dynamic/diffusionmodules/openaimodel.py:977+
EncoderUNetModel` and the `diffusion/classifier.py NoisyLatentImageClassifier`
it powers (an unused-by-default extra in the reference, SURVEY.md §2.3):
the UNet's downsampling trunk + middle block, then a pooling head
(adaptive/attention/spatial) to class logits, conditioned on the diffusion
timestep — trainable on q_sample'd noisy inputs for classifier guidance.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    Downsample,
    GroupNorm32,
    ResBlock,
    SelfAttentionBlock,
    timestep_embedding,
)

__all__ = ["EncoderUNetModel"]


class EncoderUNetModel(nn.Module):
    num_classes: int = 1000
    model_channels: int = 128
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4,)
    channel_mult: Sequence[int] = (1, 2, 4)
    dropout: float = 0.0
    num_heads: int = 8
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    pool: str = "adaptive"  # adaptive | spatial
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array, train: bool = False) -> jax.Array:
        mc = self.model_channels
        emb = nn.Dense(4 * mc, dtype=self.dtype, name="time_embed_1")(
            timestep_embedding(t, mc).astype(self.dtype)
        )
        emb = nn.Dense(4 * mc, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))

        common = dict(dropout=self.dropout,
                      use_scale_shift_norm=self.use_scale_shift_norm,
                      dtype=self.dtype)
        h = nn.Conv(mc, (3, 3), padding=1, dtype=self.dtype, name="in_conv")(
            x.astype(self.dtype)
        )
        # spatial pooling collects the per-INPUT-BLOCK spatial means
        # (openaimodel.py:1181-1190: one mean after the stem, after every
        # res(+attn) block, after every downsample, plus the middle block)
        pools = [h.mean(axis=(1, 2))]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = ResBlock(out_channels=mult * mc, **common,
                             name=f"down_{level}_{i}")(h, emb, train)
                if ds in self.attention_resolutions:
                    h = SelfAttentionBlock(
                        num_heads=self.num_heads, dtype=self.dtype,
                        name=f"down_attn_{level}_{i}",
                    )(h)
                pools.append(h.mean(axis=(1, 2)))
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = ResBlock(out_channels=h.shape[-1], down=True, **common,
                                 name=f"downsample_{level}")(h, emb, train)
                else:
                    h = Downsample(dtype=self.dtype,
                                   name=f"downsample_{level}")(h)
                pools.append(h.mean(axis=(1, 2)))
                ds *= 2

        h = ResBlock(**common, name="mid_res1")(h, emb, train)
        h = SelfAttentionBlock(num_heads=self.num_heads, dtype=self.dtype,
                               name="mid_attn")(h)
        h = ResBlock(**common, name="mid_res2")(h, emb, train)

        if self.pool == "adaptive":
            h = GroupNorm32(name="out_norm")(h, silu=True)
            h = h.mean(axis=(1, 2))
            # zero-init head: logits start at exactly 0 like the
            # reference's zero_module(conv_nd) (openaimodel.py adaptive out)
            logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                              kernel_init=nn.initializers.zeros,
                              name="out")(h.astype(jnp.float32))
        elif self.pool == "spatial":
            pools.append(h.mean(axis=(1, 2)))
            h = jnp.concatenate(pools, axis=-1)  # [B, _feature_size]
            h = nn.Dense(2048, dtype=self.dtype, name="spatial_fc")(h)
            logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                              name="out")(nn.relu(h).astype(jnp.float32))
        else:
            raise ValueError(self.pool)
        return logits
