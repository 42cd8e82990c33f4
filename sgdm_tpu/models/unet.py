"""ADM-style UNet denoisers (concat-cond and cross-attention variants).

TPU-native rewrite of the reference's two denoiser families:

  * `UNetModel` ← `dynamic/diffusionmodules/openaimodel.py:466-976`
    (concat-conditioning: cond → 2-layer MLP → CONCATENATED onto the time
    embedding :941-942; zero null embedding :598-600; optional layout
    channel-concat for `clusterlayout` :623-630,933-939).
  * `UNetCAModel` ← `dynamic/diffusionmodules/openaimodel_ca.py:449-1031`
    (Imagen-style context tokens: 8 time tokens + 8 cond tokens feeding
    `AttentionLR` null-KV attention; pooled cond added to the time embedding;
    `cond_token_num` ∈ {0, 1, >1} branches :944-1012).

Both share one `UNetBackbone` (the construction loops at openaimodel.py:
640-838): per-level ResBlocks with attention at `ds ∈ attention_resolutions`,
resblock_updown or plain resampling, skip-concat decoder, zero-init output
conv.

Layout: NHWC.  The condition-drop Bernoulli mask is an explicit boolean
input (`cond_drop_mask` [B], True = drop) — see `diffusion.guidance`.
Null embeddings are frozen zeros in the reference, so "dropping" is plain
masking with zeros here.  Models return eps only (the reference returns a
`(out, 0.0, {})` 3-tuple whose extras are always trivial, openaimodel.py:
954-956).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention_lr import AttentionLR
from .layers import (
    Downsample,
    GroupNorm32,
    ResBlock,
    SelfAttentionBlock,
    Upsample,
    timestep_embedding,
    zeros_init,
)

__all__ = ["UNetBackbone", "UNetModel", "UNetCAModel"]


def _conv_remat(use_checkpoint):
    """Backbone constructor for the selective-remat mode.

    `use_checkpoint == "conv"`: the WHOLE backbone is rematerialized with a
    policy that saves only the 'rb_conv'-tagged MXU outputs (every conv in
    layers.ResBlock + the attention qkv/proj projections).  The backward
    pass then recomputes just the cheap memory-bound chains — GroupNorm,
    FiLM, SiLU, dropout masks, skip concats — while convolutions and
    attention matmuls never re-execute.  On the IN64 flagship (bs=256,
    16 GB HBM) this keeps the step inside HBM; without it XLA host-offloads
    the optimizer update and streams f32 state at PCIe speed.
    """
    if use_checkpoint == "conv":
        return nn.remat(
            UNetBackbone,
            static_argnums=(4,),  # (self, x, emb, context, train)
            policy=jax.checkpoint_policies.save_only_these_names("rb_conv"),
        )
    return UNetBackbone


def _mask_cond(cond: jax.Array, mask: jax.Array) -> jax.Array:
    """Replace dropped samples' condition with the (zero) null embedding."""
    shape = (-1,) + (1,) * (cond.ndim - 1)
    return jnp.where(mask.reshape(shape), jnp.zeros_like(cond), cond)


class UNetBackbone(nn.Module):
    """Shared encoder/middle/decoder trunk.

    Parity: openaimodel.py:640-838 (and identical loops in openaimodel_ca.py
    with AttentionLR substituted when `use_ca_block`).
    """

    model_channels: int = 128
    out_channels: int = 3
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4,)
    channel_mult: Sequence[int] = (1, 2, 4)
    dropout: float = 0.0
    num_heads: int = 8
    num_head_channels: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = False
    conv_resample: bool = True
    use_ca_block: bool = False
    context_dim: int | None = None
    use_checkpoint: bool | str = False  # False | True (full) | "conv" (selective)
    use_pallas: bool | str = False
    flash_attention: bool | None = None  # False: no Pallas attention (TP/FSDP)
    dtype: Any = jnp.float32

    def _attn(self, ch: int, name: str):
        if self.use_ca_block:
            if self.num_head_channels == -1:
                dim_head = ch // self.num_heads
                heads = self.num_heads
            else:
                heads = ch // self.num_head_channels
                dim_head = self.num_head_channels
            return AttentionLR(
                heads=heads, dim_head=dim_head, context_dim=self.context_dim,
                use_pallas=self.use_pallas, dtype=self.dtype, name=name,
            )
        return SelfAttentionBlock(
            num_heads=self.num_heads, num_head_channels=self.num_head_channels,
            use_pallas=self.use_pallas, flash_attention=self.flash_attention,
            dtype=self.dtype, name=name,
        )

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        emb: jax.Array,
        context: jax.Array | None = None,
        train: bool = False,
    ) -> jax.Array:
        # use_checkpoint: False = no remat; "conv" = selective remat (the
        # models wrap the WHOLE backbone in nn.remat with a policy that
        # saves only the tagged MXU outputs — see _conv_remat below — so
        # this trunk builds plain blocks); True = full per-ResBlock remat
        # (recomputes convs too — maximum memory savings, for very large
        # batches).
        if self.use_checkpoint is True:
            Res = nn.remat(ResBlock, static_argnums=(3,))
        else:
            Res = ResBlock
        mc = self.model_channels
        common = dict(
            dropout=self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
        )

        def attn_apply(h, name):
            blk = self._attn(h.shape[-1], name)
            return blk(h, context) if self.use_ca_block else blk(h)

        h = nn.Conv(mc, (3, 3), padding=1, dtype=self.dtype, name="in_conv")(x)
        hs = [h]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = Res(
                    out_channels=mult * mc, **common, name=f"down_{level}_{i}"
                )(h, emb, train)
                if ds in self.attention_resolutions:
                    h = attn_apply(h, f"down_attn_{level}_{i}")
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = Res(
                        out_channels=h.shape[-1], down=True, **common,
                        name=f"downsample_{level}",
                    )(h, emb, train)
                else:
                    h = Downsample(
                        use_conv=self.conv_resample, dtype=self.dtype,
                        name=f"downsample_{level}",
                    )(h)
                hs.append(h)
                ds *= 2

        h = Res(**common, name="mid_res1")(h, emb, train)
        h = attn_apply(h, "mid_attn")
        h = Res(**common, name="mid_res2")(h, emb, train)

        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = Res(out_channels=mult * mc, **common, name=f"up_{level}_{i}")(
                    h, emb, train
                )
                if ds in self.attention_resolutions:
                    h = attn_apply(h, f"up_attn_{level}_{i}")
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = Res(
                            out_channels=h.shape[-1], up=True, **common,
                            name=f"upsample_{level}",
                        )(h, emb, train)
                    else:
                        h = Upsample(
                            use_conv=self.conv_resample, dtype=self.dtype,
                            name=f"upsample_{level}",
                        )(h)
                    ds //= 2
        assert not hs

        h = GroupNorm32()(h)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=jnp.float32,
            kernel_init=zeros_init, name="out_conv",
        )(h.astype(jnp.float32))
        return h


class UNetModel(nn.Module):
    """Concat-conditioning UNet (`dynamic=unet_fast` family).

    Parity: openaimodel.py:466-976.  `cond` [B, cond_dim] (one-hot / feature),
    masked cond goes through a 2-layer MLP to `2*model_channels` and is
    concatenated to the 4*mc time embedding (:941-942), feeding every
    ResBlock FiLM.  `condition_method='clusterlayout'` additionally channel-
    concats a (masked) layout map onto x (:933-939).
    """

    model_channels: int = 128
    out_channels: int = 3
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4,)
    channel_mult: Sequence[int] = (1, 2, 4)
    dropout: float = 0.0
    num_heads: int = 8
    num_head_channels: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    cond_dim: int = 0
    condition_method: str | None = None
    lookup_table_size: int = 0  # cluster_lookup: learned per-image table
    use_checkpoint: bool | str = False  # False | True (full) | "conv" (selective)
    use_pallas: bool | str = False
    flash_attention: bool | None = None  # False: no Pallas attention (TP/FSDP)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        t: jax.Array,
        cond: jax.Array | None = None,
        layout: jax.Array | None = None,
        cond_drop_mask: jax.Array | None = None,
        image_batch_ids: jax.Array | None = None,
        train: bool = False,
    ) -> jax.Array:
        b = x.shape[0]
        mc = self.model_channels
        if cond_drop_mask is None:
            cond_drop_mask = jnp.zeros((b,), dtype=bool)

        if self.condition_method == "cluster_lookup":
            # learned per-image condition table indexed by dataset ids
            # (openaimodel.py:581-597 rebuttal feature; the reference sizes
            # the Embedding absurdly large — here it's the dataset length)
            assert image_batch_ids is not None
            table = nn.Embed(self.lookup_table_size, self.cond_dim,
                             name="lookup_table")
            cond = table(image_batch_ids.astype(jnp.int32))

        t_emb = timestep_embedding(t, mc)
        emb = nn.Dense(4 * mc, dtype=self.dtype, name="time_embed_1")(t_emb.astype(self.dtype))
        emb = nn.Dense(4 * mc, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))

        if self.cond_dim > 0:
            assert cond is not None and cond.shape == (b, self.cond_dim)
            cond_masked = _mask_cond(cond.astype(emb.dtype), cond_drop_mask)
            if self.condition_method == "clusterlayout":
                assert layout is not None
                layout_masked = _mask_cond(layout.astype(x.dtype), cond_drop_mask)
                x = jnp.concatenate([x, layout_masked], axis=-1)
            # mlp_cond → time_embed_dim // 2 (openaimodel.py:601-612)
            c = nn.Dense(2 * mc, dtype=self.dtype, name="mlp_cond_1")(cond_masked)
            c = nn.Dense(2 * mc, dtype=self.dtype, name="mlp_cond_2")(nn.silu(c))
            emb = jnp.concatenate([emb, c], axis=-1)

        return _conv_remat(self.use_checkpoint)(
            model_channels=mc,
            out_channels=self.out_channels,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=tuple(self.attention_resolutions),
            channel_mult=tuple(self.channel_mult),
            dropout=self.dropout,
            num_heads=self.num_heads,
            num_head_channels=self.num_head_channels,
            use_scale_shift_norm=self.use_scale_shift_norm,
            resblock_updown=self.resblock_updown,
            use_ca_block=False,
            use_checkpoint=False if self.use_checkpoint == "conv" else self.use_checkpoint,
            use_pallas=self.use_pallas,
            flash_attention=self.flash_attention,
            dtype=self.dtype,
            name="backbone",
        )(x.astype(self.dtype), emb, None, train)


class UNetCAModel(nn.Module):
    """Cross-attention UNet (`dynamic=unetca_fast` family).

    Parity: openaimodel_ca.py:449-1031.  Context = LayerNorm(concat(8 time
    tokens, 8 cond tokens)); pooled cond via `cond_mlp` added to the time
    embedding; `cond_token_num` branches: 0 = layout-only channel concat,
    1 = [B, cond_dim] vector cond, >1 = [B, T, cond_dim] token cond with
    CLS-or-mean pooling.
    """

    model_channels: int = 128
    out_channels: int = 3
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4,)
    channel_mult: Sequence[int] = (1, 2, 4)
    dropout: float = 0.0
    num_heads: int = 8
    num_head_channels: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = False
    cond_dim: int = 0
    cond_token_num: int = 0
    context_dim: int = 32
    num_time_tokens: int = 8
    num_cond_tokens: int = 8
    use_cls_token_as_pooled: bool = True
    condition_method: str | None = None
    use_checkpoint: bool | str = False  # False | True (full) | "conv" (selective)
    use_pallas: bool | str = False
    flash_attention: bool | None = None  # False: no Pallas attention (TP/FSDP)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        t: jax.Array,
        cond: jax.Array | None = None,
        layout: jax.Array | None = None,
        cond_drop_mask: jax.Array | None = None,
        train: bool = False,
    ) -> jax.Array:
        b = x.shape[0]
        mc = self.model_channels
        if cond_drop_mask is None:
            cond_drop_mask = jnp.zeros((b,), dtype=bool)

        t_emb = timestep_embedding(t, mc).astype(self.dtype)
        emb = nn.Dense(4 * mc, dtype=self.dtype, name="time_embed_1")(t_emb)
        emb = nn.Dense(4 * mc, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))

        # to_time_tokens (openaimodel_ca.py:586-591)
        tt = nn.Dense(mc, dtype=self.dtype, name="to_time_tokens_1")(t_emb)
        tt = nn.Dense(
            self.context_dim * self.num_time_tokens, dtype=self.dtype,
            name="to_time_tokens_2",
        )(nn.silu(tt))
        time_tokens = tt.reshape(b, self.num_time_tokens, self.context_dim)

        def concat_layout(x):
            assert layout is not None
            layout_masked = _mask_cond(layout.astype(x.dtype), cond_drop_mask)
            return jnp.concatenate([x, layout_masked], axis=-1)

        if self.cond_token_num == 0:
            context = time_tokens
            if self.condition_method == "layout":
                x = concat_layout(x)
        elif self.cond_token_num == 1:
            assert cond is not None and cond.ndim == 2
            cond_masked = _mask_cond(cond.astype(self.dtype), cond_drop_mask)
            ct = nn.Dense(
                self.context_dim * self.num_cond_tokens, dtype=self.dtype,
                name="to_cond_tokens",
            )(cond_masked)
            cond_tokens = ct.reshape(b, self.num_cond_tokens, self.context_dim)
            context = jnp.concatenate([time_tokens, cond_tokens], axis=1)
            c = nn.Dense(4 * mc, dtype=self.dtype, name="cond_mlp_1")(cond_masked)
            c = nn.Dense(4 * mc, dtype=self.dtype, name="cond_mlp_2")(nn.silu(c))
            emb = emb + c
            if self.condition_method in ("clusterlayout", "stegoclusterlayout"):
                x = concat_layout(x)
        else:
            assert cond is not None and cond.ndim == 3
            cond_masked = _mask_cond(cond.astype(self.dtype), cond_drop_mask)
            # to_cond_tokens_2d: 4-layer MLP per token (openaimodel_ca.py:605-614)
            mid = int((self.context_dim * self.cond_dim) ** 0.5)
            h = nn.Dense(mid, dtype=self.dtype, name="to_cond_tokens_2d_1")(cond_masked)
            h = nn.Dense(mid, dtype=self.dtype, name="to_cond_tokens_2d_2")(nn.silu(h))
            h = nn.Dense(mid, dtype=self.dtype, name="to_cond_tokens_2d_3")(nn.silu(h))
            cond_tokens = nn.Dense(
                self.context_dim, dtype=self.dtype, name="to_cond_tokens_2d_4"
            )(nn.silu(h))
            context = jnp.concatenate([time_tokens, cond_tokens], axis=1)
            if self.use_cls_token_as_pooled:
                pooled = cond_masked[:, 0, :]
            else:
                pooled = cond_masked.mean(axis=1)
            c = nn.Dense(4 * mc, dtype=self.dtype, name="cond_mlp_1")(pooled)
            c = nn.Dense(4 * mc, dtype=self.dtype, name="cond_mlp_2")(nn.silu(c))
            emb = emb + c

        context = nn.LayerNorm(dtype=jnp.float32, name="norm_cond")(context)

        return _conv_remat(self.use_checkpoint)(
            model_channels=mc,
            out_channels=self.out_channels,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=tuple(self.attention_resolutions),
            channel_mult=tuple(self.channel_mult),
            dropout=self.dropout,
            num_heads=self.num_heads,
            num_head_channels=self.num_head_channels,
            use_scale_shift_norm=self.use_scale_shift_norm,
            resblock_updown=self.resblock_updown,
            use_ca_block=True,
            context_dim=self.context_dim,
            use_checkpoint=False if self.use_checkpoint == "conv" else self.use_checkpoint,
            use_pallas=self.use_pallas,
            flash_attention=self.flash_attention,
            dtype=self.dtype,
            name="backbone",
        )(x.astype(self.dtype), emb, context.astype(self.dtype), train)
