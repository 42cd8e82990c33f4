"""MAE pre-training (Masked Autoencoder, He et al. 2021) in JAX/Flax.

TPU-native rewrite of the vendored MAE stack the reference uses to pre-train
SSL backbones offline (`self_sl/mae/main_pretrain.py:107` +
`models_mae.py`): ViT encoder over the ~25% visible patches, narrow ViT
decoder with mask tokens, per-patch-normalized pixel reconstruction loss on
the masked patches only.  The trained encoder drops straight into
`selfsup.ssl_backbone.SSLBackbone` for feature extraction.

Design notes (TPU): masking uses argsort of per-patch uniform noise (the
official shuffle trick) — static shapes throughout, so the whole train step
jits; the encoder reuses `models.vit.Block`.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.vit import Block, interpolate_pos_embed

__all__ = ["MAE", "mae_loss", "make_mae_train_step"]


class MAE(nn.Module):
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    decoder_dim: int = 256
    decoder_depth: int = 4
    decoder_heads: int = 8
    mask_ratio: float = 0.75
    pretrain_img_size: int = 224
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, rng: jax.Array):
        """x [B,H,W,3] → (pred [B,N,p²·3], target [B,N,p²·3], mask [B,N])."""
        b, hh, ww, _ = x.shape
        p = self.patch_size
        gh, gw = hh // p, ww // p
        n = gh * gw
        n_keep = max(int(n * (1 - self.mask_ratio)), 1)

        # patchify target (per-patch pixels)
        target = x.reshape(b, gh, p, gw, p, 3).transpose(0, 1, 3, 2, 4, 5)
        target = target.reshape(b, n, p * p * 3)
        # per-patch normalization (official norm_pix_loss)
        mu = target.mean(-1, keepdims=True)
        var = target.var(-1, keepdims=True)
        target_n = (target - mu) / jnp.sqrt(var + 1e-6)

        # embed + pos
        tokens = nn.Conv(self.embed_dim, (p, p), strides=(p, p),
                         dtype=self.dtype, name="patch_embed")(x)
        tokens = tokens.reshape(b, n, self.embed_dim)
        g0 = self.pretrain_img_size // p
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + g0 * g0, self.embed_dim))
        pos = interpolate_pos_embed(pos, (gh, gw))
        tokens = tokens + pos[:, 1:]

        # random masking: keep the first n_keep of a random permutation
        noise = jax.random.uniform(rng, (b, n))
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :n_keep]
        visible = jnp.take_along_axis(
            tokens, ids_keep[..., None], axis=1
        )  # [B, n_keep, D]
        mask = jnp.ones((b, n))
        mask = mask.at[:, :n_keep].set(0.0)
        mask = jnp.take_along_axis(mask, ids_restore, axis=1)  # 1 = masked

        # encoder (CLS prepended)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim)) + pos[:, :1]
        h = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.embed_dim)), visible], axis=1
        )
        for i in range(self.depth):
            h, _ = Block(self.num_heads, dtype=self.dtype, name=f"blocks_{i}")(h)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h)

        # decoder
        d = nn.Dense(self.decoder_dim, dtype=self.dtype, name="decoder_embed")(h)
        mask_token = self.param("mask_token", nn.initializers.normal(0.02),
                                (1, 1, self.decoder_dim))
        dec_tokens = jnp.broadcast_to(
            mask_token, (b, n, self.decoder_dim)
        )
        # scatter visible decoder tokens back to their positions
        dec_tokens = dec_tokens.at[
            jnp.arange(b)[:, None], ids_keep
        ].set(d[:, 1:])
        dec_pos = self.param("decoder_pos_embed", nn.initializers.normal(0.02),
                             (1, g0 * g0, self.decoder_dim))
        dec_pos = interpolate_pos_embed(
            jnp.concatenate([jnp.zeros_like(dec_pos[:, :1]), dec_pos], axis=1),
            (gh, gw),
        )[:, 1:]
        dh = jnp.concatenate([d[:, :1], dec_tokens + dec_pos], axis=1)
        for i in range(self.decoder_depth):
            dh, _ = Block(self.decoder_heads, dtype=self.dtype,
                          name=f"decoder_blocks_{i}")(dh)
        dh = nn.LayerNorm(epsilon=1e-6, name="decoder_norm")(dh)
        pred = nn.Dense(p * p * 3, dtype=jnp.float32, name="decoder_pred")(
            dh[:, 1:]
        )
        return pred, target_n, mask

    def encoder_params_for_backbone(self, params: dict) -> dict:
        """Extract the encoder subtree in VisionTransformer layout so the
        pretrained trunk plugs into SSLBackbone/feat extraction."""
        out = {
            "cls_token": params["cls_token"],
            "pos_embed": params["pos_embed"],
            "patch_embed": params["patch_embed"],
            "norm": params["norm"],
        }
        for k, v in params.items():
            if k.startswith("blocks_"):
                out[k] = v
        return out


def mae_loss(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    """MSE on masked patches only (official MAE loss)."""
    per_patch = ((pred - target) ** 2).mean(-1)
    return (per_patch * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def make_mae_train_step(model: MAE, tx):
    import optax

    @jax.jit
    def step(params, opt_state, x, rng):
        def loss_fn(params):
            pred, target, mask = model.apply({"params": params}, x, rng)
            return mae_loss(pred, target, mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
