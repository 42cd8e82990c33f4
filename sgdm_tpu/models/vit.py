"""Vision Transformer (DINO flavor) in Flax — the SSL backbone.

TPU-native rewrite of the backbone the reference pulls from torch.hub
(`self_sl/ssl_backbone.py:91-127` DINO ViT-S/B 8/16; the same network backs
LOST's qkv hook, `side_repo/LOST/sg_main_lost.py:248-290`, and STEGO's
DinoFeaturizer, `side_repo/STEGO/src/modules.py:17-126`).

Features:
  * standard DINO ViT: conv patch embed, CLS token, learned pos embed with
    bicubic interpolation for off-grid input sizes, pre-LN blocks,
  * `__call__(..., out="cls")` → CLS feature (feat-extractor contract:
    `batch_encode_feat` CLS token, ssl_backbone.py:173-178),
  * `out="qkv_last"` → per-head q/k/v of the LAST block (LOST consumes the
    key features; networks.py hook parity),
  * `out="tokens"` → all final tokens (STEGO featurizer),
  * `load_dino_torch_weights` maps the torch.hub state dict (OIHW conv,
    fused qkv linear) onto this module.

Presets: vit_small (384d/6h/12L), vit_base (768d/12h/12L) at patch 16 or 8.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["VisionTransformer", "vit_small", "vit_base",
           "load_dino_torch_weights", "interpolate_pos_embed"]


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class Attention(nn.Module):
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_qkv: bool = False):
        b, n, c = x.shape
        h = self.num_heads
        d = c // h
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, d).transpose(2, 0, 3, 1, 4)  # [3,b,h,n,d]
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * (d ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        if return_qkv:
            return out, (q, k, v, attn)
        return out, None


class Block(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32
    drop_path: float = 0.0  # stochastic depth (timm DropPath; finetune only)

    def _drop_path(self, y, deterministic):
        if self.drop_path == 0.0 or deterministic:
            return y
        keep = 1.0 - self.drop_path
        mask = jax.random.bernoulli(
            self.make_rng("drop_path"), keep, (y.shape[0], 1, 1))
        return y * mask.astype(y.dtype) / keep

    @nn.compact
    def __call__(self, x, return_qkv: bool = False,
                 deterministic: bool = True):
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        y, qkv = Attention(self.num_heads, self.dtype, name="attn")(y, return_qkv)
        x = x + self._drop_path(y, deterministic)
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        c = x.shape[-1]
        y = Mlp(int(c * self.mlp_ratio), c, self.dtype, name="mlp")(y)
        x = x + self._drop_path(y, deterministic)
        return x, qkv


def interpolate_pos_embed(pos_embed: jax.Array, grid_hw: tuple[int, int]) -> jax.Array:
    """[1, 1+N0, C] → [1, 1+h*w, C] with bicubic patch-grid interpolation
    (DINO interpolate_pos_encoding parity)."""
    cls_pe, patch_pe = pos_embed[:, :1], pos_embed[:, 1:]
    n0 = patch_pe.shape[1]
    g0 = int(round(n0 ** 0.5))
    h, w = grid_hw
    if (g0, g0) == (h, w):
        return pos_embed
    patch = patch_pe.reshape(1, g0, g0, -1)
    patch = jax.image.resize(patch, (1, h, w, patch.shape[-1]), method="cubic")
    return jnp.concatenate([cls_pe, patch.reshape(1, h * w, -1)], axis=1)


class VisionTransformer(nn.Module):
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    pretrain_img_size: int = 224  # grid the pos_embed param is stored at
    dtype: Any = jnp.float32
    # linearly-ramped stochastic depth across blocks (timm dpr = linspace);
    # 0.0 (default) is exactly the original network — used by MAE finetuning
    # (self_sl/mae/main_finetune.py:57 --drop_path)
    drop_path_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, out: str = "cls",
                 patch_keep_ids: jax.Array | None = None,
                 deterministic: bool = True):
        """x: [B,H,W,3] normalized (imagenet stats).  out ∈ {cls, tokens,
        tokens_pair, qkv_last, attn_last}; ``tokens_pair`` returns
        (pre-final-norm tokens, normed tokens) — the MAE finetune
        global-pool head pools PRE-norm patch tokens (models_vit.py
        global_pool branch).  ``patch_keep_ids`` [B, n_keep] selects a
        subset of patch tokens to process (MSN anchor patch_drop,
        self_sl/msn/src/deit.py forward patch_drop)."""
        b, hh, ww, _ = x.shape
        p = self.patch_size
        gh, gw = hh // p, ww // p
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), dtype=self.dtype,
                    name="patch_embed")(x)
        x = x.reshape(b, gh * gw, self.embed_dim)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim))
        g0 = self.pretrain_img_size // p
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + g0 * g0, self.embed_dim))
        # params stored at the checkpoint grid; interpolate at apply time
        pos = interpolate_pos_embed(pos, (gh, gw))
        if patch_keep_ids is not None:
            x = x + pos[:, 1:]
            x = jnp.take_along_axis(x, patch_keep_ids[..., None], axis=1)
            x = jnp.concatenate(
                [jnp.broadcast_to(cls + pos[:, :1], (b, 1, self.embed_dim)), x],
                axis=1,
            )
        else:
            x = jnp.concatenate(
                [jnp.broadcast_to(cls, (b, 1, self.embed_dim)), x], axis=1
            ) + pos

        qkv_last = None
        for i in range(self.depth):
            want_qkv = (i == self.depth - 1) and out in ("qkv_last", "attn_last")
            dp = (self.drop_path_rate * i / max(self.depth - 1, 1))
            x, qkv = Block(self.num_heads, self.mlp_ratio, self.dtype,
                           drop_path=dp, name=f"blocks_{i}")(
                x, return_qkv=want_qkv, deterministic=deterministic)
            if qkv is not None:
                qkv_last = qkv
        pre_norm = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)

        if out == "cls":
            return x[:, 0]
        if out == "tokens":
            return x
        if out == "tokens_pair":
            return pre_norm, x
        if out == "qkv_last":
            q, k, v, _ = qkv_last
            return x, (q, k, v)
        if out == "attn_last":
            return qkv_last[3]
        raise ValueError(out)

    @property
    def feat_dim(self) -> int:
        return self.embed_dim


def vit_small(patch_size: int = 16, **kw) -> VisionTransformer:
    return VisionTransformer(patch_size=patch_size, embed_dim=384, depth=12,
                             num_heads=6, **kw)


def vit_base(patch_size: int = 16, **kw) -> VisionTransformer:
    return VisionTransformer(patch_size=patch_size, embed_dim=768, depth=12,
                             num_heads=12, **kw)


# ----------------------------------------------------------------------

def load_dino_torch_weights(path: str) -> dict:
    """Map a torch.hub DINO state dict onto VisionTransformer params."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.replace("module.", ""): v for k, v in sd.items()}

    def t(key):
        return sd[key].numpy()

    params: dict = {
        "cls_token": jnp.asarray(t("cls_token")),
        "pos_embed": jnp.asarray(t("pos_embed")),
        "patch_embed": {
            "kernel": jnp.asarray(
                t("patch_embed.proj.weight").transpose(2, 3, 1, 0)
            ),
            "bias": jnp.asarray(t("patch_embed.proj.bias")),
        },
        "norm": {
            "scale": jnp.asarray(t("norm.weight")),
            "bias": jnp.asarray(t("norm.bias")),
        },
    }
    depth = max(
        int(k.split(".")[1]) for k in sd if k.startswith("blocks.")
    ) + 1
    for i in range(depth):
        pre = f"blocks.{i}"
        params[f"blocks_{i}"] = {
            "norm1": {"scale": jnp.asarray(t(f"{pre}.norm1.weight")),
                      "bias": jnp.asarray(t(f"{pre}.norm1.bias"))},
            "norm2": {"scale": jnp.asarray(t(f"{pre}.norm2.weight")),
                      "bias": jnp.asarray(t(f"{pre}.norm2.bias"))},
            "attn": {
                "qkv": {"kernel": jnp.asarray(t(f"{pre}.attn.qkv.weight").T),
                        "bias": jnp.asarray(t(f"{pre}.attn.qkv.bias"))},
                "proj": {"kernel": jnp.asarray(t(f"{pre}.attn.proj.weight").T),
                         "bias": jnp.asarray(t(f"{pre}.attn.proj.bias"))},
            },
            "mlp": {
                "fc1": {"kernel": jnp.asarray(t(f"{pre}.mlp.fc1.weight").T),
                        "bias": jnp.asarray(t(f"{pre}.mlp.fc1.bias"))},
                "fc2": {"kernel": jnp.asarray(t(f"{pre}.mlp.fc2.weight").T),
                        "bias": jnp.asarray(t(f"{pre}.mlp.fc2.bias"))},
            },
        }
    return params
