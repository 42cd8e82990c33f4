"""ResNet-50 trunk in Flax (inference feature extractor, NHWC).

The reference's KNN eval embeds images with the pl_bolts SimCLR ResNet-50
encoder (`self_sl/simclr_related.py:26-44 simclr_4sg`: `SimCLR.load_from_
checkpoint(...).encoder`, 2048-d pooled features, ImageNet normalization).
This is that trunk as a Flax module:

  * torchvision ResNet-50 wiring: 7×7/2 conv → BN → ReLU → 3×3/2 maxpool →
    bottleneck stages [3, 4, 6, 3] → global average pool → [B, 2048],
  * BatchNorm is inference-only and folded into per-channel scale/bias at
    weight-load time (same ConvBN pattern as `eval/inception.py`),
  * `load_simclr_torch_weights` maps the pl_bolts checkpoint
    (`state_dict['encoder.*']`, torchvision key layout incl.
    `layer{i}.{j}.downsample.{0,1}`) onto this module.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["ResNet50", "resnet101", "load_simclr_torch_weights",
           "load_vissl_torch_weights"]


class ConvBN(nn.Module):
    features: int
    kernel: tuple[int, int] = (1, 1)
    strides: tuple[int, int] = (1, 1)
    padding: Any = 0

    @nn.compact
    def __call__(self, x, relu: bool = True):
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=pad, use_bias=False, name="conv")(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        x = x * scale + bias
        return nn.relu(x) if relu else x


class Bottleneck(nn.Module):
    planes: int
    strides: tuple[int, int] = (1, 1)
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out = ConvBN(self.planes, (1, 1), name="conv1")(x)
        out = ConvBN(self.planes, (3, 3), strides=self.strides, padding=1,
                     name="conv2")(out)
        out = ConvBN(self.planes * 4, (1, 1), name="conv3")(out, relu=False)
        if self.downsample:
            x = ConvBN(self.planes * 4, (1, 1), strides=self.strides,
                       name="downsample")(x, relu=False)
        return nn.relu(out + x)


class ResNet50(nn.Module):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x [B,H,W,3] (ImageNet-normalized) → pooled features [B, 2048]."""
        x = ConvBN(64, (7, 7), strides=(2, 2), padding=3, name="stem")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        planes = 64
        for stage, blocks in enumerate(self.stage_sizes):
            for i in range(blocks):
                strides = (2, 2) if (stage > 0 and i == 0) else (1, 1)
                x = Bottleneck(
                    planes, strides=strides,
                    downsample=(i == 0),
                    name=f"layer{stage + 1}_{i}",
                )(x)
            planes *= 2
        return x.mean(axis=(1, 2))

    @property
    def feat_dim(self) -> int:
        return 2048


def resnet101() -> ResNet50:
    """torchvision ResNet-101 trunk (the VISSL SimCLR-RN101 backbone,
    self_sl/vissl_backbone.py:53-58); the class is bottleneck-generic
    despite its name."""
    return ResNet50(stage_sizes=(3, 4, 23, 3))


def _map_torchvision_resnet(sd) -> dict:
    """torchvision-named state dict → ResNet params (BN folded, eps=1e-5).
    Stage sizes are inferred from the block indices present."""

    def convbn(conv_key, bn_key):
        w = sd[f"{conv_key}.weight"].numpy()
        gamma = sd[f"{bn_key}.weight"].numpy()
        beta = sd[f"{bn_key}.bias"].numpy()
        mean = sd[f"{bn_key}.running_mean"].numpy()
        var = sd[f"{bn_key}.running_var"].numpy()
        scale = gamma / np.sqrt(var + 1e-5)
        return {
            "conv": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))},
            "bn_scale": jnp.asarray(scale),
            "bn_bias": jnp.asarray(beta - mean * scale),
        }

    params: dict = {"stem": convbn("conv1", "bn1")}
    for stage in range(4):
        blocks = 1 + max(
            (int(k.split(".")[1]) for k in sd
             if k.startswith(f"layer{stage + 1}.")), default=-1)
        if blocks == 0:
            raise KeyError(f"state dict has no layer{stage + 1}.* keys")
        for i in range(blocks):
            pre = f"layer{stage + 1}.{i}"
            blk = {
                "conv1": convbn(f"{pre}.conv1", f"{pre}.bn1"),
                "conv2": convbn(f"{pre}.conv2", f"{pre}.bn2"),
                "conv3": convbn(f"{pre}.conv3", f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                blk["downsample"] = convbn(
                    f"{pre}.downsample.0", f"{pre}.downsample.1"
                )
            params[f"layer{stage + 1}_{i}"] = blk
    return params


def load_simclr_torch_weights(path: str) -> dict:
    """pl_bolts SimCLR checkpoint → ResNet50 params (BN folded, eps=1e-5)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    # strip the lightning 'encoder.' prefix; ignore projection head etc.
    sd = {k[len("encoder."):]: v for k, v in sd.items()
          if k.startswith("encoder.")} or sd
    return _map_torchvision_resnet(sd)


def load_vissl_torch_weights(path: str) -> dict:
    """VISSL / SwAV ResNet trunk checkpoint → ResNet params.

    Parity: self_sl/vissl_backbone.py:36-91 — handles the two on-disk
    layouts the reference's three zoo entries use:
      * consolidated VISSL (`model_final_checkpoint_phase999.torch`,
        `converted_vissl_rn50_jigsaw_in1k_goyal19.torch`):
        `classy_state_dict.base_model.model.trunk._feature_blocks.*`,
      * SwAV-style (`deepclusterv2_800ep_pretrain.pth.tar`): flat
        `module.conv1.*` plus projection_head/prototypes (dropped — the
        reference extracts trunk features only,
        EXTRACT_TRUNK_FEATURES_ONLY=True).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt
    if isinstance(ckpt, dict) and "classy_state_dict" in ckpt:
        sd = ckpt["classy_state_dict"]["base_model"]["model"]["trunk"]
    elif isinstance(ckpt, dict) and "state_dict" in ckpt:
        sd = ckpt["state_dict"]
    flat = {}
    for k, v in sd.items():
        for pre in ("module.", "_feature_blocks."):
            if k.startswith(pre):
                k = k[len(pre):]
        if k.startswith(("fc.", "head", "heads", "projection", "prototypes")):
            continue
        flat[k] = v
    return _map_torchvision_resnet(flat)
