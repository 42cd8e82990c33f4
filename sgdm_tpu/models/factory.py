"""Build denoiser modules from reference-style config params.

The reference instantiates its UNets straight from Hydra groups
(`config/dynamic/*.yaml` → `dynamic.diffusionmodules.openaimodel[_ca]
.UNetModel`).  This adapter accepts those exact param dicts — including keys
that only make sense for torch (`use_fp16`, `legacy`, `transformer_depth`,
`dims`, `image_size`) — and maps them onto the Flax modules, so the YAML
config surface stays identical.

`layout_dim` for the clusterlayout/stegoclusterlayout/layout methods comes
from the nested `condition` group the reference threads into the model
(`config/dynamic/unet_fast.yaml:17-19`), but in the Flax modules layout
channels are inferred from the layout input itself, so only the method name
is needed here.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from .unet import UNetCAModel, UNetModel

__all__ = ["create_denoiser"]

_COMMON_KEYS = {
    "model_channels", "out_channels", "num_res_blocks",
    "attention_resolutions", "channel_mult", "dropout", "num_heads",
    "num_head_channels", "use_scale_shift_norm", "use_checkpoint", "use_pallas",
    "cond_dim", "condition_method", "lookup_table_size",
}
_UNET_KEYS = _COMMON_KEYS | {"resblock_updown"}
_CA_KEYS = _COMMON_KEYS | {
    "cond_token_num", "context_dim", "use_cls_token_as_pooled",
}


def create_denoiser(dtype: Any = jnp.float32, **params: Any):
    """Create a UNetModel / UNetCAModel from reference-style params.

    The CA variant is selected exactly the way the reference selects
    `openaimodel_ca.UNetModel`: presence of `use_ca_block: true` (or an
    explicit `cond_token_num`) in the dynamic group.
    """
    is_ca = bool(params.get("use_ca_block", False)) or "cond_token_num" in params
    keys = _CA_KEYS if is_ca else _UNET_KEYS
    kwargs = {k: v for k, v in params.items() if k in keys and v is not None}
    if "attention_resolutions" in kwargs:
        kwargs["attention_resolutions"] = tuple(kwargs["attention_resolutions"])
    if "channel_mult" in kwargs:
        kwargs["channel_mult"] = tuple(kwargs["channel_mult"])
    cls = UNetCAModel if is_ca else UNetModel
    return cls(dtype=dtype, **kwargs)
