"""Shared machinery for the SSL pre-training stacks (MSN / MAE).

TPU-native rewrite of the schedule/augment/checkpoint plumbing the reference
vendors twice (`self_sl/msn/src/utils.py:67-132 WarmupCosineSchedule /
CosineWDSchedule`, `self_sl/mae/util/lr_sched.py`, the multi-crop transforms
in `self_sl/msn/src/data_manager.py`, and torch.save checkpoints):

  * `warmup_cosine_lr` — linear start→ref warmup then cosine ref→final
    (MSN WarmupCosineSchedule semantics; T_max is 1.25× the nominal run),
  * `scheduled_weight_decay` — a decoupled weight-decay optax transform
    whose coefficient follows CosineWDSchedule, masked off 1-dim params
    (the 'WD_exclude' groups of init_opt, msn_train.py:530-537),
  * `linear_ramp` — the momentum/sharpen linear schedules (:253-259),
  * `random_resized_crop` / `multicrop_views` — numpy multi-crop pipeline
    (1 target view + rand anchors + focal crops),
  * `save_encoder_ckpt` / `load_encoder_ckpt` — flax-serialized encoder
    params in VisionTransformer layout so SSLBackbone loads them directly.
"""

from __future__ import annotations

import json
import math
from pathlib import Path
from typing import Any

import jax
import numpy as np
import optax

__all__ = [
    "warmup_cosine_lr", "scheduled_weight_decay", "linear_ramp",
    "wd_mask", "random_resized_crop", "multicrop_views",
    "save_encoder_ckpt", "load_encoder_ckpt",
]


# ----------------------------------------------------------------------
# schedules
# ----------------------------------------------------------------------

def warmup_cosine_lr(start_lr: float, ref_lr: float, final_lr: float,
                     warmup_steps: int, total_steps: int):
    """MSN WarmupCosineSchedule (utils.py:67-102): linear warmup
    start→ref, then cosine ref→final over T_max = 1.25·total − warmup."""
    t_max = max(int(1.25 * total_steps) - warmup_steps, 1)

    def lr(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32) + 1.0  # .step() pre-increments
        warm = start_lr + (step / max(warmup_steps, 1)) * (ref_lr - start_lr)
        progress = (step - warmup_steps) / t_max
        cos = final_lr + (ref_lr - final_lr) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * progress)
        )
        cos = jnp.maximum(cos, final_lr)
        return jnp.where(step < warmup_steps, warm, cos)

    return lr


def linear_ramp(start: float, final: float, total_steps: int):
    """MSN momentum/sharpen generators (msn_train.py:253-259): linear from
    start to final over 1.25·total steps."""
    inc = (final - start) / max(int(1.25 * total_steps), 1)

    def value(step):
        return start + inc * step

    return value


def wd_mask(params) -> Any:
    """True = apply weight decay.  The reference excludes biases and all
    1-dim params (init_opt 'WD_exclude', msn_train.py:530-537; MAE
    add_weight_decay does the same)."""
    return jax.tree.map(lambda p: p.ndim > 1, params)


def scheduled_weight_decay(ref_wd: float, final_wd: float, total_steps: int,
                           mask=None) -> optax.GradientTransformation:
    """Decoupled weight decay whose coefficient follows CosineWDSchedule
    (utils.py:104-132).  Chain BEFORE the lr scaling (AdamW-style)."""
    t_max = max(int(1.25 * total_steps), 1)

    def wd(step):
        import jax.numpy as jnp

        progress = (jnp.asarray(step, jnp.float32) + 1.0) / t_max
        v = final_wd + (ref_wd - final_wd) * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return (jnp.maximum(v, final_wd) if final_wd <= ref_wd
                else jnp.minimum(v, final_wd))

    def init_fn(params):
        del params
        import jax.numpy as jnp

        return {"count": jnp.zeros((), jnp.int32)}

    def update_fn(updates, state, params=None):
        assert params is not None
        w = wd(state["count"])

        def add(u, p, m=True):
            return u + w * p if m else u

        if mask is not None:
            m = mask(params) if callable(mask) else mask
            updates = jax.tree.map(add, updates, params, m)
        else:
            updates = jax.tree.map(add, updates, params)
        return updates, {"count": state["count"] + 1}

    return optax.GradientTransformation(init_fn, update_fn)


# ----------------------------------------------------------------------
# numpy multi-crop augmentation
# ----------------------------------------------------------------------

def _resize_np(img: np.ndarray, size: int) -> np.ndarray:
    """Bilinear resize HWC float via PIL (host side, matches torchvision)."""
    from PIL import Image

    if img.shape[0] == size and img.shape[1] == size:
        return img
    arr = np.asarray(
        Image.fromarray(
            np.clip(img * 255.0, 0, 255).astype(np.uint8)
        ).resize((size, size), Image.BILINEAR),
        dtype=np.float32,
    ) / 255.0
    return arr


def random_resized_crop(rng: np.random.Generator, img: np.ndarray, size: int,
                        scale=(0.3, 1.0)) -> np.ndarray:
    """torchvision RandomResizedCrop semantics (area-scale crop → resize),
    plus a random horizontal flip."""
    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        target = rng.uniform(*scale) * area
        ar = math.exp(rng.uniform(math.log(3 / 4), math.log(4 / 3)))
        ch = int(round(math.sqrt(target / ar)))
        cw = int(round(math.sqrt(target * ar)))
        if ch <= h and cw <= w and ch > 0 and cw > 0:
            top = rng.integers(0, h - ch + 1)
            left = rng.integers(0, w - cw + 1)
            crop = img[top:top + ch, left:left + cw]
            break
    else:
        crop = img
    out = _resize_np(crop, size)
    if rng.random() < 0.5:
        out = out[:, ::-1]
    return np.ascontiguousarray(out)


def multicrop_views(rng: np.random.Generator, img: np.ndarray, *,
                    rand_size: int, focal_size: int,
                    rand_views: int, focal_views: int) -> dict[str, np.ndarray]:
    """1 target view + `rand_views` anchor views at rand_size + `focal_views`
    small crops (data_manager.py multicrop; the target is the FIRST rand view,
    msn_train.py:197 `rand_views=rand_views+1`)."""
    target = random_resized_crop(rng, img, rand_size)
    anchors = np.stack(
        [random_resized_crop(rng, img, rand_size) for _ in range(rand_views)]
    )
    focals = (
        np.stack([random_resized_crop(rng, img, focal_size, scale=(0.05, 0.3))
                  for _ in range(focal_views)])
        if focal_views else np.zeros((0, focal_size, focal_size, 3), np.float32)
    )
    return {"target": target, "anchors": anchors, "focals": focals}


# ----------------------------------------------------------------------
# native encoder checkpoints (SSLBackbone-loadable)
# ----------------------------------------------------------------------

def save_encoder_ckpt(path: str | Path, encoder_params, meta: dict) -> None:
    from flax import serialization

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.to_bytes(
        jax.tree.map(np.asarray, encoder_params)
    ))
    Path(str(path) + ".json").write_text(json.dumps(meta))


def load_encoder_ckpt(path: str | Path, template_params):
    from flax import serialization

    data = Path(path).read_bytes()
    return serialization.from_bytes(template_params, data)
