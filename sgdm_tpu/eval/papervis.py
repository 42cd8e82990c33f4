"""Paper-figure grid helpers.

TPU-native rewrite of `eval/papervis_utils.py` (20+ `draw_grid_*` helpers)
collapsed into a small orthogonal API:

  * `draw_grid` — the base grid writer (nrow/ncol/padding → PNG), backing
    cluster-sample grids, condscale sweeps, interp chains,
  * `overlay_mask` — segmentation/stego mask overlay with distinct colors
    (segmask_overlay / stego grids),
  * `overlay_bbox` — LOST box overlay (lostbbox grids),
  * `draw_chain_grid` — progressive-denoising chain panels (chainvis).

Colors follow a fixed distinct palette (diffusion_utils/taokit/color_util
role).
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np

from ..utils.logging import make_grid

__all__ = ["DISTINCT_COLORS", "draw_grid", "overlay_mask", "overlay_bbox",
           "draw_chain_grid"]

# 27 visually-distinct RGB colors (enough for stego_k / coco-stuff 27)
DISTINCT_COLORS = np.array([
    [230, 25, 75], [60, 180, 75], [255, 225, 25], [0, 130, 200],
    [245, 130, 48], [145, 30, 180], [70, 240, 240], [240, 50, 230],
    [210, 245, 60], [250, 190, 212], [0, 128, 128], [220, 190, 255],
    [170, 110, 40], [255, 250, 200], [128, 0, 0], [170, 255, 195],
    [128, 128, 0], [255, 215, 180], [0, 0, 128], [128, 128, 128],
    [255, 255, 255], [0, 0, 0], [255, 0, 102], [102, 255, 0],
    [0, 102, 255], [255, 153, 0], [153, 0, 255],
], dtype=np.uint8)


def draw_grid(
    images: Sequence[np.ndarray] | np.ndarray,
    save_path: str | Path,
    ncol: int | None = None,
    padding: int = 2,
) -> Path:
    """Stack uint8 [H,W,C] images into a grid PNG."""
    from PIL import Image

    batch = np.stack([np.asarray(im) for im in images])
    if batch.ndim == 3:
        batch = batch[..., None]
    grid = make_grid(batch, ncol=ncol, pad=padding)
    if grid.shape[-1] == 1:
        grid = grid[..., 0]
    save_path = Path(save_path)
    save_path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(grid).save(save_path)
    return save_path


def overlay_mask(
    img: np.ndarray, mask_ids: np.ndarray, alpha: float = 0.5
) -> np.ndarray:
    """Blend a class-id mask over an image with distinct colors."""
    colors = DISTINCT_COLORS[mask_ids % len(DISTINCT_COLORS)]
    out = (1 - alpha) * img.astype(np.float32) + alpha * colors.astype(np.float32)
    return np.clip(out, 0, 255).astype(np.uint8)


def overlay_bbox(
    img: np.ndarray, bbox: np.ndarray, color=(255, 0, 0), width: int = 1
) -> np.ndarray:
    """Draw an (x0,y0,x1,y1) box outline."""
    out = img.copy()
    x0, y0, x1, y1 = [int(v) for v in bbox]
    h, w = img.shape[:2]
    x0, x1 = np.clip([x0, x1], 0, w - 1)
    y0, y1 = np.clip([y0, y1], 0, h - 1)
    c = np.asarray(color, dtype=out.dtype)
    for k in range(width):
        out[np.clip(y0 + k, 0, h - 1), x0:x1 + 1] = c
        out[np.clip(y1 - k, 0, h - 1), x0:x1 + 1] = c
        out[y0:y1 + 1, np.clip(x0 + k, 0, w - 1)] = c
        out[y0:y1 + 1, np.clip(x1 - k, 0, w - 1)] = c
    return out


def draw_chain_grid(
    chain: np.ndarray, save_path: str | Path, padding: int = 2
) -> Path:
    """Progressive chain [K,B,H,W,C] → rows = samples, cols = timesteps."""
    k, b = chain.shape[:2]
    rows = chain.transpose(1, 0, 2, 3, 4).reshape(k * b, *chain.shape[2:])
    return draw_grid(rows, save_path, ncol=k, padding=padding)


def condscale_sweep_images(
    trainer,
    cond: "np.ndarray",
    scales: Sequence[float],
    image_size: int,
    channels: int = 3,
    layout: "np.ndarray | None" = None,
    sampling_method: str = "ddim",
    num_steps: int = 50,
    seed: int = 0,
):
    """One condition sampled at several guidance weights, same noise.

    TPU equivalent of the embedded condscale-sweep branch in the reference
    DDIM loop (`ddim_plms_sampler.py:107-143`): the per-sample weight tensor
    rides through `guided_score` (which broadcasts [B] weights), so the
    whole sweep is ONE batch in ONE jitted sampler call.

    Returns uint8 [len(scales), H, W, C].
    """
    import jax
    import jax.numpy as jnp

    from ..training.state import make_sample_fn

    n = len(scales)
    w = jnp.asarray(scales, dtype=jnp.float32)  # per-sample weights [n]
    sample = make_sample_fn(
        trainer.model, trainer.diffusion,
        sampling_method=sampling_method, num_steps=num_steps,
        cond_scale=w, scale_type=trainer.scale_type,
        clip_denoised=trainer.clip_denoised, dtp=trainer.dtp,
    )
    cond_rep = jnp.broadcast_to(jnp.asarray(cond, jnp.float32)[None],
                                (n, *np.asarray(cond).shape))
    layout_rep = (
        None if layout is None else
        jnp.broadcast_to(jnp.asarray(layout, jnp.float32)[None],
                         (n, *np.asarray(layout).shape))
    )
    imgs, _ = sample(trainer.state.ema_params, jax.random.PRNGKey(seed),
                     n, image_size, channels, cond=cond_rep, layout=layout_rep)
    return np.asarray(imgs)
