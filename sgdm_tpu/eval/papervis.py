"""Paper-figure grid helpers.

TPU-native rewrite of `eval/papervis_utils.py`: a small orthogonal core
(`draw_grid` / `overlay_mask` / `overlay_bbox` / `draw_chain_grid`) plus the
reference's named figure zoo built on top of it:

  * `draw_grid_img` / `draw_grid_clustervis` / `draw_grid_interp` — plain
    sample grids (papervis_utils.py:100-127, 350-361),
  * `draw_grid_stego` / `draw_grid_random_stego_with_mask` — STEGO-mask
    figures (:129-173): column 1 = original, column 2 = mask overlay,
    then samples (or interleaved overlay/sample pairs),
  * `draw_grid_lost_bbox` / `draw_grid_random_lost_with_box` — LOST-box
    figures (:196-280): red box (from the binary mask's bbox) drawn on
    original + samples,
  * `draw_grid_stego_chainvis` / `draw_grid_lost_chainvis` — progressive
    chains with the condition overlay as the leading column (:175-241),
  * `draw_grid_condscale` / `draw_grid_condscale_stego` — guidance-scale
    sweeps (:304-341),
  * `draw_grid_scoremix` (:342-348), `cluster_hist_vis_fn` (:90-97),
  * `extract_bboxes` — mask → per-instance (x1,y1,x2,y2) (:42-77).

All helpers take uint8 NHWC numpy arrays; masks may be class-id [H,W],
one-hot [H,W,K] or channels-first one-hot [K,H,W] (auto-detected).  Images
are upsampled to 256 px like the reference (`upsample_pair`, bilinear for
images / nearest for masks) when `up_size` is set.

Colors follow a fixed distinct palette (distinctipy role).
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np

from ..utils.logging import make_grid

__all__ = [
    "DISTINCT_COLORS", "draw_grid", "overlay_mask", "overlay_bbox",
    "draw_chain_grid", "extract_bboxes", "mask_to_ids", "upsample_img",
    "draw_grid_img", "draw_grid_clustervis", "draw_grid_interp",
    "draw_grid_stego", "draw_grid_random_stego_with_mask",
    "draw_grid_lost_bbox", "draw_grid_random_lost_with_box",
    "draw_grid_stego_chainvis", "draw_grid_lost_chainvis",
    "draw_grid_condscale", "draw_grid_condscale_stego",
    "draw_grid_scoremix", "cluster_hist_vis_fn",
]

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


# ----------------------------------------------------------------------
# shared small ops

def mask_to_ids(mask: np.ndarray) -> np.ndarray:
    """Any mask form → class-id [H,W].  Accepts ids [H,W], one-hot
    [H,W,K] (our NHWC layouts) or one-hot [K,H,W] (torch layouts)."""
    m = np.asarray(mask)
    if m.ndim == 2:
        return m.astype(np.int32)
    if m.ndim == 3:
        # decide which axis is the class axis: channels-last if the last
        # axis differs from the (square) spatial dims, else channels-first
        if m.shape[0] != m.shape[1] and m.shape[1] == m.shape[2]:
            m = np.moveaxis(m, 0, -1)
        return m.argmax(-1).astype(np.int32)
    raise ValueError(f"bad mask shape {m.shape}")


def upsample_img(img: np.ndarray, up_size: int = 256,
                 mode: str = "bilinear") -> np.ndarray:
    """uint8 [H,W,C] (or ids [H,W]) → up_size².  Parity: upsample_pair
    (papervis_utils.py:32-39): bilinear for images, nearest for masks."""
    from PIL import Image

    arr = np.asarray(img)
    if arr.shape[0] == up_size:
        return arr
    if arr.ndim == 2:  # id mask → nearest
        return np.asarray(
            Image.fromarray(arr.astype(np.int32), mode="I").resize(
                (up_size, up_size), resample=Image.NEAREST)
        ).astype(arr.dtype)
    resample = Image.BILINEAR if mode == "bilinear" else Image.NEAREST
    return np.asarray(
        Image.fromarray(arr).resize((up_size, up_size), resample=resample)
    )


def extract_bboxes(mask: np.ndarray) -> np.ndarray:
    """[H,W,K] instance masks → [K,4] (x1,y1,x2,y2) boxes.
    Parity: papervis_utils.py:42-67 (empty instance → zeros)."""
    m = np.asarray(mask)
    if m.ndim == 2:
        m = m[..., None]
    boxes = np.zeros((m.shape[-1], 4), dtype=np.int32)
    for i in range(m.shape[-1]):
        cols = np.where(m[:, :, i].any(axis=0))[0]
        rows = np.where(m[:, :, i].any(axis=1))[0]
        if len(cols):
            boxes[i] = (cols[0], rows[0], cols[-1] + 1, rows[-1] + 1)
    return boxes


def _unnormalize(images: np.ndarray) -> np.ndarray:
    """[-1,1] float → uint8 (no-op for uint8 inputs)."""
    arr = np.asarray(images)
    if arr.dtype == np.uint8:
        return arr
    return np.clip((arr + 1) * 127.5, 0, 255).astype(np.uint8)


def _stego_overlay(original: np.ndarray, mask, up_size: int,
                   alpha: float = 1.0) -> np.ndarray:
    ids = upsample_img(mask_to_ids(mask), up_size)
    return overlay_mask(upsample_img(original, up_size), ids, alpha=alpha)


def _lost_boxed(img: np.ndarray, lostmask, up_size: int,
                width: int = 4) -> np.ndarray:
    """Draw the LOST binary mask's bbox (scaled to up_size) in red."""
    m = np.asarray(mask_to_ids(lostmask) > 0) \
        if np.asarray(lostmask).ndim == 3 else np.asarray(lostmask) > 0
    scale = up_size / m.shape[0]
    out = upsample_img(img, up_size)
    for box in extract_bboxes(m.astype(np.uint8)):
        if box.any():
            out = overlay_bbox(out, np.round(box * scale), width=width)
    return out


# ----------------------------------------------------------------------
# the named figure zoo (papervis_utils.py parity)

def draw_grid_img(samples, save_path, ncol: int = 7, padding: int = 2,
                  up_size: int | None = None):
    """Plain sample grid (draw_grid_img / draw_grid_8_8, :111-127,282-290)."""
    imgs = [_unnormalize(s) for s in samples]
    if up_size:
        imgs = [upsample_img(s, up_size) for s in imgs]
    return draw_grid(imgs, save_path, ncol=ncol, padding=padding)


# cluster grids (:100-109) and interp grids (:350-361) are the same writer
draw_grid_clustervis = draw_grid_img
draw_grid_interp = draw_grid_img


def draw_grid_stego(samples, masks, original_images, save_path,
                    padding: int = 5, up_size: int = 256,
                    alpha: float = 1.0):
    """One row: [original, stego-overlay, sample...].
    Parity: draw_grid_stego (:150-173)."""
    tiles = [upsample_img(_unnormalize(original_images[0]), up_size),
             _stego_overlay(_unnormalize(original_images[0]), masks[0],
                            up_size, alpha)]
    tiles += [upsample_img(_unnormalize(s), up_size) for s in samples]
    return draw_grid(tiles, save_path, ncol=len(tiles), padding=padding)


def draw_grid_random_stego_with_mask(samples, masks, original_images,
                                     save_path, ncol: int = 4,
                                     padding: int = 5, up_size: int = 256,
                                     alpha: float = 1.0):
    """Interleaved (overlay, sample) pairs.  Parity: :129-147."""
    tiles = []
    for s, m, o in zip(samples, masks, original_images):
        tiles.append(_stego_overlay(_unnormalize(o), m, up_size, alpha))
        tiles.append(upsample_img(_unnormalize(s), up_size))
    return draw_grid(tiles, save_path, ncol=2 * ncol, padding=padding)


def draw_grid_lost_bbox(samples, lostmask, original_images, save_path,
                        padding: int = 5, up_size: int = 256,
                        bbox_width: int = 4):
    """One row: [original+box, sample+box...].  Parity: :242-280."""
    tiles = [_lost_boxed(_unnormalize(original_images[0]), lostmask[0],
                         up_size, bbox_width)]
    tiles += [_lost_boxed(_unnormalize(s), m, up_size, bbox_width)
              for s, m in zip(samples, lostmask)]
    return draw_grid(tiles, save_path, ncol=len(tiles), padding=padding)


def draw_grid_random_lost_with_box(samples, lostmask, save_path,
                                   ncol: int = 8, padding: int = 5,
                                   up_size: int = 256, bbox_width: int = 4):
    """Samples with their LOST box drawn.  Parity: :196-218."""
    tiles = [_lost_boxed(_unnormalize(s), m, up_size, bbox_width)
             for s, m in zip(samples, lostmask)]
    return draw_grid(tiles, save_path, ncol=ncol, padding=padding)


def draw_grid_stego_chainvis(chain, masks, original_images, save_path,
                             padding: int = 2, alpha: float = 1.0):
    """[K,B,H,W,C] chain → per-sample rows [overlay, x0_t1, ... x0_tK].
    Parity: :175-194 (no 256-upsampling: chains stay at native size)."""
    chain = np.asarray(chain)
    k, b = chain.shape[:2]
    size = chain.shape[2]
    tiles = []
    for i in range(b):
        tiles.append(_stego_overlay(_unnormalize(original_images[i]),
                                    masks[i], size, alpha))
        tiles += [_unnormalize(chain[j, i]) for j in range(k)]
    return draw_grid(tiles, save_path, ncol=k + 1, padding=padding)


def draw_grid_lost_chainvis(chain, lostmask, original_images, save_path,
                            padding: int = 2, bbox_width: int = 2):
    """[K,B,H,W,C] chain → per-sample rows [original+box, x0_t...].
    Parity: :220-241."""
    chain = np.asarray(chain)
    k, b = chain.shape[:2]
    size = chain.shape[2]
    tiles = []
    for i in range(b):
        tiles.append(_lost_boxed(_unnormalize(original_images[i]),
                                 lostmask[i], size, bbox_width))
        tiles += [_unnormalize(chain[j, i]) for j in range(k)]
    return draw_grid(tiles, save_path, ncol=k + 1, padding=padding)


def draw_grid_condscale(samples, save_path, n_samples: int,
                        padding: int = 2):
    """[n_samples * n_scales] flat list → rows = samples, cols = scales.
    Parity: :332-340."""
    return draw_grid([_unnormalize(s) for s in samples], save_path,
                     ncol=len(samples) // n_samples, padding=padding)


def draw_grid_condscale_stego(masks, original_images, samples, save_path,
                              n_samples: int, padding: int = 2,
                              up_size: int = 256, alpha: float = 1.0):
    """Per sample a separate _sub{i}.png row: [original, overlay, scales...].
    Parity: :304-330."""
    samples = np.asarray(samples).reshape(
        n_samples, -1, *np.asarray(samples[0]).shape)
    save_path = Path(save_path)
    out = []
    for i in range(n_samples):
        tiles = [upsample_img(_unnormalize(original_images[i]), up_size),
                 _stego_overlay(_unnormalize(original_images[i]), masks[i],
                                up_size, alpha)]
        tiles += [upsample_img(_unnormalize(s), up_size) for s in samples[i]]
        out.append(draw_grid(
            tiles, save_path.with_name(save_path.stem + f"_sub{i}.png"),
            ncol=len(tiles), padding=padding,
        ))
    return out


def draw_grid_scoremix(samples, save_path, ncol: int = 16,
                       padding: int = 2):
    """Score-mix panel: rows = pairs, cols = mixing weights.  Parity:
    :342-348 (the reference's exp path raises NotImplementedError;
    here the panel is produced by a working scoremix sampler)."""
    return draw_grid([_unnormalize(s) for s in samples], save_path,
                     ncol=ncol, padding=padding)


def cluster_hist_vis_fn(data, save_path="cluster_hist_vis.png"):
    """Images-per-cluster histogram.  Parity: :90-97 (matplotlib)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    plt.figure(figsize=(8, 4))
    plt.hist(np.asarray(data).ravel(), bins=100)
    plt.xlabel("image number per cluster")
    plt.savefig(save_path)
    plt.close()
    return Path(save_path)


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
