"""Native (ancestral) DDPM sampler as a single `lax.scan` program.

TPU-native rewrite of `diffusion/sampler/ddpm_sampler.py:154-238`
(`p_mean_variance` → `p_sample` → full-T `sample` loop).  The whole reverse
chain compiles to ONE XLA executable: the per-step model call, x0 prediction,
clipping, posterior step and the no-noise-at-t=0 mask all live inside the
scanned body, so there is zero host↔device traffic during sampling.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..schedule import (
    DiffusionSchedule,
    clip_x0,
    predict_start_from_noise,
    q_posterior,
)
from .common import ProgressiveLog, noise_like

__all__ = ["p_mean_variance", "ancestral_sample"]


def p_mean_variance(
    sched: DiffusionSchedule,
    denoise_fn: Callable[..., jax.Array],
    x: jax.Array,
    t: jax.Array,
    clip_denoised: bool = True,
    dtp: float = 1.0,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Model posterior p(x_{t-1}|x_t). Parity: ddpm_sampler.py:154-173."""
    model_out = denoise_fn(x, t)
    if sched.parameterization == "eps":
        x_recon = predict_start_from_noise(sched, x, t, model_out)
    elif sched.parameterization == "x0":
        x_recon = model_out
    else:
        raise NotImplementedError(sched.parameterization)
    x_recon_unclipped = x_recon
    x_recon = clip_x0(x_recon, clip_denoised=clip_denoised, dtp=dtp)
    mean, var, log_var = q_posterior(sched, x_recon, x, t)
    return mean, var, log_var, x_recon, x_recon_unclipped


def ancestral_sample(
    sched: DiffusionSchedule,
    denoise_fn: Callable[..., jax.Array],
    rng: jax.Array,
    shape: tuple[int, ...],
    *,
    clip_denoised: bool = True,
    dtp: float = 1.0,
    temperature: float = 1.0,
    repeat_noise: bool = False,
    log_num_per_prog: int = 10,
    x_T: jax.Array | None = None,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Full-T ancestral sampling. Parity: ddpm_sampler.py:175-238.

    Returns (x0 in [-1,1], intermediates{pred_x0, x_inter} each [K,B,H,W,C]).
    The K-slot log buffers ride in the scan carry so memory stays at K
    images, not T.
    """
    T = sched.num_timesteps
    init_key, scan_key = jax.random.split(rng)
    img = x_T if x_T is not None else jax.random.normal(init_key, shape, dtype=jnp.float32)

    plog = ProgressiveLog(T, log_num_per_prog, shape)

    def body(carry, it):
        img, key, buf_x0, buf_xt = carry
        key, nkey = jax.random.split(key)
        t = jnp.full((shape[0],), it, dtype=jnp.int32)  # it: T-1 ... 0
        mean, _, log_var, pred_x0, _ = p_mean_variance(
            sched, denoise_fn, img, t, clip_denoised=clip_denoised, dtp=dtp
        )
        noise = noise_like(nkey, shape, repeat_noise) * temperature
        # no noise when t == 0 (ddpm_sampler.py:187)
        nonzero = (it > 0).astype(img.dtype)
        img_next = mean + nonzero * jnp.exp(0.5 * log_var) * noise
        step_idx = (T - 1) - it
        buf_x0 = plog.write(buf_x0, step_idx, pred_x0)
        buf_xt = plog.write(buf_xt, step_idx, img_next)
        return (img_next, key, buf_x0, buf_xt), None

    timesteps = jnp.arange(T - 1, -1, -1)
    (img, _, buf_x0, buf_xt), _ = jax.lax.scan(
        body, (img, scan_key, plog.init(), plog.init()), timesteps
    )
    return img, {"pred_x0": buf_x0, "x_inter": buf_xt}
