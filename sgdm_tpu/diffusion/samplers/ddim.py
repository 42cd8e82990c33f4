"""DDIM and PLMS samplers as single `lax.scan` programs.

TPU-native rewrite of `diffusion/sampler/ddim_plms_sampler.py`:

  * schedule derivation (`make_schedule` :38-81) — uniform-stride timestep
    subset with the reference's +1 offset and DDIM eq.16 sigmas,
  * DDIM update (`p_sample_ddim` :346-391) — eq.12 with x0 clipping /
    dynamic thresholding, temperature, and (scaled-dropout) noise dropout,
  * PLMS (`plms_sampling` :393-480 / `p_sample_plms` :483-525) —
    Adams-Bashforth multistep on the eps history with a pseudo-improved-Euler
    first step.

Design: all per-step scalars (timestep values, ddim alphas/sigmas) are
precomputed host-side in float64 numpy and scanned over; the eps history for
PLMS lives in a fixed [3,B,...] carry buffer with `lax.switch` on the warmup
order, so the entire sampler is one compiled program.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..schedule import (
    DiffusionSchedule,
    clip_x0,
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
)
from .common import ProgressiveLog, noise_like

__all__ = ["DDIMParams", "make_ddim_schedule", "ddim_sample", "plms_sample"]


class DDIMParams:
    """Static (host-side) DDIM sub-schedule tables."""

    def __init__(self, timesteps, alphas, alphas_prev, sigmas):
        self.timesteps = np.asarray(timesteps)  # [S] int, ascending
        self.alphas = jnp.asarray(alphas, dtype=jnp.float32)
        self.alphas_prev = jnp.asarray(alphas_prev, dtype=jnp.float32)
        self.sigmas = jnp.asarray(sigmas, dtype=jnp.float32)
        self.sqrt_one_minus_alphas = jnp.sqrt(1.0 - self.alphas)
        self.num_steps = len(self.timesteps)


def make_ddim_schedule(
    sched: DiffusionSchedule,
    num_steps: int,
    eta: float = 0.0,
    discr_method: str = "uniform",
) -> DDIMParams:
    """Parity: ddim_plms_sampler.py:38-81 make_schedule."""
    alphacums = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    ddim_timesteps = make_ddim_timesteps(
        discr_method, num_steps, sched.num_timesteps
    )
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
        alphacums, ddim_timesteps, eta
    )
    return DDIMParams(ddim_timesteps, alphas, alphas_prev, sigmas)


def _ddim_step(
    params: DDIMParams,
    x: jax.Array,
    e_t: jax.Array,
    index: jax.Array,
    nkey: jax.Array,
    *,
    clip_denoised: bool,
    dtp: float,
    temperature: float,
    noise_dropout: float,
    repeat_noise: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """DDIM eq.12 update. Parity: ddim_plms_sampler.py:346-391 p_sample_ddim."""
    a_t = params.alphas[index]
    a_prev = params.alphas_prev[index]
    sigma_t = params.sigmas[index]
    sqrt_one_minus_at = params.sqrt_one_minus_alphas[index]

    pred_x0 = (x - sqrt_one_minus_at * e_t) / jnp.sqrt(a_t)
    pred_x0_unclipped = pred_x0
    pred_x0 = clip_x0(pred_x0, clip_denoised=clip_denoised, dtp=dtp)

    dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma_t**2, 0.0)) * e_t
    nkey, dkey = jax.random.split(nkey)
    noise = sigma_t * noise_like(nkey, x.shape, repeat_noise) * temperature
    if noise_dropout > 0.0:
        # torch F.dropout semantics: zero with prob p, scale kept by 1/(1-p)
        keep = jax.random.bernoulli(dkey, 1.0 - noise_dropout, noise.shape)
        noise = jnp.where(keep, noise / (1.0 - noise_dropout), 0.0)
    x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise
    return x_prev, pred_x0, pred_x0_unclipped


def ddim_sample(
    sched: DiffusionSchedule,
    denoise_fn: Callable[..., jax.Array],
    rng: jax.Array,
    shape: tuple[int, ...],
    *,
    num_steps: int = 50,
    eta: float = 0.0,
    clip_denoised: bool = True,
    dtp: float = 1.0,
    temperature: float = 1.0,
    noise_dropout: float = 0.0,
    log_num_per_prog: int = 10,
    x_T: jax.Array | None = None,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Parity: ddim_plms_sampler.py:100-343 ddim_sampling (core path)."""
    params = make_ddim_schedule(sched, num_steps, eta=eta)
    S = params.num_steps
    init_key, scan_key = jax.random.split(rng)
    img = x_T if x_T is not None else jax.random.normal(init_key, shape, dtype=jnp.float32)

    ts_values = jnp.asarray(params.timesteps[::-1].copy(), dtype=jnp.int32)  # [S] descending
    indices = jnp.arange(S - 1, -1, -1)  # index into ddim tables
    plog = ProgressiveLog(S, log_num_per_prog, shape)

    def body(carry, inp):
        img, key, buf_x0, buf_xt = carry
        step_val, index, i = inp
        key, nkey = jax.random.split(key)
        t = jnp.full((shape[0],), step_val, dtype=jnp.int32)
        e_t = denoise_fn(img, t)
        img_next, pred_x0, _ = _ddim_step(
            params, img, e_t, index, nkey,
            clip_denoised=clip_denoised, dtp=dtp,
            temperature=temperature, noise_dropout=noise_dropout,
        )
        buf_x0 = plog.write(buf_x0, i, pred_x0)
        buf_xt = plog.write(buf_xt, i, img_next)
        return (img_next, key, buf_x0, buf_xt), None

    (img, _, buf_x0, buf_xt), _ = jax.lax.scan(
        body,
        (img, scan_key, plog.init(), plog.init()),
        (ts_values, indices, jnp.arange(S)),
    )
    return img, {"pred_x0": buf_x0, "x_inter": buf_xt}


def plms_sample(
    sched: DiffusionSchedule,
    denoise_fn: Callable[..., jax.Array],
    rng: jax.Array,
    shape: tuple[int, ...],
    *,
    num_steps: int = 50,
    clip_denoised: bool = True,
    dtp: float = 1.0,
    temperature: float = 1.0,
    noise_dropout: float = 0.0,
    log_num_per_prog: int = 10,
    x_T: jax.Array | None = None,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Parity: ddim_plms_sampler.py:393-480 plms_sampling (eta is 0 for PLMS)."""
    params = make_ddim_schedule(sched, num_steps, eta=0.0)
    S = params.num_steps
    init_key, scan_key = jax.random.split(rng)
    img = x_T if x_T is not None else jax.random.normal(init_key, shape, dtype=jnp.float32)

    time_range = params.timesteps[::-1].copy()  # descending
    ts_values = jnp.asarray(time_range, dtype=jnp.int32)
    # ts_next = time_range[min(i+1, S-1)] (reference :424-429)
    ts_next_values = jnp.asarray(
        np.concatenate([time_range[1:], time_range[-1:]]), dtype=jnp.int32
    )
    indices = jnp.arange(S - 1, -1, -1)
    plog = ProgressiveLog(S, log_num_per_prog, shape)

    step_kw = dict(
        clip_denoised=clip_denoised, dtp=dtp,
        temperature=temperature, noise_dropout=noise_dropout,
    )

    def body(carry, inp):
        img, key, old_eps, count, buf_x0, buf_xt = carry
        step_val, next_val, index, i = inp
        key, k1, k2 = jax.random.split(key, 3)
        t = jnp.full((shape[0],), step_val, dtype=jnp.int32)
        t_next = jnp.full((shape[0],), next_val, dtype=jnp.int32)
        e_t = denoise_fn(img, t)

        def order1(_):
            # pseudo improved Euler: take the step, re-evaluate eps at t_next
            x_prev, _, _ = _ddim_step(params, img, e_t, index, k1, **step_kw)
            e_t_next = denoise_fn(x_prev, t_next)
            return (e_t + e_t_next) / 2

        def order2(_):
            return (3 * e_t - old_eps[2]) / 2

        def order3(_):
            return (23 * e_t - 16 * old_eps[2] + 5 * old_eps[1]) / 12

        def order4(_):
            return (55 * e_t - 59 * old_eps[2] + 37 * old_eps[1] - 9 * old_eps[0]) / 24

        e_t_prime = jax.lax.switch(
            jnp.minimum(count, 3), [order1, order2, order3, order4], None
        )
        img_next, pred_x0, _ = _ddim_step(params, img, e_t_prime, index, k2, **step_kw)

        # shift the eps history (most recent at slot 2)
        old_eps = jnp.concatenate([old_eps[1:], e_t[None]], axis=0)
        buf_x0 = plog.write(buf_x0, i, pred_x0)
        buf_xt = plog.write(buf_xt, i, img_next)
        return (img_next, key, old_eps, count + 1, buf_x0, buf_xt), None

    old_eps0 = jnp.zeros((3, *shape), dtype=jnp.float32)
    (img, _, _, _, buf_x0, buf_xt), _ = jax.lax.scan(
        body,
        (img, scan_key, old_eps0, jnp.int32(0), plog.init(), plog.init()),
        (ts_values, ts_next_values, indices, jnp.arange(S)),
    )
    return img, {"pred_x0": buf_x0, "x_inter": buf_xt}
