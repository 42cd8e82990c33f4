"""Continuous-time samplers: the VDM schedule/ancestral sampler and the
continuous-alpha DDIM sampler.

TPU-native rewrites of the reference's two legacy continuous samplers
(`diffusion/sampler/continuous_vdm.py:41-243 Schedule_VDM` +
`learned_noise_schedule:80-118`, and
`diffusion/sampler/continous_ddim.py:42-184 DDIMSampler_Continuous`).
They are UNREGISTERED in the reference's sampler registry
(`diffusion/ddpm.py:28-34`); here they are importable AND registered
("vdm", "ddim_continuous") so the capability is actually usable.

Design: the whole reverse chain is one `lax.scan` program like every
other sampler here; log-SNR tables for the fixed schedules are evaluated
once outside the scan (f64 on host for the cosine quirk, like the
reference's float64 linspace); the learned monotonic-MLP schedule is a
Flax module whose endpoint-normalized output can be fed in as a
precomputed [T+1] table.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..schedule import make_ddim_sampling_parameters, make_ddim_timesteps
from .common import ProgressiveLog, noise_like
from .ddim import DDIMParams, _ddim_step

__all__ = [
    "beta_linear_log_snr",
    "alpha_cosine_log_snr",
    "LearnedNoiseSchedule",
    "vdm_q_sample",
    "vdm_sample",
    "ddim_continuous_sample",
]


# ------------------------------------------------------------ schedules

def _log(t, eps=1e-20):
    # numpy-native on numpy input: the schedule TABLES are evaluated on
    # host in float64 (the reference's float64 linspace — f32 cancellation
    # near the cosine zero at t→1 is visible on the last steps) and only
    # then cast to f32 for the scan
    xp = np if isinstance(t, np.ndarray) else jnp
    return xp.log(xp.clip(t, eps, None))


def beta_linear_log_snr(t):
    """log-SNR approximating the linear beta schedule
    (continuous_vdm.py:57-58).  f64 when called with a numpy array."""
    xp = np if isinstance(t, np.ndarray) else jnp
    return -_log(xp.expm1(1e-4 + 10.0 * (t ** 2)))


def alpha_cosine_log_snr(t, s: float = 0.008):
    """Cosine log-SNR (continuous_vdm.py:60-61).  f64 when called with a
    numpy array."""
    xp = np if isinstance(t, np.ndarray) else jnp
    return -_log(
        xp.cos((t + s) / (1 + s) * xp.pi * 0.5) ** -2 - 1, eps=1e-5)


def get_log_snr_fn(name: str) -> Callable[[jax.Array], jax.Array]:
    if name == "linear":
        return beta_linear_log_snr
    if name == "cosine":
        return alpha_cosine_log_snr
    raise ValueError(f"unknown continuous noise schedule {name!r}")


class _MonotonicDense(nn.Module):
    """Linear layer applied with |W|, |b| (continuous_vdm.py:71-78)."""

    features: int

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (x.shape[-1], self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return x @ jnp.abs(k) + jnp.abs(b)


class LearnedNoiseSchedule(nn.Module):
    """VDM appendix H/I.2 learned monotonic log-SNR
    (continuous_vdm.py:80-118): monotonic 1→1 linear with a residual
    monotonic sigmoid MLP, endpoint-normalized to [log_snr_max,
    log_snr_min], with a straight-through gradient fraction."""

    log_snr_max: float
    log_snr_min: float
    hidden_dim: int = 1024
    frac_gradient: float = 1.0

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        slope = self.log_snr_min - self.log_snr_max
        intercept = self.log_snr_max

        l0 = _MonotonicDense(1, name="l0")
        l1 = _MonotonicDense(self.hidden_dim, name="l1")
        l2 = _MonotonicDense(1, name="l2")

        def net(x):
            x = l0(x[..., None])
            x = x + l2(jax.nn.sigmoid(l1(x)))
            return x[..., 0]

        out_zero = net(jnp.zeros_like(t))
        out_one = net(jnp.ones_like(t))
        x = net(t)
        normed = slope * ((x - out_zero) / (out_one - out_zero)) + intercept
        f = self.frac_gradient
        return normed * f + jax.lax.stop_gradient(normed) * (1.0 - f)


# ------------------------------------------------------------ VDM sampler

def vdm_q_sample(log_snr_fn, rng, x_start, times):
    """Continuous-time forward diffusion (continuous_vdm.py:219-230):
    returns (x_noised, log_snr)."""
    noise = jax.random.normal(rng, x_start.shape, x_start.dtype)
    log_snr = log_snr_fn(times)
    pad = log_snr.reshape(log_snr.shape + (1,) * (x_start.ndim - log_snr.ndim))
    alpha = jnp.sqrt(jax.nn.sigmoid(pad))
    sigma = jnp.sqrt(jax.nn.sigmoid(-pad))
    return x_start * alpha + noise * sigma, log_snr


def vdm_sample(
    log_snr_fn,
    denoise_fn: Callable[..., jax.Array],
    rng: jax.Array,
    shape: tuple[int, ...],
    *,
    num_steps: int = 250,
    clip_denoised: bool = True,
    log_num_per_prog: int = 10,
    x_T: jax.Array | None = None,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Ancestral continuous-time sampling, Eq.33 of the VDM paper with the
    reviewer-corrected posterior (continuous_vdm.py:146-205).

    The denoiser receives the per-sample LOG-SNR as its time argument —
    VDM models condition on log-SNR, not integer steps (:162-163).
    """
    # evaluate the schedule table on HOST in f64 (closed-form schedules
    # are numpy-native; a jnp-only fn — e.g. a learned schedule — just
    # computes in f32, same as before), then cast once for the scan
    ls = jnp.asarray(
        np.asarray(log_snr_fn(np.linspace(1.0, 0.0, num_steps + 1))),
        jnp.float32,
    )  # [T+1] — one schedule eval outside the scan
    init_key, scan_key = jax.random.split(rng)
    img = x_T if x_T is not None else jax.random.normal(
        init_key, shape, dtype=jnp.float32)
    plog = ProgressiveLog(num_steps, log_num_per_prog, shape)

    def body(carry, inp):
        img, key, buf_x0, buf_xt = carry
        i = inp
        log_snr, log_snr_next = ls[i], ls[i + 1]
        c = -jnp.expm1(log_snr - log_snr_next)
        sq_alpha = jax.nn.sigmoid(log_snr)
        sq_alpha_next = jax.nn.sigmoid(log_snr_next)
        sq_sigma = jax.nn.sigmoid(-log_snr)
        sq_sigma_next = jax.nn.sigmoid(-log_snr_next)
        alpha = jnp.sqrt(sq_alpha)
        sigma = jnp.sqrt(sq_sigma)
        alpha_next = jnp.sqrt(sq_alpha_next)

        batch_log_snr = jnp.full((shape[0],), log_snr)
        pred_noise = denoise_fn(img, batch_log_snr)

        x_start = (img - sigma * pred_noise) / jnp.maximum(alpha, 1e-8)
        if clip_denoised:
            x_start_c = jnp.clip(x_start, -1.0, 1.0)
            mean = alpha_next * (img * (1.0 - c) / jnp.maximum(alpha, 1e-8)
                                 + c * x_start_c)
        else:
            mean = alpha_next / jnp.maximum(alpha, 1e-8) * (
                img - c * sigma * pred_noise)
        var = sq_sigma_next * c

        key, nkey = jax.random.split(key)
        noise = noise_like(nkey, shape)
        # no noise on the final step (time_next == 0, :185-189)
        img_next = jnp.where(
            i == num_steps - 1, mean,
            mean + jnp.sqrt(jnp.maximum(var, 0.0)) * noise)
        buf_x0 = plog.write(buf_x0, i, x_start)
        buf_xt = plog.write(buf_xt, i, img_next)
        return (img_next, key, buf_x0, buf_xt), None

    (img, _, buf_x0, buf_xt), _ = jax.lax.scan(
        body, (img, scan_key, plog.init(), plog.init()),
        jnp.arange(num_steps),
    )
    return img, {"pred_x0": buf_x0, "x_inter": buf_xt}


# -------------------------------------------------- continuous-alpha DDIM

def ddim_continuous_sample(
    alpha_fn,
    denoise_fn: Callable[..., jax.Array],
    rng: jax.Array,
    shape: tuple[int, ...],
    *,
    num_ddpm_timesteps: int = 1000,
    num_steps: int = 50,
    eta: float = 0.0,
    clip_denoised: bool = True,
    dtp: float = 1.0,
    temperature: float = 1.0,
    noise_dropout: float = 0.0,
    log_num_per_prog: int = 10,
    x_T: jax.Array | None = None,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """DDIM over a continuous alphas-cumprod function.

    Parity: continous_ddim.py:55-75 make_schedule — `alpha_fn` is
    evaluated on linspace(0, 1, N) in float64, the uniform +1-offset
    timestep subset and eq.16 sigmas are derived exactly like the
    discrete sampler, then the chain is the standard DDIM scan.
    `alpha_fn` maps t∈[0,1] → ᾱ(t); e.g. lambda t:
    jax.nn.sigmoid(beta_linear_log_snr(t)).
    """
    tgrid = np.linspace(0.0, 1.0, num_ddpm_timesteps)
    alphacums = np.asarray(
        jax.device_get(alpha_fn(jnp.asarray(tgrid, jnp.float64)
                                if jax.config.jax_enable_x64
                                else jnp.asarray(tgrid, jnp.float32))),
        np.float64,
    )
    ddim_timesteps = make_ddim_timesteps("uniform", num_steps,
                                         num_ddpm_timesteps)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
        alphacums, ddim_timesteps, eta)
    params = DDIMParams(ddim_timesteps, alphas, alphas_prev, sigmas)

    S = params.num_steps
    init_key, scan_key = jax.random.split(rng)
    img = x_T if x_T is not None else jax.random.normal(
        init_key, shape, dtype=jnp.float32)
    ts_values = jnp.asarray(params.timesteps[::-1].copy(), dtype=jnp.int32)
    indices = jnp.arange(S - 1, -1, -1)
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
        body, (img, scan_key, plog.init(), plog.init()),
        (ts_values, indices, jnp.arange(S)),
    )
    return img, {"pred_x0": buf_x0, "x_inter": buf_xt}
