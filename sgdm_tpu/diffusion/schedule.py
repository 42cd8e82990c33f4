"""Diffusion noise schedules and Gaussian-diffusion math (pure JAX).

TPU-native rewrite of the reference's schedule machinery:

  * beta schedules — reference `dynamic/diffusionmodules/util.py:23-44`
    ``make_beta_schedule`` (NOTE the "linear" schedule is linear in
    *sqrt(beta)* space, LDM convention) and `util.py:79-95`
    ``betas_for_alpha_bar``.
  * registered schedule buffers — reference
    `diffusion/sampler/ddpm_sampler.py:25-103 register_schedule`.
  * q_sample / posterior / x0<->eps conversions — reference
    `ddpm_sampler.py:116-152`.
  * DDIM timestep subset (+1 offset!) and eq.16 sigmas — reference
    `dynamic/diffusionmodules/util.py:46-76`.
  * dynamic thresholding (Imagen DTP) — reference
    `diffusion_utils/util.py:70-82 clip_x0_minus_one_to_one`.

Design: instead of torch buffers on an nn.Module, all schedule tables live in
a frozen pytree dataclass computed once in float64 numpy and stored float32.
All step math is pure functions of (schedule, arrays) so that samplers can be
`lax.scan`-compiled into a single XLA program and tables are folded into the
compiled executable as constants.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "make_beta_schedule",
    "make_ddim_timesteps",
    "make_ddim_sampling_parameters",
    "DiffusionSchedule",
    "extract",
    "q_sample",
    "q_posterior",
    "predict_start_from_noise",
    "predict_noise_from_start",
    "clip_x0",
    "normalize_to_neg_one_to_one",
    "unnormalize_to_zero_to_255",
]


# ----------------------------------------------------------------------
# beta schedules (numpy / float64, matching reference precision)
# ----------------------------------------------------------------------

def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Return betas [T] float64. Parity: dynamic/diffusionmodules/util.py:23."""
    if schedule == "linear":
        # LDM convention: linear in sqrt-space.
        betas = (
            np.linspace(linear_start ** 0.5, linear_end ** 0.5, n_timestep, dtype=np.float64)
            ** 2
        )
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(timesteps / (1 + cosine_s) * math.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1.0 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0.0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"schedule '{schedule}' unknown.")
    return betas


def betas_for_alpha_bar(num_diffusion_timesteps: int, alpha_bar, max_beta: float = 0.999) -> np.ndarray:
    """Parity: dynamic/diffusionmodules/util.py:79-95."""
    t = np.arange(num_diffusion_timesteps, dtype=np.float64)
    t1 = t / num_diffusion_timesteps
    t2 = (t + 1) / num_diffusion_timesteps
    ab = np.vectorize(alpha_bar)
    return np.minimum(1 - ab(t2) / ab(t1), max_beta)


def make_ddim_timesteps(
    ddim_discr_method: str, num_ddim_timesteps: int, num_ddpm_timesteps: int
) -> np.ndarray:
    """DDIM timestep subset, int64 [S]. Parity: util.py:46-61 incl. the +1 offset."""
    if ddim_discr_method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        ddim_timesteps = np.asarray(list(range(0, num_ddpm_timesteps, c)))
    elif ddim_discr_method == "quad":
        ddim_timesteps = (
            np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2
        ).astype(int)
    else:
        raise NotImplementedError(f"unknown ddim discretization: {ddim_discr_method}")
    # +1 "to get the final alpha values right" (reference util.py:57-58)
    return ddim_timesteps + 1


def make_ddim_sampling_parameters(
    alphacums: np.ndarray, ddim_timesteps: np.ndarray, eta: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """sigmas/alphas/alphas_prev for the DDIM subset. Parity: util.py:63-76."""
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.asarray([alphacums[0]] + alphacums[ddim_timesteps[:-1]].tolist())
    # DDIM paper (arXiv:2010.02502) eq. 16
    sigmas = eta * np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    return sigmas, alphas, alphas_prev


# ----------------------------------------------------------------------
# the schedule pytree
# ----------------------------------------------------------------------

@partial(jax.tree_util.register_dataclass,
         data_fields=[
             "betas", "alphas_cumprod", "alphas_cumprod_prev",
             "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
             "log_one_minus_alphas_cumprod", "sqrt_recip_alphas_cumprod",
             "sqrt_recipm1_alphas_cumprod", "posterior_variance",
             "posterior_log_variance_clipped", "posterior_mean_coef1",
             "posterior_mean_coef2", "lvlb_weights",
         ],
         meta_fields=["num_timesteps", "parameterization", "v_posterior",
                      "beta_schedule", "linear_start", "linear_end", "cosine_s"])
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All DDPM schedule tables, float32 [T] each.

    Parity: diffusion/sampler/ddpm_sampler.py:25-103 register_schedule.
    """

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    log_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    lvlb_weights: jax.Array
    num_timesteps: int = 1000
    parameterization: str = "eps"
    v_posterior: float = 0.0
    beta_schedule: str = "linear"
    linear_start: float = 1e-4
    linear_end: float = 2e-2
    cosine_s: float = 8e-3

    @classmethod
    def create(
        cls,
        beta_schedule: str = "linear",
        num_timesteps: int = 1000,
        linear_start: float = 1e-4,
        linear_end: float = 2e-2,
        cosine_s: float = 8e-3,
        given_betas: np.ndarray | None = None,
        v_posterior: float = 0.0,
        parameterization: str = "eps",
    ) -> "DiffusionSchedule":
        if given_betas is not None:
            betas = np.asarray(given_betas, dtype=np.float64)
        else:
            betas = make_beta_schedule(
                beta_schedule, num_timesteps,
                linear_start=linear_start, linear_end=linear_end, cosine_s=cosine_s,
            )
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
        assert alphas_cumprod.shape[0] == num_timesteps

        posterior_variance = (1 - v_posterior) * betas * (
            1.0 - alphas_cumprod_prev
        ) / (1.0 - alphas_cumprod) + v_posterior * betas

        if parameterization == "eps":
            # posterior_variance[0] == 0 makes entry 0 inf; it is clamped below.
            with np.errstate(divide="ignore"):
                lvlb_weights = betas ** 2 / (
                    2 * posterior_variance * alphas * (1 - alphas_cumprod)
                )
        elif parameterization == "x0":
            # reference quirk consciously preserved (ddpm_sampler.py:91,
            # inherited from upstream LDM): `2. * 1 - alphas_cumprod`
            # evaluates as (2 - ā), NOT the ELBO's 2·(1 - ā).  Kept
            # bit-for-bit — the table is exposed for parity, and p_losses
            # does not consume it.
            lvlb_weights = 0.5 * np.sqrt(alphas_cumprod) / (2.0 * 1 - alphas_cumprod)
        else:
            raise NotImplementedError(f"parameterization {parameterization}")
        # posterior_variance[0] == 0 ⇒ lvlb_weights[0] is inf; clamp as reference
        # (ddpm_sampler.py:99 `lvlb_weights[0] = lvlb_weights[1]`).
        lvlb_weights = lvlb_weights.copy()
        lvlb_weights[0] = lvlb_weights[1]

        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(np.log(np.maximum(posterior_variance, 1e-20))),
            posterior_mean_coef1=f32(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
            posterior_mean_coef2=f32((1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)),
            lvlb_weights=f32(lvlb_weights),
            num_timesteps=num_timesteps,
            parameterization=parameterization,
            v_posterior=v_posterior,
            beta_schedule=beta_schedule,
            linear_start=linear_start,
            linear_end=linear_end,
            cosine_s=cosine_s,
        )

    # convenience -------------------------------------------------------
    def time_to_sigma(self, t: jax.Array) -> jax.Array:
        """sigma(t) = sqrt(1 - alphas_cumprod[t]). Parity: ddpm_sampler.py:105."""
        return self.sqrt_one_minus_alphas_cumprod[t]

    def sigma_to_time_int(self, sigma: jax.Array) -> jax.Array:
        """Nearest-timestep lookup for a sigma. Parity: ddpm_sampler.py:109-114."""
        table = self.sqrt_one_minus_alphas_cumprod
        delta = jnp.abs(table.reshape(1, -1) - sigma.reshape(-1, 1))
        return jnp.argmin(delta, axis=-1).astype(jnp.int32)


# ----------------------------------------------------------------------
# step math (pure functions)
# ----------------------------------------------------------------------

def extract(table: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """table[t] broadcast to an ndim-rank tensor ([B,1,1,1] for images).

    Parity: dynamic/diffusionmodules/util.py:96 extract_into_tensor.
    """
    out = table[t]
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))


def q_sample(sched: DiffusionSchedule, x_start: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
    """Forward diffusion sample x_t ~ q(x_t | x_0). Parity: ddpm_sampler.py:116."""
    return (
        extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        + extract(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
    )


def q_posterior(
    sched: DiffusionSchedule, x_start: jax.Array, x_t: jax.Array, t: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Posterior q(x_{t-1} | x_t, x_0) mean/var/logvar. Parity: ddpm_sampler.py:121."""
    mean = (
        extract(sched.posterior_mean_coef1, t, x_t.ndim) * x_start
        + extract(sched.posterior_mean_coef2, t, x_t.ndim) * x_t
    )
    var = extract(sched.posterior_variance, t, x_t.ndim)
    log_var = extract(sched.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, var, log_var


def predict_start_from_noise(
    sched: DiffusionSchedule, x_t: jax.Array, t: jax.Array, noise: jax.Array
) -> jax.Array:
    """x0 = sqrt(1/ab)·x_t − sqrt(1/ab − 1)·eps. Parity: ddpm_sampler.py:132."""
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
    )


def predict_noise_from_start(
    sched: DiffusionSchedule, x_t: jax.Array, t: jax.Array, x0: jax.Array
) -> jax.Array:
    """Inverse of predict_start_from_noise."""
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x0
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)


# ----------------------------------------------------------------------
# x0 clipping / dynamic thresholding / range helpers
# ----------------------------------------------------------------------

def clip_x0(pred_x0: jax.Array, clip_denoised: bool, dtp: float) -> jax.Array:
    """Static x0 clip or Imagen dynamic thresholding.

    Parity: diffusion_utils/util.py:70-82 clip_x0_minus_one_to_one. ``dtp`` is
    the dynamic-threshold percentile; dtp >= 1.0 disables DTP and falls back to
    a plain [-1, 1] clamp when ``clip_denoised``.
    """
    if dtp < 1.0:
        flat = jnp.abs(pred_x0.reshape(pred_x0.shape[0], -1))
        s = jnp.quantile(flat, dtp, axis=-1)
        s = jnp.maximum(s, 1.0)
        s = s.reshape(s.shape[0], *((1,) * (pred_x0.ndim - 1)))
        return jnp.clip(pred_x0, -s, s) / s
    if clip_denoised:
        return jnp.clip(pred_x0, -1.0, 1.0)
    return pred_x0


def normalize_to_neg_one_to_one(img: jax.Array) -> jax.Array:
    """[0,1] -> [-1,1]. Parity: diffusion_utils/util.py:95."""
    return img * 2.0 - 1.0


def unnormalize_to_zero_to_255(img: jax.Array) -> jax.Array:
    """[-1,1] -> uint8 [0,255]. Parity: diffusion_utils/util.py:99-100."""
    return jnp.clip((img + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
