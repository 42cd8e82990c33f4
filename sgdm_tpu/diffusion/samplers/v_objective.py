"""crowsonkb v-objective samplers (the vendored v-diffusion package).

Parity targets: `diffusion/sampler/v_diffusion/diffusion/sampling.py`
and `.../utils.py` — the reference vendors Katherine Crowson's
v-diffusion-pytorch; its CLIP-guided CLIs can't run in this image
(zero egress, no CLIP weights), but the sampler/schedule math is the
reusable capability and is ported here in full:

  * cosine time ↔ (α, σ) ↔ log-SNR conversions and the DDPM /
    spliced-DDPM-cosine / log schedules (utils.py:39-91),
  * ancestral/DDIM `v_sample` with the η-adjusted σ split
    (sampling.py:9-50),
  * guided `v_cond_sample` — cond_fn returns a gradient w.r.t. x that
    is folded into v as −g·σ/α for t<1 (sampling.py:53-104),
  * `v_reverse_sample` DDIM inversion (sampling.py:107-135),
  * the pseudo-numerical family over the v parameterization:
    PRK4 / PLMS4 (PRK warmup), PIE2 / PLMS2, and IPLMS with its
    1→2→3→4 order ramp (sampling.py:156-311).

Models here are V-predictors: ``model_fn(x, t) -> v`` with per-sample
continuous t∈[0,1] (α=cos(tπ/2), σ=sin(tπ/2)), unlike the ε-models of
the integer-t registry samplers.

TPU design: every loop is a `lax.scan` over precomputed (t₁, t₂) step
pairs (static length ⇒ one compiled program per step count); the
multistep methods carry a fixed-size ε-history in the scan carry and
select the Adams-Bashforth order with `jnp.where` on the step index
instead of growing Python lists; warmup steps (PRK/PIE) are unrolled
outside the scan.  η-noise uses one key split per scan step.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "t_to_alpha_sigma", "alpha_sigma_to_t", "log_snr_to_alpha_sigma",
    "alpha_sigma_to_log_snr", "get_ddpm_schedule",
    "get_spliced_ddpm_cosine_schedule", "get_log_schedule",
    "v_sample", "v_cond_sample", "v_reverse_sample",
    "prk_sample", "plms_sample", "pie_sample", "plms2_sample",
    "iplms_sample",
]

ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


# ---------------------------------------------------------------------------
# schedule utilities (utils.py:39-91)
# ---------------------------------------------------------------------------

def _append_dims(x: jnp.ndarray, target_ndim: int) -> jnp.ndarray:
    return x.reshape(x.shape + (1,) * (target_ndim - x.ndim))


def t_to_alpha_sigma(t):
    """α=cos(tπ/2), σ=sin(tπ/2) (utils.py:59-62)."""
    t = jnp.asarray(t, jnp.float32)
    return jnp.cos(t * math.pi / 2), jnp.sin(t * math.pi / 2)


def alpha_sigma_to_t(alpha, sigma):
    return jnp.arctan2(sigma, alpha) / math.pi * 2


def log_snr_to_alpha_sigma(log_snr):
    log_snr = jnp.asarray(log_snr, jnp.float32)
    return (jnp.sqrt(jax.nn.sigmoid(log_snr)),
            jnp.sqrt(jax.nn.sigmoid(-log_snr)))


def alpha_sigma_to_log_snr(alpha, sigma):
    return jnp.log(alpha ** 2 / sigma ** 2)


def get_ddpm_schedule(ddpm_t):
    """DDPM-paper noise schedule as cosine time (utils.py:71-75)."""
    log_snr = -jnp.log(jnp.expm1(1e-4 + 10 * jnp.asarray(ddpm_t) ** 2))
    alpha, sigma = log_snr_to_alpha_sigma(log_snr)
    return alpha_sigma_to_t(alpha, sigma)


def get_spliced_ddpm_cosine_schedule(t):
    """Spliced DDPM/cosine schedule (utils.py:78-84)."""
    ddpm_crossover = 0.48536712
    cosine_crossover = 0.80074257
    big_t = jnp.asarray(t) * (1 + cosine_crossover - ddpm_crossover)
    ddpm_part = get_ddpm_schedule(big_t + ddpm_crossover - cosine_crossover)
    return jnp.where(big_t < cosine_crossover, big_t, ddpm_part)


def get_log_schedule(t, min_log_snr=-10.0, max_log_snr=10.0):
    """Log-SNR-linear schedule (utils.py:87-91)."""
    log_snr = jnp.asarray(t) * (min_log_snr - max_log_snr) + max_log_snr
    alpha, sigma = log_snr_to_alpha_sigma(log_snr)
    return alpha_sigma_to_t(alpha, sigma)


def _bcast_t(t, batch: int) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.asarray(t, jnp.float32), (batch,))


# ---------------------------------------------------------------------------
# ancestral / DDIM (sampling.py:9-135)
# ---------------------------------------------------------------------------

def v_sample(model_fn: ModelFn, x: jnp.ndarray, steps: jnp.ndarray,
             eta: float = 0.0, rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """sampling.py:10-50 — returns the final denoised prediction."""
    return _v_sample_impl(model_fn, x, steps, eta, rng, cond_fn=None)


def v_cond_sample(model_fn: ModelFn, x: jnp.ndarray, steps: jnp.ndarray,
                  cond_fn, eta: float = 0.0,
                  rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """sampling.py:54-104.  ``cond_fn(x, t, pred) -> grad`` returns the
    guidance gradient w.r.t. x (compute it with `jax.grad` of your loss
    through pred); folded in as v ← v − g·σ/α when t < 1."""
    return _v_sample_impl(model_fn, x, steps, eta, rng, cond_fn=cond_fn)


def _v_sample_impl(model_fn, x, steps, eta, rng, cond_fn):
    steps = jnp.asarray(steps, jnp.float32)
    n = steps.shape[0]
    b = x.shape[0]
    alphas, sigmas = t_to_alpha_sigma(steps)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def model_v(x, t_scalar, a, s):
        v = model_fn(x, _bcast_t(t_scalar, b)).astype(jnp.float32)
        if cond_fn is not None:
            pred = x * a - v * s
            g = jax.lax.stop_gradient(
                cond_fn(x, _bcast_t(t_scalar, b), pred))
            # only guide inside the schedule (steps[i] < 1, :76-80)
            v = jnp.where(t_scalar < 1.0, v - g * (s / a), v)
        return v

    def body(carry, idx):
        x, key = carry
        key, nkey = jax.random.split(key)
        a1, s1 = alphas[idx], sigmas[idx]
        a2, s2 = alphas[idx + 1], sigmas[idx + 1]
        v = model_v(x, steps[idx], a1, s1)
        pred = x * a1 - v * s1
        eps = x * s1 + v * a1
        ddim_sigma = eta * jnp.sqrt(s2 ** 2 / s1 ** 2) * \
            jnp.sqrt(1 - a1 ** 2 / a2 ** 2)
        adjusted = jnp.sqrt(jnp.maximum(s2 ** 2 - ddim_sigma ** 2, 0.0))
        x = pred * a2 + eps * adjusted
        if eta:
            x = x + jax.random.normal(nkey, x.shape, x.dtype) * ddim_sigma
        return (x, key), None

    (x, _), _ = jax.lax.scan(body, (x, rng), jnp.arange(n - 1))
    # final step: output the denoised prediction (:49-50)
    v = model_v(x, steps[n - 1], alphas[n - 1], sigmas[n - 1])
    return x * alphas[n - 1] - v * sigmas[n - 1]


def v_reverse_sample(model_fn: ModelFn, x: jnp.ndarray,
                     steps: jnp.ndarray) -> jnp.ndarray:
    """DDIM inversion: find the latent producing x (sampling.py:108-135).
    `steps` ascends toward 1 (the reference passes a reversed schedule)."""
    steps = jnp.asarray(steps, jnp.float32)
    n = steps.shape[0]
    b = x.shape[0]
    alphas, sigmas = t_to_alpha_sigma(steps)

    def body(x, idx):
        v = model_fn(x, _bcast_t(steps[idx], b)).astype(jnp.float32)
        pred = x * alphas[idx] - v * sigmas[idx]
        eps = x * sigmas[idx] + v * alphas[idx]
        return pred * alphas[idx + 1] + eps * sigmas[idx + 1], None

    x, _ = jax.lax.scan(body, x, jnp.arange(n - 1))
    return x


# ---------------------------------------------------------------------------
# pseudo-numerical steps over the v parameterization (sampling.py:140-311)
# ---------------------------------------------------------------------------

def _eps_model(model_fn: ModelFn):
    """v-model → ε-model (sampling.py:140-146)."""

    def eps_fn(x, t):
        alphas, sigmas = t_to_alpha_sigma(t)
        v = model_fn(x, t).astype(jnp.float32)
        return (x * _append_dims(sigmas, x.ndim)
                + v * _append_dims(alphas, x.ndim))

    return eps_fn


def _transfer(x, eps, t_1, t_2):
    """Move x from t₁ to t₂ along the ε estimate (sampling.py:156-161)."""
    alphas, sigmas = t_to_alpha_sigma(t_1)
    next_alphas, next_sigmas = t_to_alpha_sigma(t_2)
    pred = ((x - eps * _append_dims(sigmas, x.ndim))
            / _append_dims(alphas, x.ndim))
    x = (pred * _append_dims(next_alphas, x.ndim)
         + eps * _append_dims(next_sigmas, x.ndim))
    return x, pred


def _prk_step(eps_fn, x, t_1, t_2):
    """4th-order pseudo Runge-Kutta (sampling.py:164-176)."""
    t_mid = (t_2 + t_1) / 2
    eps_1 = eps_fn(x, t_1)
    x_1, _ = _transfer(x, eps_1, t_1, t_mid)
    eps_2 = eps_fn(x_1, t_mid)
    x_2, _ = _transfer(x, eps_2, t_1, t_mid)
    eps_3 = eps_fn(x_2, t_mid)
    x_3, _ = _transfer(x, eps_3, t_1, t_2)
    eps_4 = eps_fn(x_3, t_2)
    eps_prime = (eps_1 + 2 * eps_2 + 2 * eps_3 + eps_4) / 6
    x_new, pred = _transfer(x, eps_prime, t_1, t_2)
    return x_new, eps_prime, pred


def _pie_step(eps_fn, x, t_1, t_2):
    """2nd-order pseudo improved Euler (sampling.py:224-231)."""
    eps_1 = eps_fn(x, t_1)
    x_1, _ = _transfer(x, eps_1, t_1, t_2)
    eps_2 = eps_fn(x_1, t_2)
    eps_prime = (eps_1 + eps_2) / 2
    x_new, pred = _transfer(x, eps_prime, t_1, t_2)
    return x_new, eps_prime, pred


def _pad_steps(steps, is_reverse):
    steps = jnp.asarray(steps, jnp.float32)
    if not is_reverse:
        steps = jnp.concatenate([steps, jnp.zeros((1,), steps.dtype)])
    return steps


def prk_sample(model_fn: ModelFn, x: jnp.ndarray, steps: jnp.ndarray,
               is_reverse: bool = False) -> jnp.ndarray:
    """PRK4 sampler (sampling.py:189-200)."""
    steps = _pad_steps(steps, is_reverse)
    b = x.shape[0]
    eps_fn = _eps_model(model_fn)

    def body(x, ts):
        t1, t2 = ts
        x, _, _ = _prk_step(eps_fn, x, _bcast_t(t1, b), _bcast_t(t2, b))
        return x, None

    x, _ = jax.lax.scan(body, x, (steps[:-1], steps[1:]))
    return x


def pie_sample(model_fn: ModelFn, x: jnp.ndarray, steps: jnp.ndarray,
               is_reverse: bool = False) -> jnp.ndarray:
    """PIE2 sampler (sampling.py:244-255)."""
    steps = _pad_steps(steps, is_reverse)
    b = x.shape[0]
    eps_fn = _eps_model(model_fn)

    def body(x, ts):
        t1, t2 = ts
        x, _, _ = _pie_step(eps_fn, x, _bcast_t(t1, b), _bcast_t(t2, b))
        return x, None

    x, _ = jax.lax.scan(body, x, (steps[:-1], steps[1:]))
    return x


def plms_sample(model_fn: ModelFn, x: jnp.ndarray, steps: jnp.ndarray,
                is_reverse: bool = False) -> jnp.ndarray:
    """PLMS4: 3 PRK warmup steps, then AB4 over ε history
    (sampling.py:179-185, :204-221)."""
    steps = _pad_steps(steps, is_reverse)
    n = int(steps.shape[0])
    b = x.shape[0]
    eps_fn = _eps_model(model_fn)

    hist = []
    warm = min(3, n - 1)
    for i in range(warm):  # unrolled PRK warmup
        x, eps, _ = _prk_step(eps_fn, x, _bcast_t(steps[i], b),
                              _bcast_t(steps[i + 1], b))
        hist.append(eps)
    if n - 1 <= 3:
        return x

    def body(carry, ts):
        x, e1, e2, e3 = carry  # e1 = most recent
        t1, t2 = ts
        eps = eps_fn(x, _bcast_t(t1, b))
        eps_prime = (55 * eps - 59 * e1 + 37 * e2 - 9 * e3) / 24
        x_new, _ = _transfer(x, eps_prime, _bcast_t(t1, b), _bcast_t(t2, b))
        return (x_new, eps, e1, e2), None

    carry = (x, hist[2], hist[1], hist[0])
    (x, _, _, _), _ = jax.lax.scan(body, carry, (steps[3:-1], steps[4:]))
    return x


def plms2_sample(model_fn: ModelFn, x: jnp.ndarray, steps: jnp.ndarray,
                 is_reverse: bool = False) -> jnp.ndarray:
    """PLMS2: 1 PIE warmup step then AB2 (sampling.py:234-240, :259-276)."""
    steps = _pad_steps(steps, is_reverse)
    n = int(steps.shape[0])
    b = x.shape[0]
    eps_fn = _eps_model(model_fn)

    x, old_eps, _ = _pie_step(eps_fn, x, _bcast_t(steps[0], b),
                              _bcast_t(steps[1], b))
    if n - 1 <= 1:
        return x

    def body(carry, ts):
        x, e1 = carry
        t1, t2 = ts
        eps = eps_fn(x, _bcast_t(t1, b))
        eps_prime = (3 * eps - e1) / 2
        x_new, _ = _transfer(x, eps_prime, _bcast_t(t1, b), _bcast_t(t2, b))
        return (x_new, eps), None

    (x, _), _ = jax.lax.scan(body, (x, old_eps), (steps[1:-1], steps[2:]))
    return x


def iplms_sample(model_fn: ModelFn, x: jnp.ndarray, steps: jnp.ndarray,
                 is_reverse: bool = False) -> jnp.ndarray:
    """Improved PLMS with the 1→2→3→4 order ramp (sampling.py:279-311).
    The first three steps run at orders 1/2/3 (unrolled); the scan body
    is pure order-4."""
    steps = _pad_steps(steps, is_reverse)
    n = int(steps.shape[0])
    b = x.shape[0]
    eps_fn = _eps_model(model_fn)

    coeffs = [
        (1.0, 0.0, 0.0, 0.0),
        (3 / 2, -1 / 2, 0.0, 0.0),
        (23 / 12, -16 / 12, 5 / 12, 0.0),
    ]
    hist = []
    warm = min(3, n - 1)
    for i in range(warm):
        eps = eps_fn(x, _bcast_t(steps[i], b))
        c0, c1, c2, _ = coeffs[i]
        eps_prime = c0 * eps
        if i >= 1:
            eps_prime = eps_prime + c1 * hist[-1]
        if i >= 2:
            eps_prime = eps_prime + c2 * hist[-2]
        x, _ = _transfer(x, eps_prime, _bcast_t(steps[i], b),
                         _bcast_t(steps[i + 1], b))
        hist.append(eps)
    if n - 1 <= 3:
        return x

    def body(carry, ts):
        x, e1, e2, e3 = carry
        t1, t2 = ts
        eps = eps_fn(x, _bcast_t(t1, b))
        eps_prime = (55 * eps - 59 * e1 + 37 * e2 - 9 * e3) / 24
        x_new, _ = _transfer(x, eps_prime, _bcast_t(t1, b), _bcast_t(t2, b))
        return (x_new, eps, e1, e2), None

    carry = (x, hist[2], hist[1], hist[0])
    (x, _, _, _), _ = jax.lax.scan(body, carry, (steps[3:-1], steps[4:]))
    return x
