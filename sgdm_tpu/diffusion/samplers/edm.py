"""Karras (EDM, arXiv:2206.00364) stochastic sampler — "tero" in the registry.

TPU-native rewrite of `diffusion/sampler/tero_sampler.py:66-150`:

  * rho-7 sigma ladder sigma_max=80 → sigma_min=0.002 (:91-93),
  * gamma churn: S_churn=80, S_tmin=0.05, S_tmax=50, S_noise=1.0 (:69-86),
  * EDM denoiser preconditioning with c_skip=1, c_out=-sigma,
    c_in=1/sqrt(1+sigma²) and the *integer reverse step index* as c_noise
    (:104-111 — the reference feeds the eps-model the loop index, not a DDPM
    timestep; reproduced as-is),
  * Heun 2nd-order correction on every step (:115-141).

All per-step scalars (t_i, gamma_i, step indices) are host-precomputed numpy
and scanned over, so the sampler is one XLA program with two model calls per
step.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["edm_sample"]


def edm_sample(
    denoise_fn: Callable[..., jax.Array],
    rng: jax.Array,
    shape: tuple[int, ...],
    *,
    num_steps: int,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
    s_churn: float = 80.0,
    s_tmin: float = 0.05,
    s_tmax: float = 50.0,
    s_noise: float = 1.0,
    log_num_per_prog: int = 10,
    x_T: jax.Array | None = None,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Parity: tero_sampler.py:115-150 sample."""
    N = num_steps
    i = np.arange(N + 1, dtype=np.float64)
    t_list = (
        sigma_max ** (1.0 / rho)
        + i * (sigma_min ** (1.0 / rho) - sigma_max ** (1.0 / rho)) / (N - 1)
    ) ** rho  # [N+1]; note the reference divides by (timestep-1) (:96-98)
    gamma_list = np.where(
        (t_list[:N] >= s_tmin) & (t_list[:N] <= s_tmax),
        min(s_churn / N, math.sqrt(2) - 1),
        0.0,
    )
    # integer "time" fed to the model: reversed step index (:113 time_ti_int)
    time_int = np.arange(N, -1, -1, dtype=np.float64)

    b = shape[0]

    def denoiser(x, sigma, i_int):
        """EDM preconditioning. Parity: tero_sampler.py:104-111 denoiser_func."""
        c_in = 1.0 / jnp.sqrt(1.0 + sigma**2)
        c_noise = jnp.full((b,), i_int, dtype=jnp.float32)
        return x - sigma * denoise_fn(c_in * x, c_noise)

    init_key, scan_key = jax.random.split(rng)
    # Every sampler reachable from GaussianDiffusion.sample takes x_T as a
    # UNIT-variance latent; EDM's internal state lives at sigma_max scale,
    # so a caller-supplied x_T is scaled by t_list[0] here (feeding it in
    # raw would give the first denoiser call a ~sigma_max× too small
    # input and collapse the trajectory).
    x = (
        x_T * float(t_list[0])
        if x_T is not None
        else jax.random.normal(init_key, shape, dtype=jnp.float32) * float(t_list[0])
    )

    K = max(min(log_num_per_prog, N), 1)
    interval = -(-N // K)
    buf0 = jnp.zeros((K, *shape), dtype=jnp.float32)

    scan_in = (
        jnp.asarray(t_list[:N], dtype=jnp.float32),      # t_i
        jnp.asarray(t_list[1 : N + 1], dtype=jnp.float32),  # t_{i+1}
        jnp.asarray(gamma_list, dtype=jnp.float32),
        jnp.asarray(time_int[:N], dtype=jnp.float32),    # c_noise at step i
        jnp.asarray(time_int[1 : N + 1], dtype=jnp.float32),
        jnp.arange(N),
    )

    def body(carry, inp):
        x, key, buf = carry
        t_i, t_ip1, gamma, ci, ci1, step = inp
        key, nkey = jax.random.split(key)
        t_hat = t_i + gamma * t_i
        eps = jax.random.normal(nkey, shape, dtype=jnp.float32) * s_noise
        x_hat = x + jnp.sqrt(jnp.maximum(t_hat**2 - t_i**2, 0.0)) * eps
        d_i = (x_hat - denoiser(x_hat, t_hat, ci)) / (t_hat + 1e-20)
        x_tmp = x_hat + (t_ip1 - t_hat) * d_i
        # Heun correction (the reference applies it on every step, :134-138)
        d_prime = (x_tmp - denoiser(x_tmp, t_ip1, ci1)) / (t_ip1 + 1e-20)
        x_next = x_hat + (t_ip1 - t_hat) * 0.5 * (d_i + d_prime)
        slot = jnp.minimum(step // interval, K - 1)
        buf = jax.lax.dynamic_update_slice_in_dim(
            buf, x_next[None], slot, axis=0
        )
        return (x_next, key, buf), None

    (x, _, buf), _ = jax.lax.scan(body, (x, scan_key, buf0), scan_in)
    return x, {"pred_x0": buf, "x_inter": buf}
