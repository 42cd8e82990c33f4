"""DDPM training loss (eps / x0 parameterization).

TPU-native rewrite of the reference training objective
(`diffusion/ddpm.py:45-107`): sample t ~ U[0, T), q_sample to x_t, run the
denoiser with per-sample Bernoulli condition drop, regress noise (eps) or
x_start (x0) under l1/l2/huber, reduce per-sample then mean.  Returns the
per-sample loss and timesteps too so the trainer can log the loss-vs-t
scatter the reference tracks (`ddpm.py:83-85` epoch_stats_x/y).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from .guidance import prob_mask_like
from .schedule import DiffusionSchedule, q_sample

__all__ = ["pointwise_loss", "p_losses"]


def pointwise_loss(pred: jax.Array, target: jax.Array, loss_type: str) -> jax.Array:
    """Elementwise loss. Parity: diffusion/ddpm.py:89-107 get_loss."""
    if loss_type == "l1":
        return jnp.abs(target - pred)
    if loss_type == "l2":
        return (target - pred) ** 2
    if loss_type == "huber":  # torch smooth_l1 with beta=1
        d = jnp.abs(target - pred)
        return jnp.where(d < 1.0, 0.5 * d ** 2, d - 0.5)
    raise NotImplementedError(f"unknown loss type '{loss_type}'")


def p_losses(
    sched: DiffusionSchedule,
    denoise_fn: Callable[..., jax.Array],
    rng: jax.Array,
    x_start: jax.Array,
    cond_kwargs: dict[str, Any] | None = None,
    cond_drop_prob: float = 0.0,
    loss_type: str = "l2",
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """One training-loss evaluation. Parity: diffusion/ddpm.py:45-87.

    ``denoise_fn(x_t, t, cond_drop_mask=..., **cond_kwargs) -> eps_hat``.
    Returns (scalar loss, dict with per-sample stats for logging).
    """
    cond_kwargs = dict(cond_kwargs or {})
    b = x_start.shape[0]
    t_key, noise_key, drop_key = jax.random.split(rng, 3)

    t = jax.random.randint(t_key, (b,), 0, sched.num_timesteps)
    noise = jax.random.normal(noise_key, x_start.shape, dtype=x_start.dtype)
    x_noisy = q_sample(sched, x_start, t, noise)

    drop_mask = prob_mask_like(drop_key, b, cond_drop_prob)
    model_out = denoise_fn(x_noisy, t, cond_drop_mask=drop_mask, **cond_kwargs)

    if sched.parameterization == "eps":
        target = noise
    elif sched.parameterization == "x0":
        target = x_start
    else:
        raise NotImplementedError(sched.parameterization)

    loss_elem = pointwise_loss(model_out, target, loss_type)
    loss_per_sample = loss_elem.reshape(b, -1).mean(axis=-1)
    loss = loss_per_sample.mean()

    return loss, {
        "ddpm_loss": loss,
        "epoch_stats_x": t,              # timestep per sample
        "epoch_stats_y": loss_per_sample,  # loss per sample
    }
