"""Optimizers and LR schedules (optax).

TPU-native rewrite of the reference optimizer factory
(`lightning_module_common.py:20-42 configure_optimizers`: Adam/AdamW over
model params only — EMA excluded by construction here since EMA is a separate
pytree) and `diffusion_utils/lr_scheduler.py:81-97 LambdaLinearScheduler`
(linear warmup f_start→f_max over warm_up_steps, then the flat/linear-decay
tail; the shipped config `config/optim/adamw.yaml` uses f_min=f_max=1 ⇒
warmup-then-constant).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import optax

__all__ = ["lambda_linear_schedule", "create_optimizer"]


def lambda_linear_schedule(
    base_lr: float,
    warm_up_steps: int = 500,
    f_start: float = 1e-6,
    f_max: float = 1.0,
    f_min: float = 1.0,
    cycle_length: float = 1e13,
) -> optax.Schedule:
    """Parity: lr_scheduler.py:81-97 (single-cycle case, which is what the
    shipped config uses)."""

    # YAML 1.1 parses exponent literals without a sign ("1.0e13") as strings;
    # coerce everything so config-sourced values always work.
    base_lr, f_start, f_max, f_min, cycle_length = map(
        float, (base_lr, f_start, f_max, f_min, cycle_length)
    )
    warm_up_steps = int(warm_up_steps)

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = (f_max - f_start) / warm_up_steps * step + f_start
        tail = f_min + (f_max - f_min) * (cycle_length - step) / cycle_length
        return base_lr * jnp.where(step < warm_up_steps, warm, tail)

    return schedule


def create_optimizer(
    name: str = "adamw",
    lr: float = 1e-4,
    wd: float = 0.0,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    scheduler: Mapping[str, Any] | None = "default",
    grad_clip: float | None = None,
    mu_dtype: str | None = None,
) -> optax.GradientTransformation:
    """Adam/AdamW with the reference warmup schedule.

    ``scheduler``: None → constant lr; "default" or a params dict → the
    LambdaLinearScheduler with those params (config/optim/adamw.yaml).
    ``grad_clip`` is an extension (the reference never clips); None = off.
    ``mu_dtype``: dtype for the first Adam moment (e.g. "bfloat16") — an
    HBM-traffic/memory knob (halves the μ stream of the weight-update
    fusions); None keeps the reference-parity f32. The ν moment stays f32
    (its rsqrt is precision-sensitive and optax exposes no nu_dtype).
    """
    if scheduler is None:
        lr_schedule: Any = lr
    else:
        params = {} if scheduler == "default" else dict(scheduler)
        lr_schedule = lambda_linear_schedule(lr, **params)

    mu = jnp.dtype(mu_dtype) if mu_dtype else None
    if name == "adamw":
        tx = optax.adamw(lr_schedule, b1=beta1, b2=beta2, eps=eps,
                         weight_decay=wd, mu_dtype=mu)
    elif name == "adam":
        # torch Adam applies L2 via weight_decay inside the update; optax's
        # additive `add_decayed_weights` before adam matches torch semantics.
        chain = []
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.adam(lr_schedule, b1=beta1, b2=beta2, eps=eps,
                                mu_dtype=mu))
        tx = optax.chain(*chain)
    else:
        raise ValueError(name)

    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx
