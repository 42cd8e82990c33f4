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

__all__ = [
    "lambda_linear_schedule",
    "lambda_warmup_cosine_schedule",
    "lambda_warmup_cosine_schedule2",
    "create_optimizer",
]


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


def lambda_warmup_cosine_schedule(
    base_lr: float,
    warm_up_steps: int,
    lr_min: float,
    lr_max: float,
    lr_start: float,
    max_decay_steps: int,
) -> optax.Schedule:
    """Parity: lr_scheduler.py:4-33 ``LambdaWarmUpCosineScheduler`` —
    linear warmup lr_start→lr_max over warm_up_steps, then half-cosine
    decay to lr_min over max_decay_steps (clamped flat after).  The
    reference uses it as an LR *multiplier* ("use with a base_lr of 1.0");
    pass ``base_lr`` accordingly."""
    lr_min, lr_max, lr_start = map(float, (lr_min, lr_max, lr_start))
    warm_up_steps, max_decay_steps = int(warm_up_steps), int(max_decay_steps)

    def schedule(step):
        n = jnp.asarray(step, dtype=jnp.float32)
        warm = (lr_max - lr_start) / warm_up_steps * n + lr_start
        t = jnp.minimum(
            (n - warm_up_steps) / (max_decay_steps - warm_up_steps), 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * jnp.pi))
        return float(base_lr) * jnp.where(n < warm_up_steps, warm, cos)

    return schedule


def lambda_warmup_cosine_schedule2(
    base_lr: float,
    warm_up_steps,
    f_min,
    f_max,
    f_start,
    cycle_lengths,
) -> optax.Schedule:
    """Parity: lr_scheduler.py:36-80 ``LambdaWarmUpCosineScheduler2`` —
    repeated warmup+cosine cycles configured by per-cycle lists.  Interval
    selection matches the reference's ``find_in_interval`` (``n <= cum``
    boundary: the first step of cycle c+1 is the step AFTER cum_cycles[c+1],
    i.e. boundary steps still belong to the earlier cycle)."""
    import numpy as np

    warm = np.asarray([int(w) for w in warm_up_steps])
    fmin = np.asarray([float(f) for f in f_min])
    fmax = np.asarray([float(f) for f in f_max])
    fstart = np.asarray([float(f) for f in f_start])
    lens = np.asarray([float(c) for c in cycle_lengths])
    assert len(warm) == len(fmin) == len(fmax) == len(fstart) == len(lens)
    cum = np.concatenate([[0.0], np.cumsum(lens)])
    ncyc = len(lens)

    def schedule(step):
        n = jnp.asarray(step, dtype=jnp.float32)
        # reference: first interval i with n <= cum[i+1]
        cyc = jnp.clip(
            jnp.sum(n > jnp.asarray(cum[1:], dtype=jnp.float32)), 0, ncyc - 1)
        w = jnp.asarray(warm, dtype=jnp.float32)[cyc]
        fm, fx = jnp.asarray(fmin)[cyc], jnp.asarray(fmax)[cyc]
        fs = jnp.asarray(fstart)[cyc]
        cl = jnp.asarray(lens, dtype=jnp.float32)[cyc]
        nn = n - jnp.asarray(cum[:-1], dtype=jnp.float32)[cyc]
        warm_f = (fx - fs) / w * nn + fs
        t = jnp.minimum((nn - w) / (cl - w), 1.0)
        cos_f = fm + 0.5 * (fx - fm) * (1 + jnp.cos(t * jnp.pi))
        return float(base_lr) * jnp.where(nn < w, warm_f, cos_f)

    return schedule


_SCHEDULES = {
    "lambda_linear": lambda_linear_schedule,
    "lambda_warmup_cosine": lambda_warmup_cosine_schedule,
    "lambda_warmup_cosine2": lambda_warmup_cosine_schedule2,
}


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
    A params dict may carry ``name`` ∈ {"lambda_linear",
    "lambda_warmup_cosine", "lambda_warmup_cosine2"} to select the other
    reference schedules (lr_scheduler.py:4,36); default "lambda_linear".
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
        make = _SCHEDULES[params.pop("name", "lambda_linear")]
        lr_schedule = make(lr, **params)

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
