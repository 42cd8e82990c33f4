"""Exponential moving average of parameters, as a pure pytree update.

TPU-native rewrite of `dynamic/ema.py:5-76 LitEma`: the torch version keeps
name-mangled shadow buffers and mutates them in-place; here the EMA is just a
second params pytree updated functionally inside the jitted train step —
`e ← e − (1−d)·(e − p)` with the same warmup
`d = min(decay, (1 + n) / (10 + n))` (`ema.py:30-32`).

The reference's store/copy_to/restore context-manager dance
(`lightning_module.py:90-103 ema_scope`) is unnecessary in a functional
framework: evaluation simply *passes* `state.ema_params` instead of
`state.params`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ema_decay_schedule", "ema_update"]


def ema_decay_schedule(decay: float, num_updates: jax.Array) -> jax.Array:
    """Warmup-capped decay. Parity: dynamic/ema.py:30-32."""
    n = num_updates.astype(jnp.float32)
    return jnp.minimum(decay, (1.0 + n) / (10.0 + n))


def ema_update(ema_params, params, num_updates: jax.Array, decay: float = 0.9999):
    """One EMA step over the whole parameter pytree.

    ``num_updates`` is the post-increment update counter (the reference
    increments before computing the decay, ema.py:29-30).
    """
    d = ema_decay_schedule(decay, num_updates)
    one_minus = 1.0 - d
    return jax.tree.map(lambda e, p: e - one_minus * (e - p), ema_params, params)
