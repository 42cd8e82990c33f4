"""Shared sampler utilities.

The reference samplers are Python loops that append intermediate tensors to
lists (`diffusion/sampler/ddpm_sampler.py:194-238`,
`ddim_plms_sampler.py:302-343`).  Under `lax.scan` every iteration must have
static shapes, so progressive logging uses a fixed K-slot buffer: step i
writes to slot i // interval (clamped), which leaves each slot holding the
last state of its interval — the same ~`log_num_per_prog` checkpoint chain
the reference visualizes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ProgressiveLog", "write_slot", "noise_like"]


def noise_like(key: jax.Array, shape, repeat: bool = False, dtype=jnp.float32) -> jax.Array:
    """Gaussian noise, optionally repeated across batch.

    Parity: dynamic/diffusionmodules/util.py noise_like (repeat_noise shares
    one noise draw across the batch).
    """
    if repeat:
        one = jax.random.normal(key, (1, *shape[1:]), dtype=dtype)
        return jnp.broadcast_to(one, shape)
    return jax.random.normal(key, shape, dtype=dtype)


class ProgressiveLog:
    """Fixed-size intermediates buffer usable inside lax.scan carries."""

    def __init__(self, num_steps: int, num_slots: int, shape, dtype=jnp.float32):
        self.num_steps = max(num_steps, 1)
        self.num_slots = max(min(num_slots, num_steps), 1)
        self.interval = -(-self.num_steps // self.num_slots)  # ceil
        self.shape = shape
        self.dtype = dtype

    def init(self) -> jax.Array:
        return jnp.zeros((self.num_slots, *self.shape), dtype=self.dtype)

    def write(self, buf: jax.Array, step_idx: jax.Array, value: jax.Array) -> jax.Array:
        slot = jnp.minimum(step_idx // self.interval, self.num_slots - 1)
        return jax.lax.dynamic_update_slice_in_dim(
            buf, value[None].astype(buf.dtype), slot, axis=0
        )


def write_slot(buf: jax.Array, slot: jax.Array, value: jax.Array) -> jax.Array:
    return jax.lax.dynamic_update_slice_in_dim(
        buf, value[None].astype(buf.dtype), slot, axis=0
    )
