"""Hardware-RNG key derivation for throughput-critical inner loops.

Two measured v5e costs (BASELINE.md round 2) motivate this:
  * threefry BIT generation is pure VPU arithmetic — ~3.6 ms per
    [256,64,64,128] dropout mask;
  * threefry KEY fold_in/split lower to rolled scalar `while` loops on the
    TPU scalar unit — ~28 ms/step in the fused train step, and one split
    per scan iteration inside the samplers (×250 for a DDIM-250 run).

`fast_rng_key` converts a threefry key to the `unsafe_rbg` impl: bits AND
key derivation use the TPU hardware RNG (`rng_bit_generator`), eliminating
both costs.  Training/sampling RNG needs no cross-impl reproducibility —
only run-to-run determinism, which this keeps (the derived key is a pure
function of the incoming key).  Works on CPU too (software rbg).

Statistical-quality tradeoff (documented deliberately): JAX labels
`unsafe_rbg`'s split/fold_in derivation as having weak, untested
statistical guarantees — derived streams (per-step `fold_in(rng, step)`,
per-scan-step sampler splits) are not proven independent the way threefry
streams are.  We accept this for diffusion training/sampling noise, where
the consumers are Gaussian draws and Bernoulli drop masks feeding an
SGD-style estimator: mild cross-step stream correlation perturbs neither
the loss in expectation nor sample quality measurably (round-2 check:
training-loss curves with threefry vs unsafe_rbg keys match within run-to-
run noise over 2k steps).  Anything needing audited statistics (e.g. the
k-means seeding, dataset shuffles) stays on the default threefry path —
this helper is only applied inside the jitted train/sample steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["fast_rng_key"]


def fast_rng_key(key: jax.Array) -> jax.Array:
    """threefry (typed or raw uint32[2]) key → 'unsafe_rbg' key."""
    if jnp.issubdtype(key.dtype, jnp.unsignedinteger):  # raw uint32[2] key
        key = jax.random.wrap_key_data(key)
    data = jax.random.key_data(key)
    if data.shape[-1] == 4:  # already an rbg-family key
        return jax.random.wrap_key_data(data, impl="unsafe_rbg")
    return jax.random.wrap_key_data(
        jnp.concatenate([data, data], axis=-1), impl="unsafe_rbg"
    )
