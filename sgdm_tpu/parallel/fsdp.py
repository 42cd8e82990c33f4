"""FSDP / ZeRO-3-style parameter + optimizer-state sharding.

The reference's only parallelism is DDP (params fully replicated on every
rank, Lightning `strategy=ddp`, SURVEY.md §2.2) — fine for its ≤100M-param
UNets, but replicating the f32 Adam moments + EMA costs 16 bytes/param on
EVERY chip.  This module is the TPU-native zero-redundancy extension:
each parameter leaf (and its Adam moments and EMA shadow, which share the
leaf's shape) is sharded over the existing ``'data'`` mesh axis, expressed
purely as `PartitionSpec`s on the TrainState.  XLA's SPMD partitioner then
inserts the all-gathers (params, forward/backward) and reduce-scatters
(gradients) over ICI — the standard ZeRO-3 schedule, compiler-derived
rather than hand-written, and the train-step math is unchanged (verified
by the single-device-equivalence test, `tests/test_fsdp.py`).

Memory: per-chip optimizer+EMA state drops by ~the data-axis size
(12 bytes/param of f32 μ/ν/EMA shard; the bf16/f32 params themselves also
shard, re-gathered transiently per layer).  Composes with tensor
parallelism: on a 2-D ``('data','model')`` mesh the TP specs
(`parallel/tp.py`) claim their dim first and FSDP shards a remaining free
dim over ``'data'`` (the "hybrid sharded" layout, e.g. in_conv kernels
[3,3,Cin,Cout] → P(None, None, 'data', 'model')).

Leaves smaller than ``min_size`` elements stay replicated — gathering a
32-float GroupNorm scale over ICI costs more latency than the bytes are
worth (same policy as every production FSDP).
"""

from __future__ import annotations

import math
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "fsdp_param_pspecs",
    "train_state_pspecs",
    "state_sharding",
    "shard_train_state",
    "DEFAULT_MIN_SIZE",
]

# below this many elements a leaf is not worth gathering (GN scales,
# biases, counters) — replicate instead
DEFAULT_MIN_SIZE = 1024


def _fsdp_spec(shape, base: P, axis: str, axis_size: int,
               min_size: int) -> P:
    """Extend ``base`` (an existing, possibly-TP spec) with one ``axis``
    shard on the largest still-free divisible dim; replicated fallback."""
    ndim = len(shape)
    if ndim == 0 or math.prod(shape) < min_size:
        return base
    entries = list(base) + [None] * (ndim - len(base))
    if axis in entries:  # already FSDP-sharded (defensive)
        return base
    free = [
        d for d in range(ndim)
        if entries[d] is None and shape[d] % axis_size == 0
        and shape[d] >= axis_size
    ]
    if not free:
        return base
    d = max(free, key=lambda i: shape[i])
    entries[d] = axis
    return P(*entries)


def fsdp_param_pspecs(
    params: Any,
    *,
    axis: str = "data",
    axis_size: int,
    min_size: int = DEFAULT_MIN_SIZE,
    base_pspecs: Any | None = None,
) -> Any:
    """PartitionSpec tree (same structure as ``params``) sharding every
    large-enough leaf over ``axis``.  ``base_pspecs``: an existing spec
    tree (e.g. `tp.unet_param_pspecs`) to compose with — TP keeps its dim,
    FSDP takes a remaining one."""
    if base_pspecs is None:
        base_pspecs = jax.tree.map(lambda _: P(), params)
    return jax.tree.map(
        lambda leaf, base: _fsdp_spec(
            getattr(leaf, "shape", ()), base, axis, axis_size, min_size),
        params, base_pspecs,
        is_leaf=lambda x: isinstance(x, P),
    )


def train_state_pspecs(
    state: Any,
    *,
    axis: str = "data",
    axis_size: int,
    min_size: int = DEFAULT_MIN_SIZE,
    base_pspecs: Any | None = None,
) -> Any:
    """Spec tree for a whole TrainState: params, ema_params and the Adam
    moment trees shard identically (their leaves share the param shapes);
    scalars/counters replicate."""
    if base_pspecs is None:
        base_pspecs = jax.tree.map(lambda _: P(), state)
    return jax.tree.map(
        lambda leaf, base: _fsdp_spec(
            getattr(leaf, "shape", ()), base, axis, axis_size, min_size)
        if getattr(leaf, "ndim", 0) >= 1 else P(),
        state, base_pspecs,
        is_leaf=lambda x: isinstance(x, P),
    )


def state_sharding(
    state: Any,
    mesh: Mesh,
    *,
    axis: str = "data",
    tp_axis: str = "model",
    min_size: int = DEFAULT_MIN_SIZE,
) -> Any:
    """NamedSharding tree for ``state`` on ``mesh``: FSDP over ``axis``,
    composed with tensor-parallel specs when the mesh has a >1 ``tp_axis``
    (the hybrid dp-sharded × model-sharded layout)."""
    base = None
    if tp_axis in mesh.axis_names and mesh.shape[tp_axis] > 1:
        from .tp import train_state_pspecs as tp_state_pspecs

        base = tp_state_pspecs(state, axis=tp_axis,
                               axis_size=mesh.shape[tp_axis])
    if axis not in mesh.axis_names or mesh.shape[axis] == 1:
        if base is None:
            repl = NamedSharding(mesh, P())
            return jax.tree.map(lambda _: repl, state)
        pspecs = base
    else:
        pspecs = train_state_pspecs(
            state, axis=axis, axis_size=mesh.shape[axis],
            min_size=min_size, base_pspecs=base)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_train_state(
    state: Any,
    mesh: Mesh,
    *,
    axis: str = "data",
    tp_axis: str = "model",
    min_size: int = DEFAULT_MIN_SIZE,
) -> Any:
    """Place an (unsharded) TrainState onto the mesh FSDP-sharded."""
    return jax.device_put(
        state,
        state_sharding(state, mesh, axis=axis, tp_axis=tp_axis,
                       min_size=min_size),
    )
