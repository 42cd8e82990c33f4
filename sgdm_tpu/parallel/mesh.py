"""Device mesh and sharding utilities — the NCCL/DDP replacement.

The reference's only parallelism is Lightning DDP over NCCL (SURVEY.md §2.2):
batch split across ranks, gradients all-reduced, params replicated.  The
TPU-native equivalent (SURVEY.md §5.8) is a 1-D ``Mesh(('data',))`` with the
batch sharded over 'data' and parameters replicated; `jax.jit` with these
output shardings makes XLA insert the gradient `psum` over ICI automatically.

A second optional axis ``'model'`` is exposed for tensor-sharding larger
models (the reference never needs it — its models fit one chip — but the
mesh API is built for it so scaling up is a config change, not a rewrite).

Multi-host: `jax.distributed.initialize()` before any jax call; each process
feeds its host-local batch shard (see `data.pipeline`), mirroring the
reference's per-rank DataLoaders.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "create_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "local_batch_slice",
]


def create_mesh(
    devices: Sequence[jax.Device] | None = None,
    axis_names: tuple[str, ...] = ("data",),
    shape: tuple[int, ...] | None = None,
) -> Mesh:
    """Build a device mesh.  Default: all devices on a 1-D 'data' axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def data_sharding(mesh: Mesh, batch_axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) over the data axis; everything else replicated."""
    return NamedSharding(mesh, P(batch_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, batch_axis: str = "data") -> Any:
    """Place a host batch pytree on the mesh with dim 0 sharded.

    Single-process: a plain sharded `device_put`.  Multi-host: each process
    holds only its `local_batch_slice` of the global batch (the loader
    loaded just that slice), and the pieces are assembled into one global
    jax.Array via `make_array_from_process_local_data` — the distributed
    analogue of DDP's per-rank batches (SURVEY.md §5.8).
    """
    sharding = data_sharding(mesh, batch_axis)
    multihost = jax.process_count() > 1

    def put(x):
        if x is None:
            return None
        if multihost:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def local_batch_slice(
    global_batch: int,
    *,
    process_index: int | None = None,
    process_count: int | None = None,
) -> slice:
    """This process's slice of the global batch (multi-host input pipeline).

    Mirrors the reference's per-rank DataLoader split (each DDP rank loads
    its own shard; SURVEY.md §5.8).  Pass explicit index/count to simulate
    multi-process splits in tests.
    """
    n_proc = process_count if process_count is not None else jax.process_count()
    i = process_index if process_index is not None else jax.process_index()
    assert global_batch % n_proc == 0, (global_batch, n_proc)
    per = global_batch // n_proc
    return slice(i * per, (i + 1) * per)
