"""Tensor-parallel parameter shardings for the UNet family.

The reference's only parallelism is DDP data-parallel (SURVEY.md §2.2) —
its models fit one GPU.  This module is the scaling extension the mesh
API (`parallel/mesh.py`) reserved the ``'model'`` axis for: Megatron-style
column/row sharding of the UNet's weight matrices over a 2-D
``Mesh(('data', 'model'))``, expressed purely as `PartitionSpec`s on the
parameter tree.  XLA's SPMD partitioner (GSPMD) then inserts the
all-reduces/all-gathers over ICI — no manual collectives, and the train
step's math is unchanged (verified by the single-device-equivalence test,
`tests/test_tensor_parallel.py`).

Pairing scheme (per UNet module naming, `models/unet.py`):

  * ResBlock ``in_conv`` — column split: kernel [3,3,Cin,Cout] sharded on
    Cout, bias sharded.  The GN between the convs (``out_norm``) has 32
    groups; when ``tp | 32`` every group lives on one shard and its
    scale/bias ride the sharded channel dim.
  * ResBlock ``out_conv`` — row split: kernel sharded on Cin; the partial
    products are psum'd by GSPMD and the bias (replicated) adds once.
  * Attention ``qkv`` column / ``proj_out`` row.
  * ``time_embed_1``/``mlp_cond_1`` column, ``_2`` row.
  * FiLM ``emb_proj``, skip projections, input GNs: replicated (tiny; a
    sharded 2C scale-shift table would straddle the split(…, 2) halves).

Constraints: the 'model' axis size must divide the smallest sharded
channel count (model_channels) and, for collective-free GroupNorm, the
32 GN groups.  Tensor parallelism uses the plain XLA conv path — the
fused Pallas resblock kernels are per-device programs GSPMD cannot
partition (`use_pallas=False`, the training default).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "unet_param_pspecs",
    "train_state_pspecs",
    "state_sharding",
    "shard_train_state",
]

_COL_DENSE = ("time_embed_1", "mlp_cond_1", "cond_mlp_1")  # [D,F] → shard F
_ROW_DENSE = ("time_embed_2", "mlp_cond_2", "cond_mlp_2")  # [F,D] → shard F


def _path_names(path) -> tuple[str, ...]:
    return tuple(str(getattr(k, "key", getattr(k, "name", k))) for k in path)


def _pspec_for(names: tuple[str, ...], shape, axis: str, axis_size: int):
    """PartitionSpec for one parameter leaf, keyed on its module path."""
    leaf = names[-1] if names else ""
    mod = names[-2] if len(names) >= 2 else ""

    def ok(dim: int) -> bool:
        return shape[dim] % axis_size == 0

    if mod == "in_conv":
        # stem (backbone/in_conv) and ResBlock first conv: column split
        if leaf == "kernel" and len(shape) == 4 and ok(3):
            return P(None, None, None, axis)
        if leaf == "bias" and len(shape) == 1 and ok(0):
            return P(axis)
    elif mod == "out_conv":
        # ResBlock second conv and the final out_conv: row split + psum
        if leaf == "kernel" and len(shape) == 4 and ok(2):
            return P(None, None, axis, None)
        return P()
    elif mod == "out_norm":
        # the GN between the conv pair rides in_conv's sharded channels
        if len(shape) == 1 and ok(0):
            return P(axis)
    elif mod == "qkv":
        if leaf == "kernel" and len(shape) == 2 and ok(1):
            return P(None, axis)
        if leaf == "bias" and len(shape) == 1 and ok(0):
            return P(axis)
    elif mod == "proj_out":
        if leaf == "kernel" and len(shape) == 2 and ok(0):
            return P(axis, None)
        return P()
    elif mod == "to_q":
        # Attention_LR (models/attention_lr.py): per-head query projection
        # — column split over the head·dim_head inner dim; the shared
        # single-head k/v (to_kv, null_kv) stay replicated (Megatron
        # multi-query-attention sharding)
        if leaf == "kernel" and len(shape) == 2 and ok(1):
            return P(None, axis)
    elif mod == "to_out":
        if leaf == "kernel" and len(shape) == 2 and ok(0):
            return P(axis, None)
        return P()
    elif mod in _COL_DENSE:
        if leaf == "kernel" and len(shape) == 2 and ok(1):
            return P(None, axis)
        if leaf == "bias" and len(shape) == 1 and ok(0):
            return P(axis)
    elif mod in _ROW_DENSE:
        if leaf == "kernel" and len(shape) == 2 and ok(0):
            return P(axis, None)
        return P()
    return P()


def unet_param_pspecs(params: Any, *, axis: str = "model",
                      axis_size: int) -> Any:
    """PartitionSpec tree (same structure as ``params``) for tensor
    parallelism over ``axis``.  Leaves that cannot shard cleanly fall back
    to replicated — the result is always a valid sharding."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _pspec_for(
            _path_names(path), leaf.shape, axis, axis_size),
        params,
    )


def train_state_pspecs(state: Any, *, axis: str = "model",
                       axis_size: int) -> Any:
    """PartitionSpec tree for a whole ``TrainState``: params, ema_params
    and the optimizer moment trees (whose leaf paths end with the same
    module names) get the tensor-parallel specs; counters and any
    non-matching leaves are replicated."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _pspec_for(
            _path_names(path), getattr(leaf, "shape", ()), axis, axis_size)
        if getattr(leaf, "ndim", 0) >= 1 else P(),
        state,
    )


def state_sharding(state: Any, mesh: Mesh, *, axis: str = "model") -> Any:
    """NamedSharding tree for ``state`` on ``mesh``.  If the mesh has no
    ``axis`` dimension (pure data parallelism) everything is replicated —
    the 1-D behavior `make_train_step` always had."""
    if axis not in mesh.axis_names or mesh.shape[axis] == 1:
        repl = NamedSharding(mesh, P())
        return jax.tree.map(lambda _: repl, state)
    pspecs = train_state_pspecs(state, axis=axis, axis_size=mesh.shape[axis])
    return jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_train_state(state: Any, mesh: Mesh, *, axis: str = "model") -> Any:
    """Place an (unsharded) TrainState onto the mesh with tensor-parallel
    parameter shardings."""
    return jax.device_put(state, state_sharding(state, mesh, axis=axis))
