"""Fused AdamW + EMA parameter update (Pallas/TPU).

Why: the round-3 roofline audit (BASELINE.md "Roofline") showed the four
XLA AdamW/EMA weight-update fusions costing ≈22 ms/step at only
~120-240 GB/s — XLA stages the f32 moment streams through S(1) VMEM
prefetch windows instead of streaming them.  The update is a pure
9-stream elementwise pass (read p, g, μ, ν, ema; write p, μ, ν, ema —
36 B/param), so a Pallas kernel that streams each tile once should run
at the chip's effective HBM rate.

Exact-math contract (so the flag can flip without changing training):
  * optax.adamw == scale_by_adam (eps_root=0, bias correction with the
    post-increment count) → add_decayed_weights → scale_by_learning_rate
    (multiply by −lr(count)); state tuple
    (ScaleByAdamState, EmptyState, ScaleByScheduleState) is reproduced
    bit-for-bit so checkpoints interop with the unfused path.
  * EMA: `e ← e − (1−d)·(e − p′)` with the LitEma warmup decay
    `d = min(decay, (1+n)/(10+n))` (models/ema.py, dynamic/ema.py:30-32).

Leaves whose size is a multiple of 1024 (8×128 tiles — every conv/dense
kernel at the shipped channel counts) and ≥ `_MIN_PALLAS` elements run
through the kernel with input→output aliasing (in-place p/μ/ν/ema, no
extra HBM allocation); small/ragged leaves (biases, norm scales) take
the identical jnp math, which XLA fuses fine at that size.

Parity: tests/test_fused_optim.py asserts bitwise/1-ulp equality vs the
optax + ema_update composition for every leaf shape class.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["make_fused_adamw_ema", "fused_adamw_ema_available"]

# below this, kernel launch overhead > fusion win; overridable so the
# launch-count/byte-coverage tradeoff can be swept on hardware
_MIN_PALLAS = int(os.environ.get("SGDM_FUSED_OPTIM_MIN", 65536))
_ROWS = 2048          # [_ROWS, 128] f32 tiles × 9 streams ≈ 9.4 MB VMEM


def _kernel(s_ref, p_ref, g_ref, mu_ref, nu_ref, e_ref,
            po_ref, muo_ref, nuo_ref, eo_ref, *, b1, b2, eps, wd):
    # s_ref (SMEM): [lr, inv_bc1, inv_bc2, one_minus_ema_d]
    lr = s_ref[0]
    inv_bc1 = s_ref[1]
    inv_bc2 = s_ref[2]
    one_minus = s_ref[3]
    g = g_ref[...]
    p = p_ref[...]
    mu = mu_ref[...] * b1 + g * (1.0 - b1)
    nu = nu_ref[...] * b2 + g * g * (1.0 - b2)
    upd = (mu * inv_bc1) / (jnp.sqrt(nu * inv_bc2) + eps) + wd * p
    p_new = p - lr * upd
    e = e_ref[...]
    muo_ref[...] = mu
    nuo_ref[...] = nu
    po_ref[...] = p_new
    eo_ref[...] = e - one_minus * (e - p_new)


def _leaf_pallas(p, g, mu, nu, ema, scalars, *, b1, b2, eps, wd,
                 interpret=False):
    n = p.size
    rows = n // 128
    shape2 = (rows, 128)
    chunk = min(_ROWS, rows)
    # grid rows must tile evenly; rows is a multiple of 8 by construction
    while rows % chunk:
        chunk //= 2
    grid = (rows // chunk,)
    block = pl.BlockSpec((chunk, 128), lambda i: (i, 0))
    out_shape = [jax.ShapeDtypeStruct(shape2, jnp.float32)] * 4
    fn = pl.pallas_call(
        partial(_kernel, b1=b1, b2=b2, eps=eps, wd=wd),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [block] * 5,
        out_specs=[block] * 4,
        out_shape=out_shape,
        input_output_aliases={1: 0, 3: 1, 4: 2, 5: 3},
        interpret=interpret,
    )
    r = lambda x: x.astype(jnp.float32).reshape(shape2)
    po, muo, nuo, eo = fn(scalars, r(p), r(g), r(mu), r(nu), r(ema))
    s = p.shape
    return (po.reshape(s), muo.reshape(s), nuo.reshape(s), eo.reshape(s))


def _leaf_jnp(p, g, mu, nu, ema, lr, inv_bc1, inv_bc2, one_minus,
              *, b1, b2, eps, wd):
    mu = mu * b1 + g * (1.0 - b1)
    nu = nu * b2 + g * g * (1.0 - b2)
    upd = (mu * inv_bc1) / (jnp.sqrt(nu * inv_bc2) + eps) + wd * p
    p_new = p - lr * upd
    e_new = ema - one_minus * (ema - p_new)
    return p_new, mu, nu, e_new


def fused_adamw_ema_available() -> bool:
    return jax.default_backend() == "tpu"


def make_fused_adamw_ema(
    lr_schedule: Callable[[jax.Array], jax.Array],
    *,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
    ema_decay: float = 0.9999,
    use_ema: bool = True,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
):
    """Build `update(grads, opt_state, params, ema_params, ema_updates)
    -> (params', opt_state', ema_params')` replacing the
    tx.update → apply_updates → ema_update chain in one pass.

    `opt_state` must be the `optax.adamw(lr_schedule, ...)` state (its
    3-tuple is consumed and reproduced — checkpoint compatible).
    """
    if use_pallas is None:
        use_pallas = fused_adamw_ema_available()

    def update(grads, opt_state, params, ema_params, ema_updates):
        adam_state, wd_state, sched_state = opt_state
        count = adam_state.count
        count_inc = optax.safe_int32_increment(count)
        t = count_inc.astype(jnp.float32)
        lr = jnp.asarray(lr_schedule(count), jnp.float32)
        inv_bc1 = 1.0 / (1.0 - b1 ** t)
        inv_bc2 = 1.0 / (1.0 - b2 ** t)
        if use_ema:
            n = ema_updates + 1
            d = jnp.minimum(ema_decay,
                            (1.0 + n.astype(jnp.float32))
                            / (10.0 + n.astype(jnp.float32)))
            one_minus = 1.0 - d
        else:
            one_minus = jnp.asarray(1.0, jnp.float32)  # ema ≡ params
        scalars = jnp.stack([lr, inv_bc1, inv_bc2, one_minus])

        flat_p, treedef = jax.tree.flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_mu = treedef.flatten_up_to(adam_state.mu)
        flat_nu = treedef.flatten_up_to(adam_state.nu)
        flat_e = treedef.flatten_up_to(ema_params)

        new_p, new_mu, new_nu, new_e = [], [], [], []
        for p, g, mu, nu, e in zip(flat_p, flat_g, flat_mu, flat_nu, flat_e):
            # bf16-μ leaves (optim mu_dtype knob) take the jnp path: its
            # weak-type `mu * b1` rounds the decay product in bf16 exactly
            # like optax's update_moment, so parity stays bitwise; the
            # Pallas kernel is f32-only
            if (use_pallas and p.size >= _MIN_PALLAS and p.size % 1024 == 0
                    and p.dtype == jnp.float32 and mu.dtype == jnp.float32):
                po, muo, nuo, eo = _leaf_pallas(
                    p, g, mu, nu, e, scalars,
                    b1=b1, b2=b2, eps=eps, wd=weight_decay,
                    interpret=interpret)
            else:
                po, muo, nuo, eo = _leaf_jnp(
                    p, g, mu, nu, e, lr, inv_bc1, inv_bc2, one_minus,
                    b1=b1, b2=b2, eps=eps, wd=weight_decay)
            # storage dtypes are preserved (optax tree_cast semantics: a
            # bf16 μ is stored back as bf16, so the knob composes with
            # fused_optim without a silent f32 upcast / second-step
            # retrace)
            new_p.append(po.astype(p.dtype))
            new_mu.append(muo.astype(mu.dtype))
            new_nu.append(nuo.astype(nu.dtype))
            new_e.append(eo.astype(e.dtype))

        unflat = treedef.unflatten
        new_adam = optax.ScaleByAdamState(
            count=count_inc, mu=unflat(new_mu), nu=unflat(new_nu))
        # `count in _fields`, not hasattr: every optax state is a
        # namedtuple, so e.g. EmptyState (constant-lr adamw) has the
        # tuple.count METHOD and hasattr would wrongly pass
        new_sched = type(sched_state)(
            count=optax.safe_int32_increment(sched_state.count)) \
            if "count" in getattr(sched_state, "_fields", ()) else sched_state
        new_opt_state = (new_adam, wd_state, new_sched)
        params_out = unflat(new_p)
        # use_ema=False: copy, don't alias — the TrainState is donated next
        # step and an aliased params/ema pair donates one buffer twice
        ema_out = (unflat(new_e) if use_ema
                   else jax.tree.map(jnp.copy, params_out))
        return params_out, new_opt_state, ema_out

    return update
