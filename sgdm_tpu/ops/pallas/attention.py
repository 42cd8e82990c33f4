"""Fused attention kernels (Pallas/TPU) for the UNet hot spots.

The reference's two attention flavors (SURVEY.md §2.4) both operate on short
pixel-token sequences (≤ 16×16 = 256 tokens at the attention resolutions,
64×64 = 4096 at ds=1 if ever enabled):

  * `fused_self_attention` — AttentionBlock/QKVAttention
    (openaimodel.py:323-465): per-head scale 1/sqrt(sqrt(d)) on q AND k,
    fp32 softmax,
  * `fused_null_kv_attention` — Attention_LR (crossattetion_lr.py:50-142):
    multi-query KV (single head shared across query heads) with the learned
    null-KV and projected context tokens prepended.

Design: sequence lengths here fit VMEM whole, so each (batch, head) grid
cell computes its full attention in one shot — logits, fp32 softmax and the
value contraction never round-trip to HBM (the win over unfused XLA).
Backward recomputes attention from the residuals (flash-style custom VJP),
so the kernels are usable in the train step too.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_self_attention", "fused_null_kv_attention"]


def _self_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32) * scale   # [N, D]
    k = k_ref[0].astype(jnp.float32) * scale
    v = v_ref[0]
    logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o_ref[0] = jnp.dot(w, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_self_attention(q, k, v, interpret: bool = False):
    """q,k,v: [B, H, N, D] → out [B, H, N, D].

    Scale = 1/sqrt(sqrt(D)) applied to BOTH q and k inside the kernel
    (fp16-stability trick, openaimodel.py:446-452).
    """
    return _self_fwd_impl(q, k, v, interpret)


def _self_fwd_impl(q, k, v, interpret):
    b, h, n, d = q.shape
    scale = 1.0 / (d ** 0.25)
    grid = (b * h,)
    spec = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vf = v.reshape(b * h, n, d)
    out = pl.pallas_call(
        partial(_self_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, n, d)


def _self_fwd(q, k, v, interpret):
    return _self_fwd_impl(q, k, v, interpret), (q, k, v)


def _self_bwd(interpret, res, g):
    q, k, v = res
    d = q.shape[-1]
    scale = 1.0 / (d ** 0.25)

    # recompute attention in fp32 (sequences are small; XLA backward here is
    # cheap and fusible — a hand-written bwd kernel buys little at N<=4096)
    def attn(q, k, v):
        logits = jnp.einsum(
            "bhnd,bhmd->bhnm", q * scale, k * scale,
            preferred_element_type=jnp.float32,
        )
        w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
        return jnp.einsum("bhnm,bhmd->bhnd", w, v)

    _, vjp = jax.vjp(attn, q, k, v)
    return vjp(g)


fused_self_attention.defvjp(_self_fwd, _self_bwd)


# ----------------------------------------------------------------------


def _null_kv_kernel(q_ref, k_ref, v_ref, o_ref):
    """q: [1, Hq*N, D] viewed per grid cell; k/v single-head [1, M, D]."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o_ref[0] = jnp.dot(w, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_null_kv_attention(q, kv_k, kv_v, interpret: bool = False):
    """Multi-query attention: q [B, N, H, D] (pre-scaled), single-head
    k/v [B, M, D] (already = [null ‖ context ‖ self]).  Returns [B, N, H, D].

    Parity: crossattetion_lr.py:113-137 (einsum 'b h i d, b j d -> b h i j'
    then fp32 softmax then 'b h i j, b j d').
    """
    return _nkv_impl(q, kv_k, kv_v, interpret)


def _nkv_impl(q, kv_k, kv_v, interpret):
    b, n, h, d = q.shape
    m = kv_k.shape[1]
    qf = q.transpose(0, 2, 1, 3).reshape(b, h * n, d)
    out = pl.pallas_call(
        _null_kv_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h * n, d), q.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h * n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h * n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(qf, kv_k, kv_v)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)


def _nkv_fwd(q, kv_k, kv_v, interpret):
    return _nkv_impl(q, kv_k, kv_v, interpret), (q, kv_k, kv_v)


def _nkv_bwd(interpret, res, g):
    q, kv_k, kv_v = res

    def attn(q, k, v):
        sim = jnp.einsum("bnhd,bjd->bhnj", q, k,
                         preferred_element_type=jnp.float32)
        w = jax.nn.softmax(sim.astype(jnp.float32), -1).astype(q.dtype)
        return jnp.einsum("bhnj,bjd->bnhd", w, v)

    _, vjp = jax.vjp(attn, q, kv_k, kv_v)
    return vjp(g)


fused_null_kv_attention.defvjp(_nkv_fwd, _nkv_bwd)


def flash_attention_parity_check(b: int = 2, h: int = 8, n: int = 256,
                                 d: int = 64) -> dict:
    """Cheap on-chip fwd+grad parity of jax's TPU flash-attention vs the
    XLA einsum path (the two interchangeable attention routes in
    models.layers.SelfAttentionBlock).

    Run from bench.py on every TPU bench so a kernel regression cannot ship
    silently behind the docstring's round-2 numbers (fwd ≤1 bf16 ulp,
    grads ≤0.6 % rel).  Returns {'fwd_max_abs': .., 'grad_max_rel': ..};
    raises AssertionError beyond 2 % tolerance.
    """
    import math

    import numpy as np
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(k2, (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(k3, (b, h, n, d), jnp.bfloat16)

    def xla_attn(q):
        scale = 1.0 / math.sqrt(math.sqrt(d))
        logits = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k * scale,
                            preferred_element_type=jnp.float32)
        w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
        return jnp.einsum("bhnm,bhmd->bhnd", w, v)

    bs = BlockSizes(
        block_q=n, block_k_major=n, block_k=n, block_b=1,
        block_q_major_dkv=n, block_k_major_dkv=n, block_k_dkv=n,
        block_q_dkv=n, block_k_major_dq=n, block_k_dq=n, block_q_dq=n,
    )

    def flash(q):
        return flash_attention(q, k, v, sm_scale=1.0 / math.sqrt(d),
                               block_sizes=bs)

    of = np.asarray(jax.jit(flash)(q), np.float32)
    ox = np.asarray(jax.jit(xla_attn)(q), np.float32)
    fwd_err = float(np.abs(of - ox).max())
    gf = np.asarray(jax.jit(jax.grad(
        lambda q: (flash(q).astype(jnp.float32) ** 2).sum()))(q), np.float32)
    gx = np.asarray(jax.jit(jax.grad(
        lambda q: (xla_attn(q).astype(jnp.float32) ** 2).sum()))(q), np.float32)
    grad_rel = float(np.abs(gf - gx).max() / max(np.abs(gx).max(), 1e-9))
    assert fwd_err < 0.02, f"flash fwd parity broke: {fwd_err}"
    assert grad_rel < 0.02, f"flash grad parity broke: {grad_rel}"
    return {"fwd_max_abs": fwd_err, "grad_max_rel": grad_rel}
