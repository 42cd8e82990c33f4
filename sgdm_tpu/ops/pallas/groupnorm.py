"""Fused GroupNorm(+FiLM)+SiLU (Pallas/TPU).

The ResBlock hot path (openaimodel.py:313-315, our models.layers.ResBlock)
chains GroupNorm32 → FiLM `h*(1+scale)+shift` → SiLU between convs.  Unfused,
the fp32 normalize/affine/FiLM/SiLU chain writes several full-size
intermediates through HBM; here the *apply* stage is one chunked Pallas
kernel that keeps each [chunk, C] tile resident in VMEM, while the group
statistics (two cheap reductions XLA fuses well) stay in XLA — computing
stats in-kernel would need the whole [HW, C] sample in VMEM, which OOMs at
64²×384.

`fused_groupnorm_silu(x, gamma, beta, film_scale, film_shift)`:
  x [B, H, W, C]; gamma/beta [C]; film_* [B, C] or None.
  out = silu(GN(x) * (1 + film_scale) + film_shift)  in x.dtype.

Backward falls back to the XLA composition via custom VJP (recompute).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_groupnorm_silu"]

_CHUNK = 1024  # rows of [chunk, C] per grid cell; 1024×512×4B = 2 MB


def _apply_kernel(x_ref, mean_ref, rstd_ref, gamma_ref, beta_ref,
                  fs_ref, fsh_ref, o_ref, *, with_film: bool):
    x = x_ref[0].astype(jnp.float32)                 # [chunk, C]
    mean = mean_ref[0].astype(jnp.float32)           # [1, C]
    rstd = rstd_ref[0].astype(jnp.float32)
    h = (x - mean) * rstd
    h = h * gamma_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    if with_film:
        h = h * (1.0 + fs_ref[0].astype(jnp.float32)) + fsh_ref[0].astype(jnp.float32)
    o_ref[0] = (h * jax.nn.sigmoid(h)).astype(o_ref.dtype)


def _group_stats(x: jax.Array, num_groups: int, eps: float):
    """Per-(B, group) mean/rstd, broadcast back to per-channel [B, 1, C]."""
    b, hw, c = x.shape
    gs = c // num_groups
    x32 = x.astype(jnp.float32).reshape(b, hw, num_groups, gs)
    mean_g = x32.mean(axis=(1, 3))                   # [B, G]
    var_g = jnp.square(x32).mean(axis=(1, 3)) - jnp.square(mean_g)
    rstd_g = jax.lax.rsqrt(jnp.maximum(var_g, 0.0) + eps)
    expand = lambda t: jnp.repeat(t, gs, axis=-1).reshape(b, 1, c)
    return expand(mean_g), expand(rstd_g)


def _impl(x, gamma, beta, film_scale, film_shift, num_groups, eps, interpret):
    b, hh, ww, c = x.shape
    hw = hh * ww
    with_film = film_scale is not None
    xf = x.reshape(b, hw, c)
    mean_c, rstd_c = _group_stats(xf, num_groups, eps)

    chunk = min(_CHUNK, hw)
    if hw % chunk != 0:  # odd spatial sizes: stay on the XLA path
        return _reference(x, gamma, beta, film_scale, film_shift,
                          num_groups, eps)
    n_chunks = hw // chunk
    fs = (film_scale if with_film else jnp.zeros((b, c), x.dtype)).reshape(b, 1, c)
    fsh = (film_shift if with_film else jnp.zeros((b, c), x.dtype)).reshape(b, 1, c)

    row_spec = pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_apply_kernel, with_film=with_film),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        grid=(b, n_chunks),
        in_specs=[
            row_spec, vec_spec, vec_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            vec_spec, vec_spec,
        ],
        out_specs=row_spec,
        interpret=interpret,
    )(xf, mean_c, rstd_c, gamma, beta, fs, fsh)
    return out.reshape(b, hh, ww, c)


def _reference(x, gamma, beta, film_scale, film_shift, num_groups, eps):
    b, hh, ww, c = x.shape
    x32 = x.astype(jnp.float32).reshape(b, hh * ww, num_groups, c // num_groups)
    mean = x32.mean(axis=(1, 3), keepdims=True)
    var = x32.var(axis=(1, 3), keepdims=True)
    xn = ((x32 - mean) * jax.lax.rsqrt(var + eps)).reshape(b, hh, ww, c)
    h = xn * gamma + beta
    if film_scale is not None:
        h = h * (1.0 + film_scale[:, None, None, :]) + film_shift[:, None, None, :]
    return (h * jax.nn.sigmoid(h)).astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_groupnorm_silu(
    x, gamma, beta, film_scale=None, film_shift=None,
    num_groups: int = 32, eps: float = 1e-5, interpret: bool = False,
):
    return _impl(x, gamma, beta, film_scale, film_shift, num_groups, eps,
                 interpret)


def _fwd(x, gamma, beta, film_scale, film_shift, num_groups, eps, interpret):
    out = _impl(x, gamma, beta, film_scale, film_shift, num_groups, eps,
                interpret)
    return out, (x, gamma, beta, film_scale, film_shift)


def _bwd(num_groups, eps, interpret, res, g):
    x, gamma, beta, film_scale, film_shift = res
    if film_scale is None:
        f = lambda x, gm, bt: _reference(x, gm, bt, None, None, num_groups, eps)
        _, vjp = jax.vjp(f, x, gamma, beta)
        dx, dgm, dbt = vjp(g)
        return dx, dgm, dbt, None, None
    f = lambda x, gm, bt, fs, fsh: _reference(x, gm, bt, fs, fsh, num_groups, eps)
    _, vjp = jax.vjp(f, x, gamma, beta, film_scale, film_shift)
    return vjp(g)


fused_groupnorm_silu.defvjp(_fwd, _bwd)
