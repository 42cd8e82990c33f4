"""Classifier-free guidance, fused for XLA.

TPU-native rewrite of the reference's guidance execution
(`dynamic/diffusionmodules/openaimodel.py:853-902 forward_with_cond_scale` /
`get_guided_score`, identical logic in `openaimodel_ca.py:871-915`):

  * ``scale_type='imagen'``: eps = (1-w)·eps_uncond + w·eps_cond
  * ``scale_type='cfg'``:    eps = (1+w)·eps_cond − w·eps_uncond
  * w == 1 → single conditional pass; w == 0 → single unconditional pass
    (compile-time branch when w is a Python number);
  * otherwise the batch is concat-doubled so ONE model forward computes both
    branches — on TPU this doubles the matmul batch instead of running the
    model twice, keeping the MXU busy.

The reference draws the per-sample condition-drop Bernoulli mask *inside* the
model from a float ``cond_drop_prob`` (`openaimodel.py:462-464,926-931`);
here RNG is explicit, so the mask is materialized by the caller
(``prob_mask_like``) and passed to the model as a boolean ``cond_drop_mask``.
The CFG double-batch simply uses [False...,True...].
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = ["guided_score", "prob_mask_like", "make_guided_denoiser",
           "make_scoremix_denoiser"]


def guided_score(z: jax.Array, zc: jax.Array, w, scale_type: str) -> jax.Array:
    """Combine unconditional (z) and conditional (zc) scores.

    ``w`` may be a scalar or a per-sample [B] array (the cond-scale-sweep
    visualization passes per-sample weights, reference
    `diffusion/sampler/ddim_plms_sampler.py:107-143`).
    Parity: openaimodel.py:853-859 get_guided_score.
    """
    w = jnp.asarray(w, dtype=z.dtype)
    if w.ndim > 0:  # per-sample weight → broadcast over trailing dims
        w = w.reshape(w.shape[0], *((1,) * (z.ndim - 1)))
    if scale_type == "imagen":
        return (1.0 - w) * z + w * zc
    if scale_type == "cfg":
        return (1.0 + w) * zc - w * z
    raise ValueError(f"unknown scale_type: {scale_type}")


def prob_mask_like(key: jax.Array, batch: int, prob) -> jax.Array:
    """Per-sample Bernoulli drop mask, True = drop condition.

    ``prob`` may be a scalar or a per-sample [B] array (the reference passes a
    per-sample cond_drop_prob tensor for the CFG double batch,
    openaimodel.py:884-890). Parity: openaimodel.py:462-464 prob_mask_like.
    """
    u = jax.random.uniform(key, (batch,))
    return u < jnp.asarray(prob, dtype=u.dtype)


def _is_py_number(x: Any) -> bool:
    return isinstance(x, (int, float)) and not isinstance(x, bool)


def make_guided_denoiser(
    apply_fn: Callable[..., jax.Array],
    scale_type: str = "imagen",
) -> Callable[..., jax.Array]:
    """Wrap a denoiser ``apply_fn(x, t, cond_drop_mask=..., **cond) -> eps``
    into ``guided(x, t, cond_scale, **cond) -> guided eps``.

    Parity: openaimodel.py:861-902 forward_with_cond_scale.  When
    ``cond_scale`` is the Python number 1 (or 0) only the conditional (or
    unconditional) branch is traced; any other value — including traced
    arrays — takes the fused concat-double path.

    Reference quirk consciously preserved (openaimodel.py:868-883 has the
    IDENTICAL shortcuts): the 0/1 fast paths assume the 'imagen'
    convention ((1-w)z + w·zc).  Under scale_type='cfg' the full formula
    at w=1 would be 2·zc − z, NOT zc — so a cfg model sampled at the exact
    Python float 1.0 gets the conditional score like the reference does,
    while a traced/array 1.0 gets the fused-path 2·zc − z.  Documented in
    README "behavioral quirks".
    """

    def _double(v):
        if v is None:
            return None
        return jnp.concatenate([v, v], axis=0)

    def guided(x: jax.Array, t: jax.Array, cond_scale=1.0, **cond_kwargs) -> jax.Array:
        b = x.shape[0]
        if _is_py_number(cond_scale) and cond_scale == 1:
            return apply_fn(
                x, t, cond_drop_mask=jnp.zeros((b,), dtype=bool), **cond_kwargs
            )
        if _is_py_number(cond_scale) and cond_scale == 0:
            return apply_fn(
                x, t, cond_drop_mask=jnp.ones((b,), dtype=bool), **cond_kwargs
            )
        doubled = {k: _double(v) for k, v in cond_kwargs.items()}
        mask = jnp.concatenate(
            [jnp.zeros((b,), dtype=bool), jnp.ones((b,), dtype=bool)], axis=0
        )
        eps_cat = apply_fn(_double(x), _double(t), cond_drop_mask=mask, **doubled)
        eps_zc, eps_z = jnp.split(eps_cat, 2, axis=0)
        return guided_score(z=eps_z, zc=eps_zc, w=cond_scale, scale_type=scale_type)

    return guided


def make_scoremix_denoiser(
    apply_fn: Callable[..., jax.Array],
    scale_type: str = "imagen",
    weights: tuple[float, ...] = (0.5, 0.5),
) -> Callable[..., jax.Array]:
    """Score mixing: average the GUIDED scores of several conditions.

    The reference's `exp.scoremix` mode (run_exp.py:133-134 +
    config/exp/default.yaml scoremix_c) interpolates at the score level
    instead of the condition level: eps = Σ w_i · eps_guided(c_i), with the
    same x_t/noise for every branch (same_noise=true).

    Usage: ``mixed(x, t, cond_scale, conds=[c1, c2, ...], layouts=None)``.
    """
    guided = make_guided_denoiser(apply_fn, scale_type=scale_type)

    def mixed(x, t, cond_scale=1.0, conds=(), layouts=None, **kw):
        assert len(conds) == len(weights), (len(conds), len(weights))
        eps = None
        for i, c in enumerate(conds):
            extra = dict(kw)
            if layouts is not None:
                extra["layout"] = layouts[i]
            e = guided(x, t, cond_scale=cond_scale, cond=c, **extra)
            eps = e * weights[i] if eps is None else eps + e * weights[i]
        return eps

    return mixed
