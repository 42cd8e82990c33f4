"""Conditioning glue: batch dict → denoiser kwargs (L4).

TPU-native rewrite of `dynamic_input/condition.py`:

  * `prepare_condition_kwargs` (:5-86) — maps `condition_method` to the
    tensors the denoiser consumes: vector-cond methods pass
    `batch[condition_method]` as `cond`; `clusterlayout` passes
    cond=cluster-onehot + layout selected by `condition.clusterlayout.how`
    ∈ {lost, oracle, stego}; `layout` passes layout only;
    `stegoclusterlayout` passes cond=stego_attr n-hot + layout=stegomask.
  * training drop prob: `cond_drop_prob` when training else 1.0 (:11-16);
    unconditional training forces 1.0.
  * `randomsample_cond` (:96-138) — swaps `<m>` → `<m>_random` for the
    random-guidance FID control.
  * `prepare_denoise_fn_kwargs_4sampling` (:141-157) — adds `cond_scale`,
    drops `cond_drop_prob`.

Here batches are dicts of numpy/jax arrays (NHWC for image-like entries).
"""

from __future__ import annotations

from typing import Any, Mapping

__all__ = [
    "VECTOR_COND_METHODS",
    "prepare_condition_kwargs",
    "randomsample_cond",
    "prepare_sampling_kwargs",
    "layout_dim_of",
    "layout_to_device",
]

VECTOR_COND_METHODS = (
    "label", "attr", "feat", "knn_feat", "patchfeat", "centroid",
    "labelcentroid", "cluster", "clustermix", "clusterrandom",
    "labelcluster", "patchcluster",
)

_LAYOUT_BY_HOW = {"lost": "lostbboxmask", "oracle": "segmask", "stego": "stegomask"}

# exactly the reference's randomizable set (condition.py:104-119); note
# clustermix_random IS shipped in batches but the reference deliberately
# raises for it (condition.py:120-134) — parity kept
_RANDOMIZABLE = ("label", "cluster", "centroid", "knn_feat")


def prepare_condition_kwargs(
    condition_method: str | None,
    batch: Mapping[str, Any],
    *,
    cond_drop_prob: float | None = None,
    training: bool = True,
    condition_cfg: Mapping[str, Any] | None = None,
) -> dict[str, Any]:
    """Return {cond_drop_prob, cond[, layout]} for the denoiser.

    Parity: dynamic_input/condition.py:5-86.
    """
    if condition_method is not None:
        assert cond_drop_prob is not None and cond_drop_prob > 0, (
            "conditional training requires cond_drop_prob > 0 "
            "(condition.py:12)"
        )
        drop = cond_drop_prob if training else 1.0
    else:
        drop = 1.0
    out: dict[str, Any] = {"cond_drop_prob": drop}

    if condition_method is None:
        out["cond"] = None
    elif condition_method == "cluster_lookup":
        # learned table inside the model, keyed by dataset ids
        # (condition.py:38-39)
        out["cond"] = None
        out["image_batch_ids"] = batch["id"]
    elif condition_method in VECTOR_COND_METHODS:
        out["cond"] = batch[condition_method]
    elif condition_method == "clusterlayout":
        how = condition_cfg["clusterlayout"]["how"]
        out["cond"] = batch["cluster"]
        out["layout"] = batch[_LAYOUT_BY_HOW[how]]
    elif condition_method == "layout":
        how = condition_cfg["layout"]["how"]
        out["layout"] = batch[_LAYOUT_BY_HOW[how]]
    elif condition_method == "stegoclusterlayout":
        out["cond"] = batch["stego_attr"]
        out["layout"] = batch["stegomask"]
    else:
        raise ValueError(condition_method)
    return out


def randomsample_cond(
    condition_method: str | None,
    batch: dict[str, Any],
    random_sample_condition: bool,
) -> dict[str, Any]:
    """Swap conditions for their randomized variants (FID control).

    Parity: dynamic_input/condition.py:96-138.
    """
    if not random_sample_condition:
        return batch
    if condition_method in _RANDOMIZABLE:
        batch = dict(batch)
        batch[condition_method] = batch[f"{condition_method}_random"]
        return batch
    raise ValueError(
        f"random_sample_condition unsupported for {condition_method!r}"
    )


def prepare_sampling_kwargs(
    condition_method: str | None,
    batch: dict[str, Any],
    cond_scale,
    *,
    random_sample_condition: bool = False,
    condition_cfg: Mapping[str, Any] | None = None,
    cond_drop_prob: float | None = 0.1,
) -> dict[str, Any]:
    """Condition kwargs for guided sampling: adds cond_scale, drops the
    train-only cond_drop_prob. Parity: condition.py:141-157."""
    batch = randomsample_cond(condition_method, batch, random_sample_condition)
    kw = prepare_condition_kwargs(
        condition_method, batch,
        cond_drop_prob=cond_drop_prob, training=True,
        condition_cfg=condition_cfg,
    )
    kw.pop("cond_drop_prob")
    kw["cond_scale"] = cond_scale
    return kw


def layout_dim_of(condition_method: str | None,
                  condition_cfg: Mapping[str, Any] | None) -> int:
    """The configured `condition.<method>.layout_dim` (0 when unset)."""
    cfg = (condition_cfg or {}).get(condition_method or "") or {}
    return int(cfg.get("layout_dim") or 0)


_onehot_fns: dict[int, Any] = {}


def layout_to_device(layout, layout_dim: int):
    """Layout tensor → device f32, expanding the `onehot_on_device` wire
    format on the way.

    Every sampler consumer (train step, ImageLogger, FID harness,
    condscale sweep) routes layouts through here so both wire formats
    work everywhere:

      * f32 one-hot [..,H,W,K] / binary [..,H,W,1] (the reference batch
        contract, complex_ds_common_util.py:103-133) — passthrough cast;
      * integer ID masks [B,H,W] or [H,W] (`onehot_on_device=True`
        datasets, `segmask_to_ids`) — shipped to the device AS uint8
        (1 byte/px on the host→device tunnel; the whole point of the
        wire format) and expanded to [..,H,W,K] one-hot in one fused
        jitted op.  Integer [..,H,W,1] binary bbox masks pass through.

    Out-of-range ids are rejected loudly (host parity: np.eye(K)[ids]
    raises IndexError; jax.nn.one_hot would silently zero them).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    if layout is None:
        return None
    arr = layout if isinstance(layout, np.ndarray) else (
        np.asarray(layout) if not hasattr(layout, "devices") else layout
    )
    if isinstance(arr, np.ndarray) \
            and np.issubdtype(arr.dtype, np.integer) and arr.ndim in (2, 3) \
            and arr.shape[-1] != 1:
        assert layout_dim > 0, (
            "id-mask layout needs condition.<method>.layout_dim")
        if arr.size and int(arr.max()) >= layout_dim:
            raise ValueError(
                f"layout id mask contains id {int(arr.max())} >= "
                f"layout_dim {layout_dim}")
        fn = _onehot_fns.get(layout_dim)
        if fn is None:
            fn = _onehot_fns[layout_dim] = jax.jit(
                lambda ids, k=layout_dim: jax.nn.one_hot(
                    ids, k, dtype=jnp.float32))
        return fn(jnp.asarray(arr))  # uint8 over the wire; cast in-op
    return jnp.asarray(arr, dtype=jnp.float32)
