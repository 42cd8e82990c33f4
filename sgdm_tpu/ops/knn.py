"""Exact k-NN search on TPU — the faiss IndexFlatL2 replacement.

TPU-native rewrite of `clustering/faiss_kmeans.py:50-87 run_nns`: exact
L2 search of `features_trainval` against the `feats` index, k+1 neighbors
with the self-match dropped, radii = sqrt of squared distances (:74).

Design: chunked query batches; per chunk the [chunk, N] distance matrix is
one MXU matmul followed by `lax.top_k` on the negated distances.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["knn_search", "run_nns"]


@partial(jax.jit, static_argnames=("k",))
def _knn_chunk(queries, index, index_sq_norm, k: int):
    q = queries.astype(jnp.float32)
    d2 = (
        (q ** 2).sum(-1, keepdims=True)
        + index_sq_norm[None, :]
        - 2.0 * q @ index.T
    )
    d2 = jnp.maximum(d2, 0.0)
    neg, idx = jax.lax.top_k(-d2, k)
    return -neg, idx


def knn_search(
    index_feats: np.ndarray, queries: np.ndarray, k: int, chunk: int = 8192
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (squared_distances [Q,k], indices [Q,k]) — faiss search parity."""
    index = jnp.asarray(index_feats, dtype=jnp.float32)
    sqn = (index ** 2).sum(-1)
    dists, idxs = [], []
    for i in range(0, len(queries), chunk):
        d, ix = _knn_chunk(jnp.asarray(queries[i:i + chunk]), index, sqn, k)
        dists.append(np.asarray(d))
        idxs.append(np.asarray(ix))
    return np.concatenate(dists), np.concatenate(idxs)


def run_nns(
    feats: np.ndarray, features_trainval: np.ndarray, k_nn: int = 20, **_unused
) -> tuple[np.ndarray, np.ndarray]:
    """Drop-in for faiss_kmeans.run_nns: k_nn neighbors excluding self.

    Returns (sample_nns [N,k] int64, sample_nn_radius_all [N,k] float32).
    """
    d2, idx = knn_search(feats, features_trainval, k_nn + 1)
    radii = np.sqrt(d2)
    # discard the 0-NN (the input sample itself), reference :81-85
    sample_nns = idx[:, 1:].astype(np.int64)
    sample_radii = radii[:, 1:].astype(np.float32)
    assert sample_nns.min() >= 0
    return sample_nns, sample_radii
