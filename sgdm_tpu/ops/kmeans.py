"""On-TPU k-means with faiss semantics — the faiss-gpu replacement.

TPU-native rewrite of `clustering/faiss_kmeans.py:23-47 run_kmeans`, which
is the algorithmic contract for the self-labeled pipeline (SURVEY.md §2.7):

  * the TRAIN features are L2-normalized IN-PLACE before training (:26-28),
  * `faiss.Kmeans(d, k, niter=30, min_points_per_centroid=200,
    spherical=False)` → Lloyd's with faiss's defaults: seed 1234, init by
    random sampling of k training points, training-set subsampling to
    k·max_points_per_centroid, empty clusters repaired by splitting the
    largest cluster with faiss's ±epsilon perturbation,
  * assignment runs on `feat_trainval`, concatenated BEFORE the call — i.e.
    on the UNNORMALIZED copies (reference quirk, SURVEY.md §7 hard-part 2;
    reproduced by assigning with the features the caller passes, exactly
    like `kmeans.index.search(feat_trainval, 1)`).

Design: assignment is a chunked jitted kernel — the [chunk, k] distance
matrix rides the MXU as |x|² + |c|² − 2·x·cᵀ; per-cluster sums accumulate
with `segment_sum`.  Everything static-shaped; N is padded to a chunk
multiple with +inf-masked rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["kmeans_assign", "run_kmeans"]


@partial(jax.jit, static_argnames=("chunk",))
def _assign_chunked(feats, centroids, chunk: int = 65536):
    """labels, sq-dists for all rows: argmin_k ||x - c||²."""
    n, d = feats.shape
    k = centroids.shape[0]
    c_norm = (centroids.astype(jnp.float32) ** 2).sum(-1)  # [k]
    pad = (-n) % chunk
    feats_p = jnp.pad(feats, ((0, pad), (0, 0)))
    feats_p = feats_p.reshape(-1, chunk, d)

    def body(carry, x):
        x = x.astype(jnp.float32)
        x_norm = (x ** 2).sum(-1, keepdims=True)  # [chunk,1]
        xc = x @ centroids.T.astype(jnp.float32)  # MXU [chunk,k]
        d2 = x_norm + c_norm[None, :] - 2.0 * xc
        labels = jnp.argmin(d2, axis=-1)
        best = jnp.take_along_axis(d2, labels[:, None], axis=-1)[:, 0]
        return carry, (labels.astype(jnp.int32), jnp.maximum(best, 0.0))

    _, (labels, dists) = jax.lax.scan(body, None, feats_p)
    return labels.reshape(-1)[:n], dists.reshape(-1)[:n]


def kmeans_assign(feats: np.ndarray, centroids: np.ndarray,
                  chunk: int = 65536) -> tuple[np.ndarray, np.ndarray]:
    """Nearest-centroid assignment (faiss `index.search(x, 1)` equivalent)."""
    labels, dists = _assign_chunked(
        jnp.asarray(feats, dtype=jnp.float32),
        jnp.asarray(centroids, dtype=jnp.float32),
        chunk=min(chunk, max(len(feats), 1)),
    )
    return np.asarray(labels, dtype=np.int64), np.asarray(dists)


@partial(jax.jit, static_argnames=("k", "chunk"))
def _lloyd_iter(feats, centroids, k: int, chunk: int):
    n, d = feats.shape
    pad = (-n) % chunk
    feats_p = jnp.pad(feats, ((0, pad), (0, 0))).reshape(-1, chunk, d)
    valid = jnp.pad(jnp.ones((n,), jnp.float32), (0, pad)).reshape(-1, chunk)
    c_norm = (centroids ** 2).sum(-1)

    def body(carry, inp):
        sums, counts, obj = carry
        x, v = inp
        xc = x @ centroids.T
        d2 = (x ** 2).sum(-1, keepdims=True) + c_norm[None, :] - 2.0 * xc
        labels = jnp.argmin(d2, axis=-1)
        best = jnp.take_along_axis(d2, labels[:, None], -1)[:, 0]
        w = v  # masked padded rows
        sums = sums + jax.ops.segment_sum(x * w[:, None], labels, num_segments=k)
        counts = counts + jax.ops.segment_sum(w, labels, num_segments=k)
        obj = obj + (jnp.maximum(best, 0.0) * w).sum()
        return (sums, counts, obj), None

    init = (jnp.zeros((k, d)), jnp.zeros((k,)), jnp.zeros(()))
    (sums, counts, obj), _ = jax.lax.scan(body, init, (feats_p, valid))
    return sums, counts, obj


def _split_empty_clusters(
    centroids: np.ndarray, counts: np.ndarray, rng: np.random.Generator,
    eps: float = 1.0 / 1024.0,
) -> tuple[np.ndarray, np.ndarray]:
    """faiss split_clusters: an empty centroid takes a ±eps-perturbed copy of
    a large cluster's centroid (probability ∝ cluster size)."""
    counts = counts.copy()
    empty = np.where(counts < 0.5)[0]
    for ci in empty:
        probs = counts / counts.sum()
        donor = rng.choice(len(counts), p=probs)
        direction = rng.integers(0, 2, size=centroids.shape[1]) * 2 - 1
        centroids[ci] = centroids[donor] * (1 + eps * direction)
        centroids[donor] = centroids[donor] * (1 - eps * direction)
        counts[ci] = counts[donor] / 2
        counts[donor] = counts[donor] - counts[ci]
    return centroids, counts


def run_kmeans(
    feat_train: np.ndarray,
    feat_trainval: np.ndarray,
    cluster_k: int,
    niter: int = 30,  # faiss.Kmeans reference default (docstring line 7)
    minp: int = 200,
    max_points_per_centroid: int = 256,
    seed: int = 1234,
    chunk: int = 65536,
    verbose: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Drop-in for faiss_kmeans.run_kmeans: returns (assignments, centroids).

    NOTE mutates ``feat_train`` in place (L2 normalization) exactly like the
    reference (:26-28) — callers relying on the unnormalized-assignment quirk
    must concatenate ``feat_trainval`` BEFORE calling, as the reference does.
    """
    n, d = feat_train.shape
    feat_train /= np.linalg.norm(feat_train, axis=1, keepdims=True)

    rng = np.random.default_rng(seed)
    # faiss subsamples the training set to k * max_points_per_centroid
    limit = cluster_k * max_points_per_centroid
    train = feat_train
    if n > limit:
        idx = rng.permutation(n)[:limit]
        train = feat_train[idx]
    if n < cluster_k * minp and verbose:
        print(f"warning: only {n} points for {cluster_k} centroids "
              f"(min_points_per_centroid={minp})")

    # init: k distinct random training points (faiss default)
    init_idx = rng.permutation(len(train))[:cluster_k]
    centroids = np.array(train[init_idx], dtype=np.float32)

    train_j = jnp.asarray(train, dtype=jnp.float32)
    chunk = min(chunk, len(train))
    objs = []
    for it in range(niter):
        sums, counts, obj = _lloyd_iter(
            train_j, jnp.asarray(centroids), k=cluster_k, chunk=chunk
        )
        sums = np.asarray(sums)
        counts = np.asarray(counts)
        objs.append(float(obj))
        new_centroids = np.where(
            counts[:, None] > 0, sums / np.maximum(counts[:, None], 1), centroids
        ).astype(np.float32)
        new_centroids, counts = _split_empty_clusters(new_centroids, counts, rng)
        centroids = new_centroids
        if verbose:
            print(f"iter {it}: obj={objs[-1]:.4f} empty={int((counts<0.5).sum())}")

    labels, _ = kmeans_assign(feat_trainval, centroids, chunk=chunk)
    return labels, centroids
