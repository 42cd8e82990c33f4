"""Vector quantization (lucidrains vector-quantize-pytorch) — JAX/Flax.

Parity target: `dynamic/vq_lr.py` (:121-576) — the reference vendors
the lucidrains VQ library and dead-imports `VectorQuantize` from its
UNet (`dynamic/diffusionmodules/openaimodel.py:25`); no shipped config
uses it (zoo breadth).

Covered semantics (cites into vq_lr.py):
  * Euclidean codebook: −cdist assignment, EMA cluster_size + embed_avg
    with Laplace smoothing (:181-304).
  * Cosine codebook: l2-normalized embeddings and inputs, EMA on the
    normalized means (:306-442).
  * kmeans codebook init from the first batch (:121-161), gated on an
    `initted` flag.
  * Dead-code expiry below an EMA threshold (:250-260).
  * `VectorQuantize`: in/out projections, multi-head (shared or
    separate codebooks), straight-through estimator, commitment loss,
    orthogonal regularization (eq. 2 of arXiv:2112.00384) (:446-576).

TPU-first redesign notes:
  * Codebook state lives in a mutable `"vq"` variable collection
    (embed / embed_avg / cluster_size / initted) — training calls use
    `mutable=["vq"]`; everything is pure function + new state.
  * Dead-code replacement keeps STATIC shapes: instead of gathering
    `mask.sum()` fresh samples (data-dependent shape, un-jittable), we
    draw `codebook_size` random batch vectors and `jnp.where` them in
    under the expiry mask — same distribution, XLA-friendly.
  * kmeans init runs under `lax.cond` on the initted flag (no
    data-dependent Python control flow inside jit).
  * Stochastic paths (gumbel codebook sampling, expiry sampling) draw
    from the `"vq"` rng stream when provided and fall back to
    deterministic picks otherwise.
  * `learnable_codebook` (auto-enabled by orthogonal reg, :483-500)
    stores the codebook as a trainable param; EMA writes are skipped
    for it (in JAX the optimizer owns params — the torch code's
    in-place `.data.copy_` on a Parameter has no functional analogue).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["VectorQuantize", "kmeans", "orthogonal_loss_fn"]


def _l2norm(t, axis=-1, eps=1e-12):
    return t / (jnp.linalg.norm(t, axis=axis, keepdims=True) + eps)


def _sample_vectors(key, samples, num):
    """Uniformly sample `num` rows per codebook head (vq_lr.py:48-57,
    always-replacement variant — static-shape)."""
    h, n, _ = samples.shape
    idx = jax.random.randint(key, (h, num), 0, n)
    return jnp.take_along_axis(samples, idx[..., None], axis=1)


def kmeans(key, samples, num_clusters, num_iters=10, use_cosine_sim=False):
    """Batched (per-head) kmeans (vq_lr.py:121-161): random-sample
    init, argmax assignment, empty clusters keep their old mean."""
    h, n, d = samples.shape
    means = _sample_vectors(key, samples, num_clusters)
    for _ in range(num_iters):
        if use_cosine_sim:
            dists = jnp.einsum("hnd,hcd->hnc", samples, means)
        else:
            dists = -jnp.linalg.norm(
                samples[:, :, None, :] - means[:, None, :, :], axis=-1)
        buckets = jnp.argmax(dists, axis=-1)
        onehot = jax.nn.one_hot(buckets, num_clusters, dtype=samples.dtype)
        bins = onehot.sum(axis=1)
        zero = bins == 0
        new_means = jnp.einsum("hnc,hnd->hcd", onehot, samples)
        new_means = new_means / jnp.maximum(bins, 1.0)[..., None]
        if use_cosine_sim:
            new_means = _l2norm(new_means)
        means = jnp.where(zero[..., None], means, new_means)
    return means, bins


def orthogonal_loss_fn(t):
    """eq (2), arXiv:2112.00384 (vq_lr.py:171-177)."""
    h, n = t.shape[:2]
    normed = _l2norm(t)
    cos = jnp.einsum("hid,hjd->hij", normed, normed)
    eye = jnp.eye(n, dtype=t.dtype)[None]
    return ((cos - eye) ** 2).sum() / (h * n ** 2)


class VectorQuantize(nn.Module):
    """vq_lr.py:446-576 — returns (quantize, embed_ind, loss).

    Call with `mutable=["vq"]` (and optionally `rngs={"vq": key}`)
    when `train=True` so the EMA codebook state updates.
    """

    dim: int
    codebook_size: int
    codebook_dim: Optional[int] = None
    heads: int = 1
    separate_codebook_per_head: bool = False
    decay: float = 0.8
    eps: float = 1e-5
    kmeans_init: bool = False
    kmeans_iters: int = 10
    use_cosine_sim: bool = False
    threshold_ema_dead_code: float = 0.0
    channel_last: bool = True
    accept_image_fmap: bool = False
    commitment_weight: float = 1.0
    orthogonal_reg_weight: float = 0.0
    orthogonal_reg_active_codes_only: bool = False
    orthogonal_reg_max_codes: Optional[int] = None
    sample_codebook_temp: float = 0.0

    @property
    def _learnable(self) -> bool:
        return self.orthogonal_reg_weight > 0

    @property
    def _num_codebooks(self) -> int:
        return self.heads if self.separate_codebook_per_head else 1

    @property
    def _cb_dim(self) -> int:
        return self.codebook_dim or self.dim

    def _vq_key(self, name: str) -> jax.Array:
        if self.has_rng("vq"):
            return self.make_rng("vq")
        # crc32, not hash(): str hashes are salted per interpreter
        # (PYTHONHASHSEED), which would make the "deterministic" no-rng
        # fallback differ run to run
        import zlib

        return jax.random.fold_in(
            jax.random.PRNGKey(0), zlib.crc32(name.encode()) % (2 ** 31))

    @nn.compact
    def __call__(self, x, train: bool = False):
        heads, h_cb, d = self.heads, self._num_codebooks, self._cb_dim
        cb_input_dim = d * heads
        needs_proj = cb_input_dim != self.dim

        orig_shape = x.shape
        if self.accept_image_fmap:
            b, hh, ww, _ = x.shape  # NHWC (torch path is NCHW, :518-520)
            x = x.reshape(b, hh * ww, x.shape[-1])
        elif not self.channel_last:
            x = jnp.swapaxes(x, -1, -2)

        if needs_proj:
            x = nn.Dense(cb_input_dim, name="project_in")(x)
        b, n, _ = x.shape

        # head split (:527-529)
        if heads > 1:
            xs = x.reshape(b, n, heads, d)
            if self.separate_codebook_per_head:
                xh = xs.transpose(2, 0, 1, 3).reshape(h_cb, b * n, d)
            else:
                xh = xs.transpose(0, 2, 1, 3).reshape(1, b * heads * n, d)
        else:
            xh = x.reshape(1, b * n, d)
        xh = xh.astype(jnp.float32)

        # ---- codebook state ----
        if self.use_cosine_sim:
            init_embed = _l2norm(jax.random.uniform(
                jax.random.PRNGKey(42), (h_cb, self.codebook_size, d)))
        else:
            init_embed = jax.random.uniform(
                jax.random.PRNGKey(42), (h_cb, self.codebook_size, d))
        if self.kmeans_init:
            init_embed = jnp.zeros_like(init_embed)

        if self._learnable:
            embed = self.param("embed", lambda rng: init_embed)
        else:
            embed_var = self.variable("vq", "embed", lambda: init_embed)
            embed = embed_var.value
        cluster_size = self.variable(
            "vq", "cluster_size",
            lambda: jnp.zeros((h_cb, self.codebook_size), jnp.float32))
        embed_avg = self.variable("vq", "embed_avg", lambda: init_embed)
        initted = self.variable(
            "vq", "initted",
            lambda: jnp.asarray(not self.kmeans_init, jnp.bool_))

        flat = _l2norm(xh) if self.use_cosine_sim else xh

        # kmeans init on first batch (:222-238), one-shot via lax.cond
        if self.kmeans_init and not self.is_initializing():
            def do_init(_):
                km_embed, km_bins = kmeans(
                    self._vq_key("kmeans"), flat, self.codebook_size,
                    self.kmeans_iters, use_cosine_sim=self.use_cosine_sim)
                return km_embed, km_bins.astype(jnp.float32)

            def keep(_):
                return embed.astype(jnp.float32), cluster_size.value

            new_embed, new_cs = jax.lax.cond(initted.value, keep, do_init,
                                             operand=None)
            if not self._learnable:
                embed_var.value = new_embed
                embed = new_embed
                embed_avg.value = jnp.where(initted.value, embed_avg.value,
                                            new_embed)
            cluster_size.value = new_cs
            initted.value = jnp.asarray(True)

        embed_calc = jax.lax.stop_gradient(embed) if self._learnable else embed

        # assignment (:278-284 / :405-413)
        if self.use_cosine_sim:
            dist = jnp.einsum("hnd,hcd->hnc", flat, _l2norm(embed_calc))
        else:
            dist = -jnp.linalg.norm(
                flat[:, :, None, :] - embed_calc[:, None, :, :], axis=-1)
        if self.sample_codebook_temp > 0:
            g = -jnp.log(-jnp.log(jax.random.uniform(
                self._vq_key("gumbel"), dist.shape, minval=1e-20, maxval=1.0)
                + 1e-20))
            embed_ind = jnp.argmax(dist / self.sample_codebook_temp + g, axis=-1)
        else:
            embed_ind = jnp.argmax(dist, axis=-1)

        # batched_embedding (:163-167): per-head gather
        quantize = jax.vmap(lambda e, i: e[i])(embed, embed_ind)

        # ---- EMA codebook update (:286-299 / :415-437) ----
        if train and not self._learnable:
            onehot = jax.nn.one_hot(embed_ind, self.codebook_size,
                                    dtype=jnp.float32)
            bins = onehot.sum(axis=1)
            cluster_size.value = (cluster_size.value * self.decay
                                  + bins * (1 - self.decay))
            embed_sum = jnp.einsum("hnd,hnc->hcd", flat, onehot)
            if self.use_cosine_sim:
                norm_means = _l2norm(embed_sum / jnp.maximum(bins, 1.0)[..., None])
                norm_means = jnp.where((bins == 0)[..., None], embed,
                                       norm_means)
                new_embed = embed * self.decay + norm_means * (1 - self.decay)
            else:
                embed_avg.value = (embed_avg.value * self.decay
                                   + embed_sum * (1 - self.decay))
                cs = cluster_size.value
                smoothed = ((cs + self.eps)
                            / (cs.sum(axis=-1, keepdims=True)
                               + self.codebook_size * self.eps)
                            * cs.sum(axis=-1, keepdims=True))
                new_embed = embed_avg.value / smoothed[..., None]
            # dead-code expiry (:250-260): static-shape masked refresh
            if self.threshold_ema_dead_code > 0:
                expired = cluster_size.value < self.threshold_ema_dead_code
                repl = _sample_vectors(self._vq_key("expire"), _l2norm(flat),
                                       self.codebook_size)
                new_embed = jnp.where(expired[..., None], repl, new_embed)
            embed_var.value = new_embed

        # straight-through (:533-534)
        if train:
            quantize = xh + jax.lax.stop_gradient(quantize - xh)

        loss = jnp.zeros((), jnp.float32)
        if train:
            if self.commitment_weight > 0:
                commit = jnp.mean((jax.lax.stop_gradient(quantize) - xh) ** 2)
                loss = loss + commit * self.commitment_weight
            if self.orthogonal_reg_weight > 0:
                cb = embed
                # active-codes-only / max-codes subsetting (:546-554) is a
                # dynamic-shape gather; on TPU we keep the full (static)
                # codebook — a strict superset of the regularized set.
                loss = loss + orthogonal_loss_fn(cb) * self.orthogonal_reg_weight

        # head merge (:559-565)
        if heads > 1:
            if self.separate_codebook_per_head:
                quantize = quantize.reshape(heads, b, n, d).transpose(1, 2, 0, 3)
                quantize = quantize.reshape(b, n, heads * d)
                ind = embed_ind.reshape(heads, b, n).transpose(1, 2, 0)
            else:
                quantize = quantize.reshape(b, heads, n, d).transpose(0, 2, 1, 3)
                quantize = quantize.reshape(b, n, heads * d)
                ind = embed_ind.reshape(b, heads, n).transpose(0, 2, 1)
        else:
            quantize = quantize.reshape(b, n, d)
            ind = embed_ind.reshape(b, n)

        quantize = quantize.astype(x.dtype)
        if needs_proj:
            quantize = nn.Dense(self.dim, name="project_out")(quantize)

        if self.accept_image_fmap:
            bb, hh, ww = orig_shape[0], orig_shape[1], orig_shape[2]
            quantize = quantize.reshape(bb, hh, ww, -1)
            ind = ind.reshape((bb, hh, ww) + ind.shape[2:])
        elif not self.channel_last:
            quantize = jnp.swapaxes(quantize, -1, -2)

        return quantize, ind, loss
