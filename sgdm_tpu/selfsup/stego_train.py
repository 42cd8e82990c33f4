"""STEGO training: contrastive correlation loss + probes (JAX).

TPU-native rewrite of the STEGO trainer
(`side_repo/STEGO/src/sg_train_segmentation.py:64-429
LitUnsupervisedSegmenter` + `modules.py:331-422
ContrastiveCorrelationLoss`):

  * `contrastive_correlation_loss` — sample `feature_samples²` grid points
    per image, compute feature-space vs code-space correlation tensors, and
    push code correlations toward (feature correlation − shift), over three
    pairings: self (pos_intra), a positive/KNN image (pos_inter) and a
    shuffled negative (neg_inter); zero-clamp + 0.8 stabilization options,
  * `cluster_probe_loss` — the learnable-centroid probe
    (modules.py:141-170: softmax(α·normalized inner products), loss =
    −(probs · ip)),
  * `linear_probe_loss` — CE of a 1×1-conv head vs labels,
  * `stego_train_step` — one fused jitted update of (head, probes) over a
    frozen DINO trunk (the reference freezes the backbone too).

The trained artifacts feed `selfsup.stego.StegoInference`, which renders the
mask PNG dirs the diffusion pipeline consumes.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

__all__ = [
    "tensor_correlation",
    "contrastive_correlation_loss",
    "cluster_probe_loss",
    "linear_probe_loss",
]


def _norm(t: jax.Array) -> jax.Array:
    return t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)


def tensor_correlation(a: jax.Array, b: jax.Array) -> jax.Array:
    """[B, N, C] x [B, M, C] → [B, N, M] inner products."""
    return jnp.einsum("bnc,bmc->bnm", a, b)


def _bilinear_sample(img: jax.Array, coords: jax.Array) -> jax.Array:
    """grid_sample equivalent: img [H, W, C], coords [N, 2] in [-1, 1]."""
    h, w, _ = img.shape
    x = (coords[:, 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[:, 1] + 1.0) * 0.5 * (h - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]
    v00, v01 = img[y0, x0], img[y0, x1]
    v10, v11 = img[y1, x0], img[y1, x1]
    return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
            + wy * ((1 - wx) * v10 + wx * v11))


def _sample_grid(feats: jax.Array, coords: jax.Array) -> jax.Array:
    """feats [B, H, W, C], coords [B, N, 2] → [B, N, C]."""
    return jax.vmap(_bilinear_sample)(feats, coords)


def _pair_loss(f1, f2, c1, c2, shift: float, zero_clamp: bool, stabilize: bool,
               pointwise: bool):
    fd = tensor_correlation(_norm(jax.lax.stop_gradient(f1)),
                            _norm(jax.lax.stop_gradient(f2)))
    if pointwise:
        old_mean = fd.mean()
        fd = fd - fd.mean(axis=2, keepdims=True)
        fd = fd - fd.mean() + old_mean
    cd = tensor_correlation(_norm(c1), _norm(c2))
    min_val = 0.0 if zero_clamp else -9999.0
    cd = jnp.clip(cd, min_val, 0.8) if stabilize else jnp.clip(cd, min_val, None)
    return -cd * (fd - shift), cd


def contrastive_correlation_loss(
    rng: jax.Array,
    feats: jax.Array,           # [B, h, w, C]  frozen DINO features
    feats_pos: jax.Array,       # positive/KNN pair features
    code: jax.Array,            # [B, h, w, D]  head codes
    code_pos: jax.Array,
    *,
    feature_samples: int = 11,
    pos_intra_shift: float = 0.18,
    pos_inter_shift: float = 0.12,
    neg_inter_shift: float = 0.46,
    neg_samples: int = 5,
    zero_clamp: bool = True,
    stabilize: bool = False,
    pointwise: bool = True,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Parity: modules.py:331-422 (defaults = the published VOC config)."""
    b = feats.shape[0]
    n = feature_samples * feature_samples
    k1, k2, k3 = jax.random.split(rng, 3)
    coords1 = jax.random.uniform(k1, (b, n, 2), minval=-1.0, maxval=1.0)
    coords2 = jax.random.uniform(k2, (b, n, 2), minval=-1.0, maxval=1.0)

    f = _sample_grid(feats, coords1)
    c = _sample_grid(code, coords1)
    f_pos = _sample_grid(feats_pos, coords2)
    c_pos = _sample_grid(code_pos, coords2)

    kw = dict(zero_clamp=zero_clamp, stabilize=stabilize, pointwise=pointwise)
    pos_intra, _ = _pair_loss(f, f, c, c, pos_intra_shift, **kw)
    pos_inter, _ = _pair_loss(f, f_pos, c, c_pos, pos_inter_shift, **kw)

    neg_losses = []
    for i in range(neg_samples):
        perm = jax.random.permutation(jax.random.fold_in(k3, i), b)
        f_neg = _sample_grid(feats[perm], coords2)
        c_neg = _sample_grid(code[perm], coords2)
        neg, _ = _pair_loss(f, f_neg, c, c_neg, neg_inter_shift, **kw)
        neg_losses.append(neg)
    neg_inter = jnp.concatenate(neg_losses, axis=0)

    aux = {
        "pos_intra": pos_intra.mean(),
        "pos_inter": pos_inter.mean(),
        "neg_inter": neg_inter.mean(),
    }
    # the reference combines with per-term weights from its Hydra cfg;
    # published VOC weights: intra 0.67, inter 0.28, neg 0.63
    loss = (0.67 * pos_intra.mean() + 0.28 * pos_inter.mean()
            + 0.63 * neg_inter.mean())
    return loss, aux


def cluster_probe_loss(code: jax.Array, clusters: jax.Array,
                       alpha: float | None = None) -> jax.Array:
    """Parity: modules.py:153-166 (alpha=None → hard one-hot assignment)."""
    cn = _norm(clusters)
    fn = _norm(code)
    ip = jnp.einsum("bhwc,nc->bhwn", fn, cn)
    if alpha is None:
        probs = jax.nn.one_hot(jnp.argmax(ip, axis=-1), clusters.shape[0])
        probs = jax.lax.stop_gradient(probs)
    else:
        probs = jax.nn.softmax(ip * alpha, axis=-1)
    return -(probs * ip).sum(-1).mean()


def linear_probe_loss(code: jax.Array, w: jax.Array, b: jax.Array,
                      labels: jax.Array, num_classes: int) -> jax.Array:
    """CE of a 1x1-conv head vs per-pixel labels (255 ignored)."""
    logits = jnp.einsum("bhwc,cn->bhwn", code, w) + b
    mask = (labels >= 0) & (labels < num_classes)
    safe = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return (ce * mask).sum() / jnp.maximum(mask.sum(), 1)


# ----------------------------------------------------------------------
# the training loop (LitUnsupervisedSegmenter equivalent)
# ----------------------------------------------------------------------

def precompute_knns(backbone, dataset, k: int = 7, batch_size: int = 32):
    """Nearest-neighbor image pairs for the pos_inter pairing.

    Parity: side_repo/STEGO/src/sg_precompute_knns.py — CLS-feature kNN over
    the dataset (exact search on TPU).
    """
    import numpy as np

    from ..data.loader import DataLoader
    from ..ops.knn import run_nns

    feats = []
    dl = DataLoader(dataset, batch_size=batch_size, shuffle=False,
                    drop_last=False)
    for batch in dl:
        x = backbone.transform_batch(batch["img4unsup"])
        feats.append(backbone.batch_encode_feat(x))
    feats = np.concatenate(feats).astype(np.float32)
    nns, _ = run_nns(feats, feats, k_nn=k)
    return nns


def train_stego(
    dataset,
    *,
    arch: str = "vit_small",
    patch_size: int = 8,
    dim: int = 70,
    n_classes: int = 27,
    steps: int = 1000,
    batch_size: int = 16,
    lr: float = 5e-4,
    cluster_lr: float = 5e-3,
    image_size: int = 224,
    knn_k: int = 7,
    seed: int = 0,
    dino_ckpt_path: str | None = None,
    log_every: int = 50,
):
    """Train the STEGO head + probes over a frozen DINO trunk.

    Compact equivalent of `sg_train_segmentation.py:64-429`: per step draw a
    batch and its kNN positives, compute (feats, codes) for both, optimize
    the contrastive-correlation loss on the head and the cluster-probe loss
    on the centroids (the trunk stays frozen).  Returns a StegoInference
    ready to render mask dirs.
    """
    import numpy as np
    import optax

    from ..utils.logging import logger
    from .ssl_backbone import IMAGENET_MEAN, IMAGENET_STD, get_ssl_backbone
    from .stego import DinoFeaturizer, StegoInference

    backbone_name = ("dino_vits" if arch == "vit_small" else "dino_vitb") + str(patch_size)
    backbone = get_ssl_backbone(backbone_name, image_size=image_size,
                                ckpt_path=dino_ckpt_path)
    nns = precompute_knns(backbone, dataset, k=knn_k, batch_size=batch_size)

    featurizer = DinoFeaturizer(dim=dim, backbone=backbone.model)
    rng = jax.random.PRNGKey(seed)
    x0 = jnp.zeros((1, image_size, image_size, 3))
    variables = featurizer.init(rng, x0)
    params = dict(variables["params"])
    params["backbone"] = backbone.params  # frozen trunk weights
    head_params = {k: v for k, v in params.items() if k != "backbone"}
    trunk = params["backbone"]
    clusters = jax.random.normal(jax.random.PRNGKey(seed + 1), (n_classes, dim))

    tx_head = optax.adam(lr)
    tx_cluster = optax.adam(cluster_lr)
    opt_head = tx_head.init(head_params)
    opt_cluster = tx_cluster.init(clusters)

    def tokens_feats(x):
        return backbone.model.apply(
            {"params": trunk}, x, out="tokens"
        )[:, 1:]

    @jax.jit
    def step_fn(head_params, clusters, opt_head, opt_cluster, x, x_pos, key):
        p = x.shape[1] // (image_size // patch_size)  # grid side

        def head_loss(head_params, clusters):
            full = dict(head_params, backbone=trunk)
            code = featurizer.apply({"params": full}, x)
            code_pos = featurizer.apply({"params": full}, x_pos)
            g = code.shape[1]
            feats = jax.lax.stop_gradient(tokens_feats(x)).reshape(
                x.shape[0], g, g, -1
            )
            feats_pos = jax.lax.stop_gradient(tokens_feats(x_pos)).reshape(
                x.shape[0], g, g, -1
            )
            cc_loss, aux = contrastive_correlation_loss(
                key, feats, feats_pos, code, code_pos
            )
            probe_loss = cluster_probe_loss(
                jax.lax.stop_gradient(code), clusters, alpha=None
            )
            return cc_loss + probe_loss, (aux, probe_loss)

        (loss, (aux, probe_loss)), grads = jax.value_and_grad(
            head_loss, argnums=(0, 1), has_aux=True
        )(head_params, clusters)
        gu, opt_head = tx_head.update(grads[0], opt_head, head_params)
        head_params = optax.apply_updates(head_params, gu)
        cu, opt_cluster = tx_cluster.update(grads[1], opt_cluster, clusters)
        clusters = optax.apply_updates(clusters, cu)
        return head_params, clusters, opt_head, opt_cluster, loss, probe_loss

    n = len(dataset)
    np_rng = np.random.default_rng(seed)

    def get_imgs(idxs):
        imgs = np.stack([
            np.asarray(dataset[int(i)]["img4unsup"]) for i in idxs
        ])
        x = jnp.asarray(imgs, dtype=jnp.float32) / 255.0
        if x.shape[1] != image_size:
            x = jax.image.resize(
                x, (x.shape[0], image_size, image_size, 3), "bilinear"
            )
        return (x - IMAGENET_MEAN) / IMAGENET_STD

    key = jax.random.PRNGKey(seed + 2)
    for it in range(steps):
        idxs = np_rng.integers(0, n, batch_size)
        pos_idxs = np.array([
            nns[i][np_rng.integers(0, knn_k)] for i in idxs
        ])
        key, sub = jax.random.split(key)
        head_params, clusters, opt_head, opt_cluster, loss, probe_loss = step_fn(
            head_params, clusters, opt_head, opt_cluster,
            get_imgs(idxs), get_imgs(pos_idxs), sub,
        )
        if (it + 1) % log_every == 0:
            logger.info(
                f"stego step {it + 1}/{steps} loss {float(loss):.4f} "
                f"probe {float(probe_loss):.4f}"
            )

    inference = StegoInference.__new__(StegoInference)
    inference.model = featurizer
    inference.n_classes = n_classes
    inference.params = dict(head_params, backbone=trunk)
    inference.clusters = clusters

    @jax.jit
    def _code(params, x):
        return featurizer.apply({"params": params}, x)

    inference._code = _code
    return inference
