"""SSL-quality evaluation probes: MSN logistic eval + MAE linear probe.

TPU-native rewrite of the two reference probe trainers (round-2 VERDICT
Missing #2):

  * `logistic_eval` ← self_sl/msn/logistic_eval.py:79-213 — embed with the
    frozen encoder, cyanure-style preprocess (center features, L2-normalize
    rows; the reference preprocesses train and test INDEPENDENTLY — kept),
    fit an L2-regularized multiclass logistic regression (cyanure
    `multiclass-logistic`, lambd/=N), report train/test accuracy.  The
    solver here is a jitted full-batch Adam on the convex objective
    (cyanure's auto solver is a host-side quasi-Newton; same optimum).
  * `linear_probe` ← self_sl/mae/main_linprobe.py:116-260 — frozen
    features → BatchNorm1d(affine=False, eps=1e-6) → Linear head trained
    with LARS (optax.lars), lr = blr·bs/256, half-cosine schedule — the
    MAE probe recipe on precomputed features.

Both operate on precomputed embeddings [N, D] + integer labels [N] —
extraction goes through the SSLBackbone / exported-encoder zoo like the
reference's make_embeddings (`logistic_eval.py:215-264`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["preprocess_embs", "logistic_eval", "linear_probe"]


def preprocess_embs(embs: np.ndarray, normalize: bool = True,
                    centering: bool = True) -> np.ndarray:
    """cyanure.preprocess(columns=False) semantics: center each feature,
    then L2-normalize each row (logistic_eval.py:162,205)."""
    e = np.asarray(embs, np.float32).copy()
    if centering:
        e -= e.mean(axis=0, keepdims=True)
    if normalize:
        e /= np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)
    return e


def _accuracy(w, b, x, y):
    return float(jnp.mean(jnp.argmax(x @ w + b, axis=-1) == y))


def logistic_eval(
    train_embs, train_labs, test_embs, test_labs,
    lambd: float = 0.00025, normalize: bool = True,
    max_epochs: int = 300, lr: float = 0.1, tol: float = 1e-6,
    fit_intercept: bool = False, seed: int = 0,
) -> dict[str, float]:
    """Fit L2-regularized softmax regression on frozen embeddings.

    Matches logistic_eval.py:165-213: lambd is divided by N, train and
    test sets are preprocessed independently, returns train/test scores.
    """
    xtr = jnp.asarray(preprocess_embs(train_embs, normalize))
    xte = jnp.asarray(preprocess_embs(test_embs, normalize))
    ytr = jnp.asarray(np.asarray(train_labs, np.int32))
    yte = jnp.asarray(np.asarray(test_labs, np.int32))
    n, d = xtr.shape
    k = int(max(np.max(train_labs), np.max(test_labs))) + 1
    lam = lambd / n

    w0 = jnp.zeros((d, k), jnp.float32)
    b0 = jnp.zeros((k,), jnp.float32)
    tx = optax.adam(lr)

    def loss_fn(params):
        w, b = params
        logits = xtr @ w + (b if fit_intercept else 0.0)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, ytr)
        return jnp.mean(ce) + lam * jnp.sum(w * w)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params = (w0, b0)
    opt_state = tx.init(params)
    prev = jnp.inf
    for _ in range(max_epochs):
        params, opt_state, loss = step(params, opt_state)
        if abs(float(prev) - float(loss)) < tol:
            break
        prev = loss
    w, b = params
    if not fit_intercept:
        b = jnp.zeros_like(b)
    return {
        "train_score": _accuracy(w, b, xtr, ytr),
        "test_score": _accuracy(w, b, xte, yte),
    }


def linear_probe(
    train_feats, train_labs, test_feats, test_labs,
    epochs: int = 90, batch_size: int = 512, blr: float = 0.1,
    weight_decay: float = 0.0, seed: int = 0,
) -> dict[str, float]:
    """MAE-style linear probe on frozen features.

    main_linprobe.py: BatchNorm1d(affine=False, eps=1e-6) in front of the
    Linear head (:222), LARS on head params only (:252), lr=blr·bs/256
    (:240), half-cosine schedule.  Here the BN is the train-set feature
    standardization (the frozen-feature equivalent of its running stats).
    """
    xtr = np.asarray(train_feats, np.float32)
    mu = xtr.mean(axis=0, keepdims=True)
    sig = np.sqrt(xtr.var(axis=0, keepdims=True) + 1e-6)
    xtr = jnp.asarray((xtr - mu) / sig)
    xte = jnp.asarray((np.asarray(test_feats, np.float32) - mu) / sig)
    ytr = jnp.asarray(np.asarray(train_labs, np.int32))
    yte = jnp.asarray(np.asarray(test_labs, np.int32))
    n, d = xtr.shape
    k = int(max(np.max(train_labs), np.max(test_labs))) + 1
    batch_size = min(batch_size, n)
    steps_per_epoch = max(n // batch_size, 1)
    lr = blr * batch_size / 256.0
    sched = optax.cosine_decay_schedule(lr, epochs * steps_per_epoch)
    tx = optax.lars(sched, weight_decay=weight_decay)

    params = {"w": jnp.zeros((d, k), jnp.float32),
              "b": jnp.zeros((k,), jnp.float32)}
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            logits = xb @ p["w"] + p["b"]
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, yb))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    for _ in range(epochs):
        order = rng.permutation(n)
        for i in range(steps_per_epoch):
            idx = order[i * batch_size:(i + 1) * batch_size]
            params, opt_state, _ = step(
                params, opt_state, xtr[idx], ytr[idx])
    return {
        "train_score": _accuracy(params["w"], params["b"], xtr, ytr),
        "test_score": _accuracy(params["w"], params["b"], xte, yte),
    }
