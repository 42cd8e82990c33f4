"""MSN logistic eval + MAE linear probe (selfsup/eval_probes.py).

Parity targets: self_sl/msn/logistic_eval.py:79-213,
self_sl/mae/main_linprobe.py:116-260.  Synthetic separable features must
reach high accuracy; preprocess follows cyanure semantics.
"""

import numpy as np

from sgdm_tpu.selfsup.eval_probes import (
    linear_probe,
    logistic_eval,
    preprocess_embs,
)


def _toy(n=300, d=16, k=3, seed=0, sep=4.0):
    # class centers fixed across splits; samples vary by seed
    centers = np.random.default_rng(42).standard_normal((k, d)) * sep
    rng = np.random.default_rng(seed)
    y = rng.integers(0, k, n)
    x = centers[y] + rng.standard_normal((n, d))
    return x.astype(np.float32), y.astype(np.int64)


def test_preprocess_centers_and_normalizes():
    x, _ = _toy()
    centered = preprocess_embs(x, normalize=False)
    np.testing.assert_allclose(centered.mean(0), 0.0, atol=1e-5)
    e = preprocess_embs(x)  # center THEN row-normalize (cyanure order)
    np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, atol=1e-5)


def test_logistic_eval_separable():
    xtr, ytr = _toy(seed=1)
    xte, yte = _toy(seed=2)
    res = logistic_eval(xtr, ytr, xte, yte, max_epochs=400)
    assert res["train_score"] > 0.95, res
    assert res["test_score"] > 0.9, res


def test_linear_probe_separable():
    xtr, ytr = _toy(seed=3)
    xte, yte = _toy(seed=4)
    res = linear_probe(xtr, ytr, xte, yte, epochs=20, batch_size=128)
    assert res["train_score"] > 0.95, res
    assert res["test_score"] > 0.9, res
