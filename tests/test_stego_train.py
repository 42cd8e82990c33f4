"""Tests for the STEGO training losses."""

import jax
import jax.numpy as jnp
import numpy as np

import pytest

from sgdm_tpu.selfsup.stego_train import (
    cluster_probe_loss,
    contrastive_correlation_loss,
    linear_probe_loss,
    tensor_correlation,
)


class TestCorrelation:
    def test_tensor_correlation(self):
        a = jnp.eye(3)[None]
        out = tensor_correlation(a, a)
        np.testing.assert_allclose(np.asarray(out[0]), np.eye(3), atol=1e-6)


class TestContrastiveLoss:
    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_runs_and_grads(self):
        rng = jax.random.PRNGKey(0)
        feats = jax.random.normal(rng, (4, 8, 8, 16))
        code = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 6))

        def loss_fn(code):
            loss, aux = contrastive_correlation_loss(
                jax.random.PRNGKey(2), feats, feats, code, code,
                feature_samples=5, neg_samples=2,
            )
            return loss

        g = jax.grad(loss_fn)(code)
        assert np.isfinite(float(loss_fn(code)))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0

    def test_aligned_code_lower_loss(self):
        # code == feats (perfectly aligned correlations) should beat a
        # random code
        rng = jax.random.PRNGKey(3)
        feats = jax.random.normal(rng, (4, 8, 8, 8))
        rand_code = jax.random.normal(jax.random.PRNGKey(4), (4, 8, 8, 8))
        l_aligned, _ = contrastive_correlation_loss(
            jax.random.PRNGKey(5), feats, feats, feats, feats,
            feature_samples=7, neg_samples=2,
        )
        l_rand, _ = contrastive_correlation_loss(
            jax.random.PRNGKey(5), feats, feats, rand_code, rand_code,
            feature_samples=7, neg_samples=2,
        )
        assert float(l_aligned) < float(l_rand)


class TestProbes:
    def test_cluster_probe_prefers_matching_centroids(self):
        code = jnp.concatenate([
            jnp.ones((1, 4, 4, 2)) * jnp.array([1.0, 0.0]),
            jnp.ones((1, 4, 4, 2)) * jnp.array([0.0, 1.0]),
        ])
        good = jnp.array([[1.0, 0.0], [0.0, 1.0]])
        bad = jnp.array([[1.0, 1.0], [-1.0, 1.0]])
        assert float(cluster_probe_loss(code, good)) < float(
            cluster_probe_loss(code, bad)
        )

    def test_linear_probe_ignores_255(self):
        code = jnp.ones((1, 2, 2, 3))
        w = jnp.zeros((3, 4))
        b = jnp.zeros((4,))
        labels = jnp.array([[[0, 255], [255, 255]]])
        loss = linear_probe_loss(code, w, b, labels, 4)
        np.testing.assert_allclose(float(loss), np.log(4), rtol=1e-5)
