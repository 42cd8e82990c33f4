"""MSN pre-training tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sgdm_tpu.models.vit import VisionTransformer
from sgdm_tpu.selfsup.msn import make_msn_train_step, mask_patches, msn_loss, sharpen
import pytest


class TestPieces:
    def test_sharpen_peaks(self):
        p = jnp.array([[0.6, 0.4]])
        s = sharpen(p, T=0.25)
        assert float(s[0, 0]) > 0.6
        np.testing.assert_allclose(np.asarray(s).sum(-1), 1.0, rtol=1e-6)

    def test_mask_patches_ratio(self):
        x = jnp.ones((2, 32, 32, 3))
        out = mask_patches(jax.random.PRNGKey(0), x, patch_size=8,
                           mask_ratio=0.75)
        kept = np.asarray(out).mean()
        np.testing.assert_allclose(kept, 0.25, atol=0.05)

    def test_loss_finite_and_me_max_negative_at_uniform(self):
        rng = jax.random.PRNGKey(0)
        a = jax.random.normal(rng, (8, 16))
        t = jax.random.normal(jax.random.PRNGKey(1), (8, 16))
        protos = jax.random.normal(jax.random.PRNGKey(2), (4, 16))
        loss, aux = msn_loss(a, t, protos)
        assert np.isfinite(float(loss))
        assert float(aux["me_max"]) <= 0.0


class TestTrainStep:
    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_loss_decreases(self):
        enc = VisionTransformer(patch_size=8, embed_dim=32, depth=2,
                                num_heads=2, pretrain_img_size=32)
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 32, 3))
        params = enc.init(jax.random.PRNGKey(1), x)["params"]
        target_params = jax.tree.map(jnp.copy, params)
        protos = jax.random.normal(jax.random.PRNGKey(2), (16, 32))
        tx = optax.adam(1e-3)
        opt = tx.init((params, protos))
        step = make_msn_train_step(enc, tx, patch_size=8)
        losses = []
        key = jax.random.PRNGKey(3)
        for i in range(15):
            key, sub = jax.random.split(key)
            params, target_params, protos, opt, loss, aux = step(
                params, target_params, protos, opt, x, sub
            )
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestViewPairing:
    def test_views_first_ordering(self):
        from sgdm_tpu.selfsup.msn_train import _views_first

        x = jnp.arange(2 * 3).reshape(2, 3, 1)  # B=2, V=3
        out = np.asarray(_views_first(x)).ravel()
        # view-major: all of view 0 (b0,b1), then view 1, then view 2
        np.testing.assert_array_equal(out, [0, 3, 1, 4, 2, 5])

    def test_multiview_loss_pairs_anchor_with_own_target(self):
        """Anchors that EQUAL their sample's target must score a lower
        cross-entropy than batch-major (mis-paired) ordering — the
        regression for the [B,V]->B*V reshape bug."""
        from sgdm_tpu.selfsup.msn_train import _views_first, msn_multiview_loss

        b, v, d, k = 4, 2, 8, 4
        rng = np.random.default_rng(0)
        protos = jnp.asarray(rng.standard_normal((k, d)), jnp.float32)
        target = jnp.asarray(rng.standard_normal((b, d)) * 4, jnp.float32)
        anchors_bv = jnp.broadcast_to(target[:, None], (b, v, d))  # [B,V,D]

        good, _ = msn_multiview_loss(
            _views_first(anchors_bv), target, protos, num_views=v,
            memax_weight=0.0)
        bad, _ = msn_multiview_loss(
            anchors_bv.reshape(b * v, d), target, protos, num_views=v,
            memax_weight=0.0)
        assert float(good) < float(bad)
