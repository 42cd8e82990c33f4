"""MAE pre-training tests: shapes, masking semantics, loss decreases."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sgdm_tpu.selfsup.mae import MAE, mae_loss, make_mae_train_step
import pytest


def tiny_mae():
    return MAE(patch_size=8, embed_dim=32, depth=2, num_heads=2,
               decoder_dim=16, decoder_depth=1, decoder_heads=2,
               mask_ratio=0.75, pretrain_img_size=32)


class TestMAE:
    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_shapes_and_mask_ratio(self):
        m = tiny_mae()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        params = m.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))["params"]
        pred, target, mask = m.apply({"params": params}, x, jax.random.PRNGKey(3))
        n = (32 // 8) ** 2
        assert pred.shape == (2, n, 8 * 8 * 3)
        assert target.shape == pred.shape
        assert mask.shape == (2, n)
        # 75% masked (within integer rounding)
        np.testing.assert_allclose(np.asarray(mask).mean(), 0.75, atol=0.1)

    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_target_per_patch_normalized(self):
        m = tiny_mae()
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3)) * 5 + 3
        params = m.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))["params"]
        _, target, _ = m.apply({"params": params}, x, jax.random.PRNGKey(3))
        t = np.asarray(target)
        np.testing.assert_allclose(t.mean(-1), 0.0, atol=1e-4)
        np.testing.assert_allclose(t.std(-1), 1.0, atol=1e-2)

    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_loss_decreases(self):
        m = tiny_mae()
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
        params = m.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))["params"]
        tx = optax.adam(1e-3)
        opt = tx.init(params)
        step = make_mae_train_step(m, tx)
        losses = []
        key = jax.random.PRNGKey(4)
        for i in range(30):
            key, sub = jax.random.split(key)
            params, opt, loss = step(params, opt, x, sub)
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_encoder_plugs_into_backbone(self):
        from sgdm_tpu.models.vit import VisionTransformer
        from sgdm_tpu.selfsup.ssl_backbone import SSLBackbone

        m = tiny_mae()
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
        params = m.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))["params"]
        enc = m.encoder_params_for_backbone(params)
        vit = VisionTransformer(patch_size=8, embed_dim=32, depth=2,
                                num_heads=2, pretrain_img_size=32)
        bb = SSLBackbone("mae_tiny", vit, enc, image_size=32)
        feats = bb.batch_encode_feat(
            bb.transform_batch(np.zeros((2, 32, 32, 3), np.uint8))
        )
        assert feats.shape == (2, 32)
