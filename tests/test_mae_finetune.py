"""MAE fine-tuning recipe: layer-wise lr decay, wd mask, mixup/cutmix,
losses, drop-path, and a tiny end-to-end run.

Parity targets: self_sl/mae/main_finetune.py, engine_finetune.py,
util/lr_decay.py (layer scales), timm Mixup semantics."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgdm_tpu.models.vit import VisionTransformer
from sgdm_tpu.selfsup.mae_finetune import (
    FinetuneDataset, ViTClassifier, apply_mixup, finetune_wd_mask,
    label_smoothing_ce, layerwise_lr_scales, make_finetune_tx,
    soft_target_ce,
)


@pytest.fixture(scope="module")
def tiny_model_params():
    enc = VisionTransformer(patch_size=8, embed_dim=32, depth=2,
                            num_heads=2, pretrain_img_size=16)
    model = ViTClassifier(encoder=enc, num_classes=7)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3)))["params"]
    return model, params


def test_layerwise_lr_scales(tiny_model_params):
    """util/lr_decay.py:23-25: num_layers = depth+1, scale =
    ld^(num_layers - layer_id); patch/cls/pos at 0, block i at i+1,
    head/fc_norm/final-norm at num_layers."""
    _, params = tiny_model_params
    ld, depth = 0.75, 2
    scales = layerwise_lr_scales(params, ld, depth)
    assert np.isclose(scales["encoder"]["cls_token"], ld ** 3)
    assert np.isclose(scales["encoder"]["pos_embed"], ld ** 3)
    assert np.isclose(
        scales["encoder"]["patch_embed"]["kernel"], ld ** 3)
    assert np.isclose(
        scales["encoder"]["blocks_0"]["attn"]["qkv"]["kernel"], ld ** 2)
    assert np.isclose(
        scales["encoder"]["blocks_1"]["mlp"]["fc1"]["kernel"], ld ** 1)
    assert np.isclose(scales["encoder"]["norm"]["scale"], 1.0)
    assert np.isclose(scales["head"]["kernel"], 1.0)
    assert np.isclose(scales["fc_norm"]["scale"], 1.0)


def test_wd_mask(tiny_model_params):
    """param_groups_lrd:32 — no decay for 1-D params and cls/pos."""
    _, params = tiny_model_params
    mask = finetune_wd_mask(params)
    assert mask["head"]["kernel"] is True
    assert mask["head"]["bias"] is False
    assert mask["encoder"]["cls_token"] is False  # 3-D but named no-decay
    assert mask["encoder"]["pos_embed"] is False
    assert mask["encoder"]["blocks_0"]["attn"]["qkv"]["kernel"] is True
    assert mask["encoder"]["blocks_0"]["norm1"]["scale"] is False


def test_mixup_targets_and_lambda():
    """Soft targets are a lam-convex combination of smoothed one-hots and
    rows sum to 1; cutmix lambda equals the realized box-area fraction."""
    rng = jax.random.PRNGKey(3)
    x = jnp.stack([jnp.full((16, 16, 3), float(i)) for i in range(4)])
    y = jnp.array([0, 1, 2, 3])

    # pure cutmix: recover lam from the pixel mix and check targets
    xm, tgt = apply_mixup(rng, x, y, 10, mixup_alpha=0.0, cutmix_alpha=1.0,
                          smoothing=0.0)
    np.testing.assert_allclose(np.asarray(tgt).sum(-1), 1.0, rtol=1e-6)
    # sample 0 mixes with sample 3: pixel values are 0 or 3 exactly
    frac_kept = float((np.asarray(xm[0]) == 0.0).mean())
    np.testing.assert_allclose(float(tgt[0, 0]), frac_kept, atol=1e-6)
    np.testing.assert_allclose(float(tgt[0, 3]), 1 - frac_kept, atol=1e-6)

    # pure mixup: every pixel is the same convex blend
    xm2, tgt2 = apply_mixup(rng, x, y, 10, mixup_alpha=0.8,
                            cutmix_alpha=0.0, smoothing=0.0)
    lam = float(tgt2[0, 0])
    np.testing.assert_allclose(np.asarray(xm2[0]),
                               lam * 0.0 + (1 - lam) * 3.0, atol=1e-5)

    # prob=0 is the identity (targets = smoothed one-hots)
    xm3, tgt3 = apply_mixup(rng, x, y, 10, mixup_alpha=0.8,
                            cutmix_alpha=1.0, prob=0.0, smoothing=0.1)
    np.testing.assert_allclose(np.asarray(xm3), np.asarray(x))
    np.testing.assert_allclose(float(tgt3[1, 1]), 0.9 + 0.1 / 10, rtol=1e-6)


def test_losses_agree():
    """LabelSmoothingCE == SoftTargetCE on smoothed one-hots."""
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((8, 5)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 5, 8))
    a = label_smoothing_ce(logits, y, 5, smoothing=0.1)
    onehot = jax.nn.one_hot(y, 5) * 0.9 + 0.1 / 5
    b = soft_target_ce(logits, onehot)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_drop_path_default_is_identity():
    """drop_path_rate=0 (the default everywhere else in the repo) leaves
    the forward unchanged; rate>0 in train mode is stochastic."""
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 16, 3)),
                    jnp.float32)
    enc0 = VisionTransformer(patch_size=8, embed_dim=32, depth=2,
                             num_heads=2, pretrain_img_size=16)
    encd = VisionTransformer(patch_size=8, embed_dim=32, depth=2,
                             num_heads=2, pretrain_img_size=16,
                             drop_path_rate=0.5)
    params = enc0.init(jax.random.PRNGKey(0), x)["params"]
    base = enc0.apply({"params": params}, x, out="cls")
    # same params, drop-path module, deterministic → identical
    det = encd.apply({"params": params}, x, out="cls")
    np.testing.assert_allclose(np.asarray(base), np.asarray(det), rtol=1e-6)
    # train mode differs across rng draws
    t1 = encd.apply({"params": params}, x, out="cls", deterministic=False,
                    rngs={"drop_path": jax.random.PRNGKey(1)})
    t2 = encd.apply({"params": params}, x, out="cls", deterministic=False,
                    rngs={"drop_path": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_finetune_tx_scales_updates(tiny_model_params):
    """The post-AdamW update is scaled per layer: with equal gradients the
    head moves ~ld^-3 times further than the patch embed."""
    import optax

    _, params = tiny_model_params
    tx = make_finetune_tx(params, lambda s: 1e-3, weight_decay=0.0,
                          layer_decay=0.5, depth=2)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    head = float(jnp.abs(updates["head"]["kernel"]).mean())
    patch = float(jnp.abs(
        updates["encoder"]["patch_embed"]["kernel"]).mean())
    np.testing.assert_allclose(patch / head, 0.5 ** 3, rtol=1e-4)
    del optax


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_finetune_end_to_end(tmp_path):
    """Two epochs on synthetic data with a pretrained tiny encoder: runs,
    logs finite losses, saves both full and encoder checkpoints, and the
    encoder ckpt round-trips through the SSLBackbone zoo."""
    from sgdm_tpu.selfsup.mae_finetune import build_argparser, train_finetune
    from sgdm_tpu.selfsup.pretrain_common import save_encoder_ckpt
    from sgdm_tpu.selfsup.ssl_backbone import get_ssl_backbone

    enc = VisionTransformer(patch_size=8, embed_dim=32, depth=2,
                            num_heads=2, pretrain_img_size=16)
    pre = enc.init(jax.random.PRNGKey(1),
                   jnp.zeros((1, 16, 16, 3)))["params"]
    pre_path = tmp_path / "pre.msgpack"
    save_encoder_ckpt(pre_path, pre, meta={
        "arch": "vit", "patch_size": 8, "embed_dim": 32, "depth": 2,
        "num_heads": 2, "pretrain_img_size": 16, "method": "mae"})

    args = build_argparser().parse_args([
        "--ds", "synthetic", "--n_train", "48", "--n_val", "16",
        "--input_size", "16", "--batch_size", "16", "--epochs", "2",
        "--patch_size", "8", "--embed_dim", "32", "--depth", "2",
        "--num_heads", "2", "--warmup_epochs", "1",
        "--mixup", "0.8", "--cutmix", "1.0",
        "--finetune", str(pre_path),
        "--output_dir", str(tmp_path / "out"),
    ])
    ckpt = train_finetune(args)
    assert ckpt.exists()
    enc_ckpt = tmp_path / "out" / "finetuned_encoder.msgpack"
    assert enc_ckpt.exists()
    bk = get_ssl_backbone("mae_finetuned", ckpt_path=str(enc_ckpt),
                          image_size=16)
    feats = bk.batch_encode_feat(bk.transform_batch(
        np.zeros((2, 16, 16, 3), np.uint8)))
    assert feats.shape == (2, 32) and np.isfinite(feats).all()
