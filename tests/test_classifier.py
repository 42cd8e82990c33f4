"""Noisy-latent classifier: train step learns, CLI exports, top-k parity."""

from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier


def test_compute_top_k():
    from sgdm_tpu.training.classifier import compute_top_k

    logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    labels = np.array([1, 2])
    assert compute_top_k(logits, labels, 1) == 0.5
    assert compute_top_k(logits, labels, 3) == 1.0


def test_classifier_cli_trains_and_exports(tmp_path):
    from sgdm_tpu.training.classifier import build_argparser, train_classifier

    out = tmp_path / "clf.msgpack"
    args = build_argparser().parse_args([
        "--data-len", "32", "--batch-size", "8", "--epochs", "1",
        "--image-size", "16", "--channels", "32", "--num-classes", "4",
        "--num-timesteps", "50", "--log-steps", "3", "--workers", "2",
        "--out", str(out),
    ])
    train_classifier(args)
    assert out.exists() and out.stat().st_size > 1000


def test_classifier_learns_at_low_noise():
    """A few steps on separable synthetic data must beat chance at t=0."""
    import jax
    import jax.numpy as jnp
    import optax

    from sgdm_tpu.data.synthetic import SyntheticImages
    from sgdm_tpu.diffusion.schedule import DiffusionSchedule
    from sgdm_tpu.models.encoder_unet import EncoderUNetModel
    from sgdm_tpu.training.classifier import (
        compute_top_k,
        make_classifier_eval_step,
        make_classifier_train_step,
    )

    model = EncoderUNetModel(num_classes=4, model_channels=32,
                             num_res_blocks=1, channel_mult=(1, 2),
                             attention_resolutions=(2,), num_heads=4)
    sched = DiffusionSchedule.create(num_timesteps=50)
    ds = SyntheticImages(size=16, length=64, num_classes=4, seed=0)
    xs = np.stack([ds[i]["image"] for i in range(64)])
    ys = np.stack([np.argmax(ds[i]["label"]) for i in range(64)])

    tx = optax.adamw(3e-4)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1,), jnp.int32))["params"]
    opt_state = tx.init(params)
    step = make_classifier_train_step(model, sched, tx)
    x = jnp.asarray(xs, jnp.float32)
    y = jnp.asarray(ys, jnp.int32)
    for i in range(30):
        params, opt_state, loss, _ = step(params, opt_state, x, y,
                                          jax.random.fold_in(rng, i))
    eval_step = make_classifier_eval_step(model, sched)
    t0 = jnp.zeros((64,), jnp.int32)
    _, logits = eval_step(params, x, y, jax.random.PRNGKey(7), t0)
    acc = compute_top_k(np.asarray(logits), ys, 1)
    assert acc > 0.5, acc  # chance = 0.25
