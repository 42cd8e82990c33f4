"""SSL pre-training stacks: MSN and MAE trainers end-to-end (tiny, CPU) +
schedule goldens against the reference's own schedule classes."""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_msn_cli_trains_and_exports(tmp_path):
    from sgdm_tpu.selfsup.msn_train import build_argparser, train_msn
    from sgdm_tpu.selfsup.ssl_backbone import get_ssl_backbone

    out = tmp_path / "msn_tiny.msgpack"
    args = build_argparser().parse_args([
        "--ds", "synthetic", "--data-len", "32", "--batch-size", "8",
        "--epochs", "1", "--workers", "2", "--num-proto", "16",
        "--out", str(out),
    ])
    train_msn(args)
    assert out.exists() and (tmp_path / "msn_tiny.msgpack.json").exists()

    bb = get_ssl_backbone("msn_native", ckpt_path=str(out), image_size=32)
    imgs = np.random.default_rng(0).integers(
        0, 255, (4, 32, 32, 3), dtype=np.uint8
    )
    feats = bb.batch_encode_feat(bb.transform_batch(imgs))
    assert feats.shape == (4, 64)
    assert np.isfinite(feats).all()


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_mae_cli_trains_and_exports(tmp_path):
    from sgdm_tpu.selfsup.mae_train import build_argparser, train_mae
    from sgdm_tpu.selfsup.ssl_backbone import get_ssl_backbone

    out = tmp_path / "mae_tiny.msgpack"
    args = build_argparser().parse_args([
        "--ds", "synthetic", "--data-len", "32", "--batch-size", "8",
        "--epochs", "1", "--workers", "2", "--out", str(out),
    ])
    train_mae(args)
    bb = get_ssl_backbone("mae_native", ckpt_path=str(out), image_size=32)
    imgs = np.random.default_rng(1).integers(
        0, 255, (3, 32, 32, 3), dtype=np.uint8
    )
    feats = bb.batch_encode_feat(bb.transform_batch(imgs))
    assert feats.shape == (3, 64)
    assert np.isfinite(feats).all()


def test_msn_loss_decreases_assignment_entropy_structure():
    """Sanity: loss is finite, me-max pushes toward uniform mean usage."""
    import jax
    import jax.numpy as jnp

    from sgdm_tpu.selfsup.msn_train import msn_multiview_loss

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    protos = jnp.asarray(rng.standard_normal((12, 16)), jnp.float32)
    loss, aux = msn_multiview_loss(a, t, protos, num_views=2)
    assert np.isfinite(float(loss))
    # me-max = -H(avg) + log K <= log K, >= 0 at uniform... >= 0 always
    assert float(aux["me_max"]) >= -1e-5


# ----------------------------------------------------------------------
# schedule goldens vs the reference classes
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_msn_utils():
    import os

    torch = pytest.importorskip("torch")
    if not os.path.isdir("/root/reference/self_sl/msn"):
        pytest.skip("reference msn not mounted")
    if "/root/reference/self_sl/msn" not in sys.path:
        sys.path.append("/root/reference/self_sl/msn")
    from src import utils as msn_utils

    return msn_utils, torch


def test_warmup_cosine_lr_matches_reference(ref_msn_utils):
    msn_utils, torch = ref_msn_utils
    from sgdm_tpu.selfsup.pretrain_common import warmup_cosine_lr

    dummy = torch.nn.Linear(2, 2)
    opt = torch.optim.SGD(dummy.parameters(), lr=1.0)
    total, warmup = 100, 10
    ref_sched = msn_utils.WarmupCosineSchedule(
        opt, warmup_steps=warmup, start_lr=0.02, ref_lr=0.1,
        final_lr=1e-4, T_max=int(1.25 * total),
    )
    ours = warmup_cosine_lr(0.02, 0.1, 1e-4, warmup_steps=warmup,
                            total_steps=total)
    for step in range(total):
        ref_lr = ref_sched.step()
        np.testing.assert_allclose(float(ours(step)), ref_lr, rtol=1e-5,
                                   err_msg=f"step {step}")


def test_cosine_wd_matches_reference(ref_msn_utils):
    msn_utils, torch = ref_msn_utils
    import jax.numpy as jnp

    from sgdm_tpu.selfsup.pretrain_common import scheduled_weight_decay

    dummy = torch.nn.Linear(2, 2)
    opt = torch.optim.SGD(dummy.parameters(), lr=1.0, weight_decay=0.04)
    total = 80
    ref_sched = msn_utils.CosineWDSchedule(
        opt, ref_wd=0.04, final_wd=0.4, T_max=int(1.25 * total),
    )
    tx = scheduled_weight_decay(0.04, 0.4, total, mask=None)
    params = {"w": jnp.ones((2, 2))}
    state = tx.init(params)
    zero = {"w": jnp.zeros((2, 2))}
    for step in range(total):
        ref_wd = ref_sched.step()
        updates, state = tx.update(zero, state, params)
        # update on zero grads = wd * param = wd
        our_wd = float(updates["w"][0, 0])
        np.testing.assert_allclose(our_wd, ref_wd, rtol=1e-5,
                                   err_msg=f"step {step}")


def test_mae_lr_schedule_matches_reference():
    import os

    if not os.path.isdir("/root/reference/self_sl/mae"):
        pytest.skip("reference mae not mounted")
    if "/root/reference/self_sl/mae" not in sys.path:
        sys.path.append("/root/reference/self_sl/mae")
    from util import lr_sched as ref_lr_sched

    from sgdm_tpu.selfsup.mae_train import mae_lr_schedule

    class Opt:
        param_groups = [{}]

    args = types.SimpleNamespace(lr=1e-3, min_lr=1e-6, warmup_epochs=2,
                                 epochs=10)
    steps_per_epoch = 7
    ours = mae_lr_schedule(args.lr, args.min_lr, args.warmup_epochs,
                           args.epochs, steps_per_epoch)
    for it in range(10 * steps_per_epoch):
        epoch_frac = it / steps_per_epoch
        ref = ref_lr_sched.adjust_learning_rate(Opt(), epoch_frac, args)
        np.testing.assert_allclose(float(ours(it)), ref, rtol=1e-5,
                                   err_msg=f"it {it}")
