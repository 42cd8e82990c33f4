"""WRN validation trainer tests (data/wrn_validate.py vs
ref: side_repo/Imagenet32_Scripts/WRNs_imagenet.py)."""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgdm_tpu.data.wrn_validate import (
    WideResNet,
    iterate_minibatches,
    load_databatch,
    load_validation_data,
    train_wrn,
)


def _write_tiny_pickles(folder, img_size=32, n_per=64, num_classes=4,
                        num_batches=2):
    """Chrabaszcz-format pickles: planar uint8 rows, 1-based labels, mean."""
    rng = np.random.RandomState(0)
    folder.mkdir(parents=True, exist_ok=True)
    dim = 3 * img_size * img_size
    all_rows = []
    for i in range(1, num_batches + 1):
        # class-separable data: class c has mean pixel ~ 60*c
        labels = rng.randint(1, num_classes + 1, n_per)
        rows = (labels[:, None] * 60 + rng.randint(0, 30, (n_per, dim))
                ).clip(0, 255).astype(np.uint8)
        all_rows.append(rows)
        d = {"data": rows, "labels": labels.tolist(),
             "mean": np.concatenate(all_rows).mean(0)}
        pickle.dump(d, open(folder / f"train_data_batch_{i}", "wb"))
    labels = rng.randint(1, num_classes + 1, n_per)
    rows = (labels[:, None] * 60 + rng.randint(0, 30, (n_per, dim))
            ).clip(0, 255).astype(np.uint8)
    pickle.dump({"data": rows, "labels": labels.tolist()},
                open(folder / "val_data", "wb"))
    return folder


def test_databatch_parity(tmp_path):
    """x/255 − mean/255, planar→NHWC, flip-doubling, 0-based labels
    (WRNs_imagenet.py:86-118)."""
    f = _write_tiny_pickles(tmp_path / "d", img_size=8, n_per=6)
    d = load_databatch(f, 1, img_size=8)
    assert d["X"].shape == (12, 8, 8, 3)  # doubled by the flip
    np.testing.assert_array_equal(d["X"][:6], d["X"][6:][:, :, ::-1, :])
    assert d["Y"].min() >= 0 and d["Y"].max() <= 3
    np.testing.assert_array_equal(d["Y"][:6], d["Y"][6:])
    # val shares the TRAIN mean (:61-66)
    v = load_validation_data(f, d["mean"], img_size=8)
    raw = pickle.load(open(f / "val_data", "rb"))
    np.testing.assert_allclose(
        v["X"][0, 0, 0, 0],
        raw["data"][0, 0] / np.float32(255) - d["mean"][0], rtol=1e-6)


def test_augment_shapes():
    rng = np.random.RandomState(0)
    x = np.zeros((10, 8, 8, 3), np.float32)
    y = np.arange(10, dtype=np.int32)
    batches = list(iterate_minibatches(x, y, 4, rng, augment=True,
                                       img_size=8))
    assert len(batches) == 2  # drop-last semantics (:229)
    assert batches[0][0].shape == (4, 8, 8, 3)


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_wrn_structure():
    """Stack count follows img_size (:185-205); projection/bias layout."""
    m32 = WideResNet(nout=10, n=1, k=1, img_size=32)
    v = jax.jit(lambda k, x: m32.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    p = v["params"]
    assert {"stack0_block0", "stack1_block0", "stack2_block0"} <= set(p)
    assert "stack3_block0" not in p  # 128k stack only at >=64 px
    # batch_norm-wrapped convs are bias-free; conv2 keeps its bias
    assert "bias" not in p["stack0_block0"]["conv1"]
    assert "bias" in p["stack0_block0"]["conv2"]
    assert "bias" not in p["stack0_block0"]["proj"]
    # stride-2 on increase_dim conv1 and projection
    out = m32.apply(v, jnp.zeros((2, 32, 32, 3)), train=False)
    assert out.shape == (2, 10)

    m64 = WideResNet(nout=10, n=1, k=1, img_size=64)
    v64 = jax.jit(lambda k, x: m64.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    assert "stack3_block0" in v64["params"]


@pytest.mark.slow
def test_wrn_trains_and_resumes(tmp_path):
    """Few epochs on separable data: loss drops, top1 beats chance, and a
    resume from the rolling pickle replays the LR schedule and continues."""
    f = _write_tiny_pickles(tmp_path / "d", img_size=16, n_per=64,
                            num_classes=4, num_batches=2)
    ck = tmp_path / "wrn_last.p"
    out = train_wrn(str(f), img_size=16, n=1, k=0.5, num_epochs=2, lr=0.05,
                    lr_drops=(1,), reg_fac=1e-4, batch_size=16, nout=4,
                    num_train_batches=2, ckpt_path=str(ck),
                    val_batch_size=32)
    assert out["top1"] > 0.3  # 4-way chance = 0.25; separable data beats it
    net = pickle.load(open(ck, "rb"))
    assert net["epoch"] == 2
    out2 = train_wrn(str(f), img_size=16, n=1, k=0.5, num_epochs=3, lr=0.05,
                     lr_drops=(1,), reg_fac=1e-4, batch_size=16, nout=4,
                     num_train_batches=2, cont=str(ck),
                     val_batch_size=32)
    assert out2["top1"] >= out["top1"] - 0.1  # continued, not reset
