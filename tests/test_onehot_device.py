"""Device-side one-hot layout path (round-5: the layout-pipeline loader
fix).  Datasets with `onehot_on_device=True` ship uint8 ID masks; the
trainer expands them to [B,H,W,K] f32 in one fused device op
(`trainer._device_batch`).  Must be bit-identical to the host one-hot
contract (ref: dataset/transforms/complex_ds_common_util.py:103-133)."""

from __future__ import annotations

import numpy as np

from sgdm_tpu.data.synthetic import SyntheticSegImages
from sgdm_tpu.data.transforms import segmask_to_ids, segmask_to_onehot


def test_segmask_to_ids_matches_onehot():
    rng = np.random.RandomState(0)
    mask = rng.randint(0, 27, (16, 16)).astype(np.int64)
    mask[0, :4] = 255  # void pixels → background 0
    f2c = {i: i % 5 for i in range(27)}
    f2c[255] = 0
    for m, k, f in [(mask, 27, None), (mask, 5, f2c)]:
        ids = segmask_to_ids(m, k, f)
        assert ids.dtype == np.uint8
        np.testing.assert_array_equal(
            np.eye(k, dtype=np.float32)[ids], segmask_to_onehot(m, k, f))


def test_synthetic_id_mode_contract():
    kw = dict(size=16, num_classes=4, length=8, seed=0, stego_k=6)
    host = SyntheticSegImages(**kw)[3]
    dev = SyntheticSegImages(onehot_on_device=True, **kw)[3]
    assert dev["stegomask"].dtype == np.uint8
    assert dev["stegomask"].shape == (16, 16)
    assert dev["lostbboxmask"].dtype == np.uint8
    np.testing.assert_array_equal(
        np.eye(6, dtype=np.float32)[dev["stegomask"]], host["stegomask"])
    np.testing.assert_array_equal(
        dev["lostbboxmask"].astype(np.float32), host["lostbboxmask"])
    # non-mask keys unchanged
    np.testing.assert_array_equal(dev["image"], host["image"])
    np.testing.assert_array_equal(dev["stego_attr"], host["stego_attr"])
    # the mask payload (the dominant term at 64px/K=21) shrinks ≥10×
    masks = lambda b: b["segmask"].nbytes + b["stegomask"].nbytes
    assert masks(dev) * 10 <= masks(host)


def test_trainer_device_batch_expands_ids():
    import jax

    from sgdm_tpu.training.trainer import SelfGuidedDiffusionTrainer

    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    k = 6
    trainer = SelfGuidedDiffusionTrainer(
        condition_method="stegoclusterlayout", cond_dim=k, cond_scale=2.0,
        cond_drop_prob=0.1,
        condition={"stegoclusterlayout": {"layout_dim": k}},
        dynamic={
            "target": "sgdm_tpu.models.factory.create_denoiser",
            "params": dict(model_channels=8, out_channels=3,
                           num_res_blocks=1, channel_mult=[1],
                           attention_resolutions=[], num_heads=2,
                           use_ca_block=True, cond_token_num=1,
                           context_dim=8, cond_dim=k,
                           condition_method="stegoclusterlayout"),
        },
        diffusion_model={"target": "sgdm_tpu.diffusion.GaussianDiffusion",
                         "params": {"num_timesteps": 10}},
        optim={"name": "adamw", "params": {"lr": 1e-4, "wd": 0.0},
               "scheduler_config": None},
        pl={"trainer": {"strategy": None}},
        log_dir="/tmp/sgdm_onehot_test",
    )
    kw = dict(size=16, num_classes=4, length=8, seed=0, stego_k=k)
    host_ds = SyntheticSegImages(**kw)
    dev_ds = SyntheticSegImages(onehot_on_device=True, **kw)
    collate = lambda ds: {key: np.stack([ds[i][key] for i in range(4)])
                          for key in ds[0]}
    got_host = trainer._device_batch(collate(host_ds), training=True)
    got_dev = trainer._device_batch(collate(dev_ds), training=True)
    assert got_dev["layout"].shape == (4, 16, 16, k)
    np.testing.assert_array_equal(np.asarray(got_dev["layout"]),
                                  np.asarray(got_host["layout"]))
    np.testing.assert_array_equal(np.asarray(got_dev["cond"]),
                                  np.asarray(got_host["cond"]))


def test_layout_to_device_wire_formats():
    import jax.numpy as jnp

    from sgdm_tpu.conditioning.condition import layout_to_device

    rng = np.random.RandomState(1)
    ids = rng.randint(0, 6, (4, 16, 16)).astype(np.uint8)
    # batched id masks expand to one-hot, bit-equal to the host contract
    out = layout_to_device(ids, 6)
    assert out.shape == (4, 16, 16, 6) and out.dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(out), np.eye(6, dtype=np.float32)[ids])
    # single-sample [H,W] id masks (condscale sweep path)
    one = layout_to_device(ids[0], 6)
    assert one.shape == (16, 16, 6)
    # f32 one-hots and binary [B,H,W,1] bbox masks pass through unchanged
    hot = np.eye(6, dtype=np.float32)[ids]
    np.testing.assert_array_equal(np.asarray(layout_to_device(hot, 6)), hot)
    bbox = (ids[..., None] > 2).astype(np.uint8)
    np.testing.assert_array_equal(
        np.asarray(layout_to_device(bbox, 6)), bbox.astype(np.float32))
    assert layout_to_device(None, 6) is None
    # out-of-range ids fail loudly (host parity: np.eye(K)[ids] raises)
    bad = ids.copy()
    bad[0, 0, 0] = 6
    try:
        layout_to_device(bad, 6)
        raise AssertionError("expected ValueError on out-of-range id")
    except ValueError:
        pass


def test_segmask_to_ids_rejects_out_of_range():
    mask = np.full((4, 4), 3, dtype=np.int64)
    try:
        segmask_to_ids(mask, 3)
        raise AssertionError("expected IndexError on id >= num_classes")
    except IndexError:
        pass


def test_imagelogger_and_harness_accept_id_masks():
    """The vis/FID sampler paths must expand id-mask layouts too — they
    receive the RAW batch (not trainer._device_batch output)."""
    import jax

    from sgdm_tpu.conditioning.condition import layout_dim_of
    from sgdm_tpu.eval.harness import _make_batch_sample_fn

    jax.config.update("jax_default_device", jax.devices("cpu")[0])

    class StubTrainer:
        condition_method = "stegoclusterlayout"
        condition_cfg = {"stegoclusterlayout": {"layout_dim": 6}}
        cond_drop_prob = 0.1

        def sampling_progressive(self, b, h, c, key, cond=None, layout=None,
                                 **kw):
            # the denoiser contract: layout arrives [B,H,W,K] f32
            assert layout is not None and layout.ndim == 4, layout.shape
            assert layout.shape[-1] == 6, layout.shape
            import jax.numpy as jnp
            assert layout.dtype == jnp.float32
            img = np.zeros((b, h, h, c), dtype=np.uint8)
            return img, {}

    rng = np.random.RandomState(2)
    batch = {
        "image": rng.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32),
        "stego_attr": np.ones((4, 6), dtype=np.float32),
        "stegomask": rng.randint(0, 6, (4, 16, 16)).astype(np.uint8),
    }
    fn = _make_batch_sample_fn(StubTrainer(), cond_scale=2.0,
                               sampling_method="ddim", num_steps=2)
    out = fn(batch, seed=0)
    assert out.shape == (4, 16, 16, 3)
    assert layout_dim_of("stegoclusterlayout",
                         StubTrainer.condition_cfg) == 6
