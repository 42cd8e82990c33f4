"""The double-buffered (async) plain-CLS extraction path writes exactly the
same h5 as direct synchronous encoding: row order, labels, and name map.
Guards `selfsup/feat_extractor.py`'s one-batch-deep pipeline (the encode
for batch k dispatches while batch k-1 is converted + written)."""

from __future__ import annotations

import json

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier


@pytest.fixture(scope="module")
def tiny_backbone_ckpt(tmp_path_factory):
    from sgdm_tpu.models.vit import VisionTransformer
    from sgdm_tpu.selfsup.pretrain_common import save_encoder_ckpt

    model = VisionTransformer(patch_size=8, embed_dim=32, depth=1,
                              num_heads=2, pretrain_img_size=32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    out = tmp_path_factory.mktemp("bb") / "tiny.msgpack"
    save_encoder_ckpt(out, params, meta={
        "arch": "vit", "patch_size": 8, "embed_dim": 32, "depth": 1,
        "num_heads": 2, "pretrain_img_size": 32, "method": "test",
    })
    return str(out)


def test_pipelined_plain_extraction_matches_direct(tiny_backbone_ckpt,
                                                   tmp_path):
    from sgdm_tpu.data.synthetic import SyntheticImages
    from sgdm_tpu.selfsup.feat_extractor import extract_feat
    from sgdm_tpu.selfsup.ssl_backbone import get_ssl_backbone

    # batch_size=8 over length 20/6 → uneven final batch exercises the
    # pipeline drain
    train = SyntheticImages(size=32, length=20, seed=0)
    val = SyntheticImages(size=32, length=6, seed=1)

    feat_h5 = extract_feat(
        train, val, dataset_name="synthetic", feat_from="tiny_native",
        batch_size=8, out_root=str(tmp_path / "feat"),
        ckpt_path=tiny_backbone_ckpt,
    )

    bk = get_ssl_backbone("tiny_native", ckpt_path=tiny_backbone_ckpt)
    with h5py.File(feat_h5, "r") as f:
        for split, ds in [("train", train), ("val", val)]:
            got = f[split][:]
            assert got.shape == (len(ds), bk.feat_dim)
            imgs = np.stack([ds[i]["img4unsup"] for i in range(len(ds))])
            want = bk.batch_encode_feat(bk.transform_batch(imgs))
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
            labels = f[f"{split}_labels"][:]
            np.testing.assert_array_equal(
                labels, [np.argmax(ds[i]["label"]) for i in range(len(ds))])

    names = json.load(open(str(feat_h5).replace(".h5", ".json")))
    # synthetic train/val ids overlap (both count from 0), so the name map
    # dedups to the larger split
    assert len(names["name2id"]) == max(len(train), len(val))
