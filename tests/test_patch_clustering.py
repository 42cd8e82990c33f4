"""Patch clustering pipeline: spatial feat extraction → per-token k-means →
`patchcluster` conditioning reader (h5-schema round trip)."""

from __future__ import annotations

import json

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_backbone_ckpt(tmp_path_factory):
    """A tiny native ViT encoder ckpt so everything runs fast on CPU."""
    from sgdm_tpu.models.vit import VisionTransformer
    from sgdm_tpu.selfsup.pretrain_common import save_encoder_ckpt

    model = VisionTransformer(patch_size=8, embed_dim=32, depth=1,
                              num_heads=2, pretrain_img_size=32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    out = tmp_path_factory.mktemp("bb") / "tiny.msgpack"
    save_encoder_ckpt(out, params, meta={
        "arch": "vit", "patch_size": 8, "embed_dim": 32, "depth": 1,
        "num_heads": 2, "pretrain_img_size": 32, "method": "test",
    })
    return str(out)


def test_spatial_feat_and_patch_clustering_roundtrip(tiny_backbone_ckpt, tmp_path):
    from sgdm_tpu.data.h5cond import ConditionLookup
    from sgdm_tpu.data.synthetic import SyntheticImages
    from sgdm_tpu.selfsup.cluster_patch import clustering_withpatches
    from sgdm_tpu.selfsup.feat_extractor import extract_feat

    train = SyntheticImages(size=32, length=24, seed=0)
    val = SyntheticImages(size=32, length=8, seed=1)

    feat_h5 = extract_feat(
        train, val, dataset_name="synthetic", feat_from="tiny_native",
        batch_size=8, out_root=str(tmp_path / "feat"),
        ckpt_path=tiny_backbone_ckpt, spatial=True, resampled_size=3,
    )
    with h5py.File(feat_h5, "r") as f:
        assert f["train"].shape == (24, 1 + 9, 32)
        assert f["val"].shape == (8, 1 + 9, 32)
        assert int(f["all_attributes"].attrs["resampled_size"]) == 3
        assert np.isfinite(f["train"][:]).all()

    cluster_h5 = clustering_withpatches(
        str(feat_h5), cluster_k=4, niter=5, minp=1,
        cluster_h5_root=str(tmp_path / "cluster"),
    )
    assert "_withpatches_size3" in cluster_h5.name
    with h5py.File(cluster_h5, "r") as f:
        assert f["train"].shape == (24, 10)
        assert f["val"].shape == (8, 10)
        assert f["centroids"].shape == (4, 10, 32)
        assert f["train"][:].min() >= 0  # every token assigned
        assert f["train"][:].max() < 4
        assert int(f["all_attributes"].attrs["cluster_k"]) == 4
    assert json.load(open(str(cluster_h5).replace(".h5", ".json")))["name2id"]

    # the patchcluster conditioning reader consumes the file
    cond = ConditionLookup(
        condition_method="patchcluster", h5_file=str(cluster_h5),
        split_name="train", dataset_name="synthetic",
        id2name=train.id2name if hasattr(train, "id2name") else (lambda i: f"{i}.jpg"),
    )
    out = cond.get(0)
    oh = out["patchcluster"]
    assert oh.shape == (10, 4)
    np.testing.assert_allclose(oh.sum(-1), 1.0)


def test_attention_map_extraction(tiny_backbone_ckpt, tmp_path):
    from sgdm_tpu.data.synthetic import SyntheticImages
    from sgdm_tpu.selfsup.feat_extractor import extract_feat

    train = SyntheticImages(size=32, length=8, seed=0)
    val = SyntheticImages(size=32, length=4, seed=1)
    feat_h5 = extract_feat(
        train, val, dataset_name="synthetic", feat_from="tiny_native",
        batch_size=4, out_root=str(tmp_path / "feat"),
        ckpt_path=tiny_backbone_ckpt, attention_map=True,
    )
    with h5py.File(feat_h5, "r") as f:
        # 224/8 = 28 → 784 patches, 2 heads
        assert f["train_attentions"].shape == (8, 2, 784)
        a = f["train_attentions"][:]
        assert np.isfinite(a).all() and (a >= 0).all()
