"""h5 condition-contract tests with synthetic h5 fixtures.

Builds tiny cluster/feat/LOST h5 files in the reference's exact schema
(SURVEY.md §2.7) and checks every ConditionLookup method against them.
"""

import json

import h5py
import numpy as np
import pytest

from sgdm_tpu.data.h5cond import (
    ConditionLookup,
    LostLookup,
    ds_has_label_info,
    normalize_feat,
    skip_id2name,
)

N, K, D = 12, 4, 8


@pytest.fixture()
def cluster_h5(tmp_path):
    path = tmp_path / "v4_test_cluster4.h5"
    rng = np.random.RandomState(0)
    with h5py.File(path, "w") as f:
        f.create_dataset("train", data=rng.randint(0, K, N).astype(np.int64))
        f.create_dataset("val", data=rng.randint(0, K, N).astype(np.int64))
        f.create_dataset("centroids", data=rng.randn(K, D).astype(np.float32))
        f.create_dataset("train_feat", data=rng.randn(N, D).astype(np.float32))
        f.create_dataset("train_nns", data=np.tile(np.arange(5), (N, 1)))
        f.create_dataset("val_nns", data=np.tile(np.arange(5), (N, 1)))
        g = f.create_dataset("all_attributes", data=np.zeros(1))
        g.attrs["cluster_k"] = K
    json_path = str(path).replace(".h5", ".json")
    name2id = {f"img{i}.jpg": i for i in range(N)}
    json.dump({"name2id": name2id, "id2name": {v: k for k, v in name2id.items()}},
              open(json_path, "w"))
    return path


def id2name(i):
    return f"img{i}.jpg"


class TestHelpers:
    def test_label_info_predicates(self):
        assert ds_has_label_info("cifar10")
        assert ds_has_label_info("inp")
        assert not ds_has_label_info("voc64")
        assert not ds_has_label_info("cocostuff64")
        assert not ds_has_label_info("ffhq64")
        assert skip_id2name("ffhq64")
        assert not skip_id2name("inp")

    def test_normalize(self):
        v = np.array([3.0, 4.0], dtype=np.float32)
        np.testing.assert_allclose(normalize_feat(v), [0.6, 0.8])


class TestClusterLookup:
    def test_onehot_matches_h5(self, cluster_h5):
        lk = ConditionLookup("cluster", str(cluster_h5), "train", "test_ds",
                             id2name=id2name)
        with h5py.File(cluster_h5) as f:
            cl = f["train"][:]
        for i in [0, 5, 11]:
            out = lk.get(i)
            assert out["cluster"].shape == (K,)
            assert out["cluster"].argmax() == cl[i]
            assert out["cluster_id"] == cl[i]
            assert out["cluster_random"].shape == (K,)

    def test_centroid(self, cluster_h5):
        lk = ConditionLookup("centroid", str(cluster_h5), "train", "test_ds",
                             id2name=id2name)
        with h5py.File(cluster_h5) as f:
            cl, cents = f["train"][:], f["centroids"][:]
        out = lk.get(2)
        np.testing.assert_allclose(out["centroid"], cents[cl[2]])
        assert out["centroid_random"].shape == (D,)

    def test_knn_feat(self, cluster_h5):
        lk = ConditionLookup(
            "knn_feat", str(cluster_h5), "train", "test_ds", id2name=id2name,
            condition_cfg={"knn_feat": {"knn_k": 3}},
        )
        out = lk.get(1)
        assert out["knn_feat"].shape == (D,)
        np.testing.assert_allclose(np.linalg.norm(out["knn_feat"]), 1.0, rtol=1e-5)

    def test_labelcluster_concat(self, cluster_h5):
        labels = np.arange(N) % 3
        lk = ConditionLookup(
            "labelcluster", str(cluster_h5), "train", "test_ds",
            label_list=labels, num_classes=3, id2name=id2name,
        )
        out = lk.get(4)
        assert out["labelcluster"].shape == (3 + K,)
        assert out["labelcluster"][:3].argmax() == labels[4]

    def test_label_noise(self, cluster_h5):
        labels = np.zeros(N, dtype=np.int64)
        lk = ConditionLookup(
            None, None, "train", "test_ds",
            label_list=labels, num_classes=3,
            condition_cfg={"label": {"noise_ratio": 1.0}},
        )
        # with ratio 1.0 every label is replaced by its random twin
        noisy = np.array([lk.get(i)["label"].argmax() for i in range(N)])
        assert np.array_equal(noisy, lk.label_list_random % 3) or np.any(noisy != 0)

    def test_missing_h5_raises(self):
        with pytest.raises(AssertionError):
            ConditionLookup("cluster", None, "train", "test_ds")


class TestLost:
    def test_bbox_schema(self, tmp_path):
        path = tmp_path / "lost_k100.h5"
        with h5py.File(path, "w") as f:
            f.create_dataset("img0.jpg_bbox", data=np.array([1, 2, 30, 40]))
            f.create_dataset("img0.jpg_clusterid", data=np.int64(7))
            f.attrs["cluster_k"] = 100
        lk = LostLookup(str(path))
        np.testing.assert_array_equal(lk.get_bbox("img0.jpg"), [1, 2, 30, 40])
        assert lk.get_clusterid("img0.jpg") == 7


class TestClusterMixAndPatch:
    def test_clustermix_concat(self, cluster_h5, tmp_path):
        import shutil

        h5b = tmp_path / "v4_test_cluster_b.h5"
        shutil.copy(cluster_h5, h5b)
        lk = ConditionLookup(
            "clustermix", str(cluster_h5), "train", "test_ds",
            h5_file2=str(h5b), id2name=id2name,
        )
        out = lk.get(2)
        assert out["clustermix"].shape == (K + K,)
        assert out["clustermix"].sum() == 2.0
        assert out["clustermix_random"].shape == (K + K,)

    def test_patchcluster(self, tmp_path):
        path = tmp_path / "v4_patch.h5"
        rng = np.random.RandomState(0)
        with h5py.File(path, "w") as f:
            f.create_dataset("train", data=rng.randint(0, 5, (N, 9)))
            d = f.create_dataset("all_attributes", (1,))
            d.attrs["cluster_k"] = 5
        json.dump({"name2id": {f"img{i}.jpg": i for i in range(N)}},
                  open(str(path).replace(".h5", ".json"), "w"))
        lk = ConditionLookup("patchcluster", str(path), "train", "test_ds",
                             id2name=id2name)
        out = lk.get(1)
        assert out["patchcluster"].shape == (9, 5)
        np.testing.assert_allclose(out["patchcluster"].sum(-1), 1.0)


class TestLookupCoverageRegressions:
    def test_cluster_lookup_is_noop(self):
        """cluster_lookup conditions via batch['id'] in the model — the
        per-sample h5 lookup must be a no-op, not a ValueError."""
        lk = ConditionLookup("cluster_lookup", None, "train", "test_ds",
                             id2name=id2name)
        assert lk.get(3) == {}

    def test_patchfeat_returns_raw_rows(self, tmp_path):
        """patchfeat fetches the per-patch feature rows RAW
        (unsupervised_patchfeat.py returns feat_list[row] unnormalized)."""
        path = tmp_path / "v3_test_withpatches.h5"
        rng = np.random.RandomState(1)
        feats = rng.randn(N, 5, D).astype(np.float32) * 3.0
        with h5py.File(path, "w") as f:
            f.create_dataset("train", data=feats)
        json.dump({"name2id": {f"img{i}.jpg": i for i in range(N)}},
                  open(str(path).replace(".h5", ".json"), "w"))
        lk = ConditionLookup("patchfeat", str(path), "train", "test_ds",
                             id2name=id2name)
        out = lk.get(4)
        np.testing.assert_allclose(out["patchfeat"], feats[4], rtol=1e-6)

    def test_one_based_shift_requires_one_based_evidence(self):
        """A subset merely missing class 0 must NOT be shifted down."""
        # looks 1-based: ids 1..4 over 4 classes → shift
        lk = ConditionLookup("label", None, "train", "in32",
                             label_list=[1, 2, 3, 4], num_classes=4)
        assert lk.label_list.min() == 0 and lk.label_list.max() == 3
        # 0-based subset that just lacks class 0 (min 1, max 2 of 4) → keep
        lk2 = ConditionLookup("label", None, "train", "in32",
                              label_list=[1, 2, 1, 2], num_classes=4)
        assert lk2.label_list.min() == 1 and lk2.label_list.max() == 2
