"""Tests for the on-TPU k-means / kNN (faiss replacements) and cluster CLI.

Parity targets: clustering/faiss_kmeans.py (normalization quirk, minp/
subsample semantics, exact kNN with self-dropped), cluster_standard.py
(h5 schema + filename convention).
"""

import json

import h5py
import numpy as np
import pytest

from sgdm_tpu.ops.kmeans import kmeans_assign, run_kmeans
from sgdm_tpu.ops.knn import knn_search, run_nns
from sgdm_tpu.selfsup.cluster import cal_cluster_metric, clustering


def blobs(n_per=100, k=4, d=8, scale=10.0, noise=0.05, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, d) * scale
    X = np.concatenate([c + noise * rng.randn(n_per, d) for c in centers])
    y = np.repeat(np.arange(k), n_per)
    return X.astype(np.float32), y


class TestAssign:
    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_exact_argmin(self):
        rng = np.random.RandomState(0)
        X = rng.randn(50, 4).astype(np.float32)
        C = rng.randn(6, 4).astype(np.float32)
        labels, d2 = kmeans_assign(X, C, chunk=16)
        gold = np.argmin(
            ((X[:, None] - C[None]) ** 2).sum(-1), axis=1
        )
        np.testing.assert_array_equal(labels, gold)
        gold_d = ((X - C[gold]) ** 2).sum(-1)
        np.testing.assert_allclose(d2, gold_d, rtol=1e-4, atol=1e-4)


class TestKMeans:
    def test_recovers_blobs(self):
        X, y = blobs()
        labels, cents = run_kmeans(X.copy(), X.copy(), cluster_k=4,
                                   niter=15, chunk=64)
        # k-means can hit a split/merge local minimum (faiss nredo=1 does
        # too); NMI against ground truth must still be high
        nmi = cal_cluster_metric(y, labels)["nmi"]
        assert nmi > 0.8, nmi
        assert cents.shape == (4, 8)

    def test_train_normalized_in_place(self):
        X, _ = blobs()
        Xc = X.copy()
        run_kmeans(Xc, X.copy(), cluster_k=4, niter=2, chunk=64)
        norms = np.linalg.norm(Xc, axis=1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-5)

    def test_centroids_in_normalized_space(self):
        X, _ = blobs()
        _, cents = run_kmeans(X.copy(), X.copy(), cluster_k=4, niter=15, chunk=64)
        assert np.linalg.norm(cents, axis=1).max() < 1.5  # unit-ball-ish

    def test_deterministic_given_seed(self):
        X, _ = blobs()
        l1, c1 = run_kmeans(X.copy(), X.copy(), 4, niter=5, seed=7, chunk=64)
        l2, c2 = run_kmeans(X.copy(), X.copy(), 4, niter=5, seed=7, chunk=64)
        np.testing.assert_array_equal(l1, l2)
        np.testing.assert_allclose(c1, c2)

    def test_more_clusters_than_natural(self):
        # forces empty clusters → split repair must keep all k alive
        X, _ = blobs(n_per=30, k=2)
        labels, cents = run_kmeans(X.copy(), X.copy(), cluster_k=10,
                                   niter=10, chunk=64)
        assert cents.shape == (10, 8)
        assert np.isfinite(cents).all()
        assert labels.max() < 10


class TestKNN:
    def test_matches_bruteforce(self):
        rng = np.random.RandomState(1)
        X = rng.randn(40, 6).astype(np.float32)
        Q = rng.randn(10, 6).astype(np.float32)
        d2, idx = knn_search(X, Q, k=5, chunk=4)
        gold_d = ((Q[:, None] - X[None]) ** 2).sum(-1)
        gold_idx = np.argsort(gold_d, axis=1)[:, :5]
        np.testing.assert_array_equal(idx, gold_idx)
        np.testing.assert_allclose(
            d2, np.take_along_axis(gold_d, gold_idx, 1), rtol=1e-4, atol=1e-4
        )

    def test_run_nns_drops_self(self):
        X, _ = blobs(n_per=50, k=2)
        nns, radii = run_nns(X, X, k_nn=3)
        assert nns.shape == (100, 3)
        assert not np.any(nns == np.arange(100)[:, None])
        assert radii.min() >= 0


@pytest.fixture()
def feat_h5(tmp_path):
    X, y = blobs(n_per=60, k=3, d=8)
    path = tmp_path / "v4_testds_feat.h5"
    with h5py.File(path, "w") as f:
        f.create_dataset("train", data=X[:150])
        f.create_dataset("val", data=X[150:])
        f.create_dataset("train_labels", data=y[:150])
        f.create_dataset("val_labels", data=y[150:])
        d = f.create_dataset("all_attributes", (1,))
        d.attrs["dataset_name"] = "testds"
        d.attrs["feat_from"] = "dino_vitb16"
        d.attrs["feat_dim"] = 8
        d.attrs["is_grey"] = 0
    json.dump(
        {"name2id": {f"i{i}": i for i in range(180)}},
        open(str(path).replace(".h5", ".json"), "w"),
    )
    return path


class TestClusteringCLI:

    def test_schema_and_filename(self, feat_h5, tmp_path):
        out = clustering(
            str(feat_h5), nns=4, cluster_k=3, niter=8,
            cluster_h5_root=str(tmp_path / "out"),
        )
        assert out.name.startswith("v4_testds_cluster3_iter8minp200_nns4_dino_vitb16_grey0")
        with h5py.File(out) as f:
            assert f["train"].shape == (150,)
            assert f["val"].shape == (30,)
            assert f["centroids"].shape == (3, 8)
            assert f["train_nns"].shape == (150, 4)
            assert f["val_nns_radius"].shape == (30, 4)
            assert f["all_attributes"].attrs["cluster_k"] == 3
            assert f["train"][:].min() >= 0
        # sibling json copied
        assert (out.parent / out.name.replace(".h5", ".json")).exists()


class TestPCAAndEnsemble:
    def test_pca_views(self, feat_h5, tmp_path):
        from sgdm_tpu.selfsup.cluster_pca import clustering_pca

        out = clustering_pca(str(feat_h5), cluster_k=3, niter=5, pca_group=2,
                             cluster_h5_root=str(tmp_path / "pca"))
        with h5py.File(out) as f:
            assert f["train"].shape == (150, 2)
            assert f["train"][:].min() >= 0

    def test_ensemble(self, feat_h5, tmp_path):
        from sgdm_tpu.selfsup.cluster_pca import clustering_ensemble

        out = clustering_ensemble(str(feat_h5), cluster_k=3, niter=5,
                                  ensemble_num=3,
                                  cluster_h5_root=str(tmp_path / "ens"))
        with h5py.File(out) as f:
            assert f["train"].shape == (150, 3)
            assert "emsemble3" in out.name  # reference filename spelling
