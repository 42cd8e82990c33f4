"""Eval-stack tests: inception shapes, metric math, FID engine plumbing."""

import numpy as np
import pytest

from sgdm_tpu.eval.metrics import (
    FeatureStats,
    compute_prdc,
    frechet_distance,
    inception_score,
)


class TestFeatureStats:
    def test_matches_numpy_cov(self):
        rng = np.random.RandomState(0)
        x = rng.randn(500, 16)
        st = FeatureStats()
        for i in range(0, 500, 64):
            st.append(x[i:i + 64])
        mu, cov = st.mean_cov()
        np.testing.assert_allclose(mu, x.mean(0), atol=1e-10)
        np.testing.assert_allclose(cov, np.cov(x, rowvar=False), atol=1e-8)

    def test_max_items(self):
        st = FeatureStats(max_items=10)
        st.append(np.ones((8, 4)))
        st.append(np.ones((8, 4)))
        assert st.n == 10

    def test_capture_all(self):
        st = FeatureStats(capture_all=True)
        st.append(np.ones((4, 2)))
        st.append(np.zeros((3, 2)))
        assert st.raw.shape == (7, 2)


class TestFrechet:
    def test_identical_is_zero(self):
        rng = np.random.RandomState(1)
        x = rng.randn(1000, 8)
        mu, cov = x.mean(0), np.cov(x, rowvar=False)
        assert frechet_distance(mu, cov, mu, cov) < 1e-8

    def test_univariate_closed_form(self):
        # FID between N(m1, s1²) and N(m2, s2²) = (m1-m2)² + (s1-s2)²
        d = frechet_distance(
            np.array([0.0]), np.array([[4.0]]),
            np.array([3.0]), np.array([[1.0]]),
        )
        assert d == pytest.approx(9 + (2 - 1) ** 2, rel=1e-6)

    def test_symmetry(self):
        rng = np.random.RandomState(2)
        a, b = rng.randn(300, 5), rng.randn(300, 5) + 1
        ma, ca = a.mean(0), np.cov(a, rowvar=False)
        mb, cb = b.mean(0), np.cov(b, rowvar=False)
        assert frechet_distance(ma, ca, mb, cb) == pytest.approx(
            frechet_distance(mb, cb, ma, ca), rel=1e-6
        )


class TestIS:
    def test_uniform_logits_score_one(self):
        logits = np.zeros((100, 10))
        m, s = inception_score(logits, splits=1)
        assert m == pytest.approx(1.0, abs=1e-6)

    def test_confident_diverse_high(self):
        # each sample fully confident, classes uniformly covered → IS = K
        logits = np.eye(10)[np.arange(100) % 10] * 50
        m, _ = inception_score(logits, splits=1)
        assert m == pytest.approx(10.0, rel=1e-3)


class TestPRDC:
    def test_identical_sets(self):
        rng = np.random.RandomState(3)
        x = rng.randn(64, 4)
        out = compute_prdc(x, x, nearest_k=5)
        assert out["precision"] == 1.0
        assert out["recall"] == 1.0
        assert out["coverage"] == 1.0

    def test_disjoint_sets(self):
        a = np.zeros((32, 4))
        b = np.ones((32, 4)) * 100
        out = compute_prdc(a + np.random.RandomState(0).randn(32, 4) * 0.01,
                           b, nearest_k=3)
        assert out["precision"] == 0.0
        assert out["recall"] == 0.0
        assert out["coverage"] == 0.0


class TestInception:
    @pytest.fixture(scope="class")
    def net(self):
        import jax
        import jax.numpy as jnp

        from sgdm_tpu.eval.inception import FIDInceptionV3

        model = FIDInceptionV3()
        x = jnp.zeros((1, 299, 299, 3))
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        return model, params

    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_output_shapes(self, net):
        import jax.numpy as jnp

        model, params = net
        out = model.apply({"params": params}, jnp.zeros((2, 299, 299, 3)))
        assert out["pool3"].shape == (2, 2048)
        assert out["logits"].shape == (2, 1008)
        assert out["spatial"].shape == (2, 7 * 17 * 17)

    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_param_structure_matches_torch_names(self, net):
        _, params = net
        # spot-check the torch-mechanical naming needed by load_torch_weights
        assert "Conv2d_1a_3x3" in params
        assert "branch7x7dbl_5" in params["Mixed_6b"]
        assert "fc" in params
        assert params["Mixed_5b"]["branch_pool"]["conv"]["kernel"].shape[-1] == 32


class TestFIDEngine:
    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_identical_folders_near_zero_fid(self, tmp_path):
        from PIL import Image

        from sgdm_tpu.eval.fid_engine import InceptionExtractor, get_fid_dict

        rng = np.random.RandomState(0)
        d1 = tmp_path / "a"
        d1.mkdir()
        for i in range(8):
            Image.fromarray(
                rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
            ).save(d1 / f"img{i}.png")
        ex = InceptionExtractor(batch_size=4)
        out, fid = get_fid_dict(d1, d1, ex, debug=True, prdc_subsample=8,
                                nearest_k=2)
        assert fid < 1e-3
        assert out["sfid"] < 1e-2
        assert out["precision"] == 1.0

    def test_sample_to_dir_counts(self, tmp_path):
        from sgdm_tpu.eval.fid_engine import sample_to_dir

        def fake_sampler(batch, seed):
            b = batch["image"].shape[0]
            return np.zeros((b, 8, 8, 3), dtype=np.uint8)

        loader = [{"image": np.zeros((4, 8, 8, 3), dtype=np.float32)}] * 2
        out = sample_to_dir(fake_sampler, loader, 10, tmp_path / "s")
        assert len(list(out.glob("img*.png"))) == 10


class TestSegMetricsOverclustered:
    def test_unmatched_clusters_map_to_argmax_not_zero(self):
        """n_clusters > n_classes: clusters the Hungarian matching leaves
        out must map to their confusion-row argmax, not default to 0."""
        from sgdm_tpu.eval.seg_metrics import unsupervised_seg_metrics

        # 4 clusters over 2 classes; clusters 2,3 are pure class-1
        preds = np.array([0, 0, 1, 1, 2, 2, 3, 3])
        gts = np.array([0, 0, 1, 1, 1, 1, 1, 1])
        m = unsupervised_seg_metrics(preds, gts, n_clusters=4, n_classes=2)
        # a zeros-default mapping would call clusters 2/3 "class 0":
        # acc 4/8; argmax mapping gets everything right
        assert m["pixel_acc"] == 1.0
        assert m["miou"] == 1.0


class TestSampleDirHygiene:
    def test_sample_to_dir_clears_stale_pngs(self, tmp_path):
        """Dirs are reused across runs (same log_dir, smaller re-run); the
        FID reader globs every file present, so leftovers from a larger
        previous run must be removed before writing."""
        from PIL import Image

        from sgdm_tpu.eval.fid_engine import sample_to_dir

        d = tmp_path / "samples"
        d.mkdir()
        for i in range(10):  # a previous, larger run
            Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(
                d / f"img{i}.png")

        def fake_sample(batch, seed):
            return np.full((2, 4, 4, 3), 255, np.uint8)

        loader = [{"image": np.zeros((2, 4, 4, 3), np.float32)}]
        sample_to_dir(fake_sample, loader, fid_num=4, sample_dir=d)
        files = sorted(p.name for p in d.glob("*.png"))
        assert files == ["img0.png", "img1.png", "img2.png", "img3.png"]

    @pytest.mark.slow  # builds the inception net (compile-bound)
    def test_features_from_dir_cache(self, tmp_path):
        from PIL import Image

        from sgdm_tpu.eval.fid_engine import InceptionExtractor

        d = tmp_path / "gt"
        d.mkdir()
        rng = np.random.RandomState(0)
        for i in range(3):
            Image.fromarray(
                rng.randint(0, 255, (8, 8, 3)).astype(np.uint8)
            ).save(d / f"img{i}.png")
        ext = InceptionExtractor(batch_size=2)
        a = ext.features_from_dir(d, mode="bilinear", cache=True)
        b = ext.features_from_dir(d, mode="bilinear", cache=True)
        assert a is b  # cache hit: identical object, no recompute
        # touching the dir invalidates the fingerprint
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(d / "img3.png")
        c = ext.features_from_dir(d, mode="bilinear", cache=True)
        assert c is not b and len(c["pool3"]) == 4
        # uncached calls never populate or read the cache
        e = ext.features_from_dir(d, mode="bilinear")
        assert e is not c
