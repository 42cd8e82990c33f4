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
