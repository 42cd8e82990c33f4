"""Tests: batch ops (slerp etc.), validation layer, papervis, cluster vis,
knn eval."""

import numpy as np
import pytest

from sgdm_tpu.conditioning.validate import assert_check, get_default_config
from sgdm_tpu.utils.batch_ops import (
    batch_interp_condition,
    batch_to_same_firstimage,
    batch_to_samecondition,
    slerp,
    slerp_batch,
)


class TestSlerp:
    def test_endpoints(self):
        a = np.array([1.0, 0.0])
        b = np.array([0.0, 1.0])
        np.testing.assert_allclose(slerp(0.0, a, b), a, atol=1e-7)
        np.testing.assert_allclose(slerp(1.0, a, b), b, atol=1e-7)

    def test_midpoint_on_arc(self):
        a = np.array([1.0, 0.0])
        b = np.array([0.0, 1.0])
        mid = slerp(0.5, a, b)
        np.testing.assert_allclose(np.linalg.norm(mid), 1.0, rtol=1e-6)
        np.testing.assert_allclose(mid[0], mid[1])

    def test_batch_matches_single(self):
        rng = np.random.RandomState(0)
        lo, hi = rng.randn(4, 8), rng.randn(4, 8)
        out = slerp_batch(0.3, lo, hi)
        for i in range(4):
            np.testing.assert_allclose(out[i], slerp(0.3, lo[i], hi[i]), rtol=1e-6)

    def test_parallel_vectors_lerp(self):
        a = np.array([1.0, 0.0])
        np.testing.assert_allclose(slerp(0.5, a, a * 1.0), a, atol=1e-6)


class TestBatchOps:
    def test_same_firstimage(self):
        b = {"x": np.arange(12).reshape(4, 3)}
        out = batch_to_same_firstimage(b)
        for i in range(4):
            np.testing.assert_array_equal(out["x"][i], b["x"][0])

    def test_samecondition_grouping(self):
        b = {"x": np.arange(8)}
        out = batch_to_samecondition(b, samecondition_num=3)
        np.testing.assert_array_equal(out["x"], [0, 0, 0, 1, 1, 1, 2, 2])

    def test_interp_condition_shape(self):
        cond = np.eye(4, dtype=np.float32)[:3]
        out = batch_interp_condition(cond, interp_num=5)
        assert out.shape == (10, 4)
        np.testing.assert_allclose(out[0], cond[0], atol=1e-6)
        np.testing.assert_allclose(out[4], cond[1], atol=1e-6)


class TestAssertCheck:
    def base(self, **kw):
        h = dict(condition_method=None, cond_dim=0, cond_scale=0,
                 cond_drop_prob=1.0, parameterization="eps",
                 data={"h5_file": None}, condition={})
        h.update(kw)
        return h

    def test_unconditional_ok(self):
        assert_check(self.base())

    def test_unconditional_rejects_cond_dim(self):
        with pytest.raises(AssertionError):
            assert_check(self.base(cond_dim=10))

    def test_cluster_requires_h5(self):
        with pytest.raises(AssertionError):
            assert_check(self.base(condition_method="cluster", cond_dim=10,
                                   cond_scale=2, cond_drop_prob=0.1))
        assert_check(self.base(condition_method="cluster", cond_dim=10,
                               cond_scale=2, cond_drop_prob=0.1,
                               data={"h5_file": "x.h5"}))

    def test_feat_requires_name_in_h5(self):
        h = self.base(condition_method="feat", cond_dim=768, cond_scale=2,
                      cond_drop_prob=0.1,
                      condition={"feat": {"feat_from": "dino_vitb16"}},
                      data={"h5_file": "v4_in32p_simclr.h5"})
        with pytest.raises(AssertionError):
            assert_check(h)
        h["data"]["h5_file"] = "v4_in32p_dino_vitb16.h5"
        assert_check(h)

    def test_layout_rejects_h5(self):
        with pytest.raises(AssertionError):
            assert_check(self.base(condition_method="layout", cond_dim=0,
                                   cond_scale=2, cond_drop_prob=0.1,
                                   data={"h5_file": "x.h5"}))

    def test_unknown_method_raises(self):
        with pytest.raises(ValueError):
            assert_check(self.base(condition_method="wat", cond_scale=1,
                                   cond_drop_prob=0.1))


class TestDefaultConfig:
    def test_three_dicts(self):
        h = dict(
            cond_scale=2.0, condition_method="cluster", ddim_eta=0.0,
            log_num_per_prog=10, dtp=1.0,
            data={"fid_train_image_dir": "/tmp/a", "fid_val_image_dir": "/tmp/b",
                  "fid_debug_dir": None, "name": "in64p", "image_size": 64},
            model={"sampling": "native", "num_timesteps": 1000,
                   "clip_denoised": True},
        )
        ck, sk, fk = get_default_config(h)
        assert ck["cond_scale"] == 2.0
        assert sk["sampling_method"] == "native"
        assert sk["temperature"] == 1.0
        assert fk["dataset_name"] == "in64p"
        assert fk["fid_debug_dir"] is None


class TestPapervis:
    def test_draw_grid(self, tmp_path):
        from sgdm_tpu.eval.papervis import draw_grid

        imgs = [np.full((8, 8, 3), i * 30, np.uint8) for i in range(6)]
        p = draw_grid(imgs, tmp_path / "g.png", ncol=3)
        assert p.exists()

    def test_overlay_mask_and_bbox(self):
        from sgdm_tpu.eval.papervis import overlay_bbox, overlay_mask

        img = np.zeros((16, 16, 3), np.uint8)
        mask = np.zeros((16, 16), np.int64)
        mask[4:, :] = 3
        out = overlay_mask(img, mask)
        assert out.shape == img.shape
        assert not np.array_equal(out[0, 0], out[8, 8])
        boxed = overlay_bbox(img, np.array([2, 2, 10, 10]))
        assert boxed[2, 5].tolist() == [255, 0, 0]

    def test_chain_grid(self, tmp_path):
        from sgdm_tpu.eval.papervis import draw_chain_grid

        chain = np.zeros((5, 2, 8, 8, 3), np.uint8)
        p = draw_chain_grid(chain, tmp_path / "c.png")
        assert p.exists()


class TestClusterVis:
    def test_kmeans_vis_collects(self):
        from sgdm_tpu.conditioning.clustering_vis import kmeans_vis

        def loader():
            for _ in range(3):
                yield {
                    "image": np.zeros((8, 4, 4, 3), np.float32),
                    "cluster_id": np.arange(8) % 4,
                }

        out = kmeans_vis(loader(), np.array([0, 1]), per_cluster=3)
        assert len(out[0]) == 3 and len(out[1]) == 3

    def test_statistics(self):
        from sgdm_tpu.conditioning.clustering_vis import vis_cluster_statistics

        def loader():
            yield {
                "cluster_id": np.array([0, 0, 1, 1]),
                "label_id": np.array([5, 5, 9, 9]),
            }

        m = vis_cluster_statistics(loader())
        assert m["nmi"] == pytest.approx(1.0)


class TestCondscaleSweep:
    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_per_sample_weights_one_call(self):
        # exercise the per-sample guidance-weight path end to end
        import jax
        import jax.numpy as jnp

        from sgdm_tpu.diffusion import GaussianDiffusion, make_guided_denoiser
        from sgdm_tpu.models import UNetModel
        from sgdm_tpu.training.optim import create_optimizer
        from sgdm_tpu.training.state import create_train_state, make_sample_fn

        model = UNetModel(model_channels=16, out_channels=1, num_res_blocks=1,
                          channel_mult=(1, 2), attention_resolutions=(2,),
                          num_heads=2, resblock_updown=True, cond_dim=4)
        diff = GaussianDiffusion(num_timesteps=50)
        tx = create_optimizer("adamw", lr=1e-3, scheduler=None)
        batch = {"image": jnp.zeros((3, 8, 8, 1)), "cond": jnp.zeros((3, 4))}
        state = create_train_state(model, tx, jax.random.PRNGKey(0), batch,
                                   {"cond": batch["cond"]})
        w = jnp.array([0.0, 1.0, 4.0])  # per-sample guidance weights
        sample = make_sample_fn(model, diff, sampling_method="ddim",
                                num_steps=4, cond_scale=w)
        imgs, _ = sample(state.ema_params, jax.random.PRNGKey(1), 3, 8, 1,
                         cond=jnp.eye(4)[:3])
        assert imgs.shape == (3, 8, 8, 1)
