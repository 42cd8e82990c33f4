"""Tests for the complex (segmentation) data path: transforms, VOC layout,
LOST masks, STEGO mask attachment, and CRF."""

import numpy as np
import pytest
from PIL import Image

from sgdm_tpu.data.transforms import (
    RandomScaleCrop,
    bbox_to_mask,
    mask_to_attr_nhot,
    segmask_to_onehot,
)


class TestTransforms:
    def test_random_scale_crop_shapes(self):
        import random

        t = RandomScaleCrop(base_size=64, resize_size=32, rng=random.Random(0))
        img = Image.fromarray(np.zeros((100, 140, 3), np.uint8))
        mask = Image.fromarray(np.zeros((100, 140), np.uint8))
        out_img, out_mask, out_bb, out_st = t(img, mask)
        assert out_img.shape == (32, 32, 3)
        assert out_mask.shape == (32, 32)
        assert out_bb is None and out_st is None

    def test_mask_values_preserved_nearest(self):
        import random

        t = RandomScaleCrop(base_size=64, resize_size=32, rng=random.Random(1))
        img = Image.fromarray(np.zeros((80, 80, 3), np.uint8))
        m = np.zeros((80, 80), np.uint8)
        m[:40] = 7
        _, out_mask, _, _ = t(img, Image.fromarray(m))
        assert set(np.unique(out_mask)) <= {0, 7}

    def test_segmask_onehot_255_is_bg(self):
        m = np.array([[255, 1], [2, 0]], np.uint8)
        oh = segmask_to_onehot(m, 3)
        assert oh.shape == (2, 2, 3)
        assert oh[0, 0, 0] == 1.0  # 255 → bg
        assert oh[0, 1, 1] == 1.0

    def test_fine_to_coarse(self):
        m = np.array([[10, 20]], np.uint8)
        oh = segmask_to_onehot(m, 3, fine_to_coarse={10: 1, 20: 2, 0: 0})
        assert oh[0, 0, 1] == 1.0 and oh[0, 1, 2] == 1.0

    def test_attr_nhot(self):
        m = np.array([[0, 5], [5, 255]], np.uint8)
        nhot = mask_to_attr_nhot(m, 8)
        assert nhot[0] == 1.0 and nhot[5] == 1.0 and nhot.sum() == 2.0

    def test_bbox_mask(self):
        m = bbox_to_mask((10, 10), np.array([2, 3, 5, 7]))
        assert m.sum() == (5 - 2) * (7 - 3)
        assert m[3, 2] == 1 and m[0, 0] == 0


@pytest.fixture()
def voc_root(tmp_path):
    """Minimal VOC-layout fixture."""
    rng = np.random.RandomState(0)
    (tmp_path / "JPEGImages").mkdir()
    (tmp_path / "SegmentationClassAug").mkdir()
    (tmp_path / "ImageSets" / "Segmentation").mkdir(parents=True)
    names = []
    for i in range(4):
        name = f"2007_{i:06d}"
        names.append(name)
        Image.fromarray(
            rng.randint(0, 255, (90, 120, 3), dtype=np.uint8)
        ).save(tmp_path / "JPEGImages" / f"{name}.jpg")
        m = np.zeros((90, 120), np.uint8)
        m[20:60, 30:80] = (i % 20) + 1
        Image.fromarray(m).save(tmp_path / "SegmentationClassAug" / f"{name}.png")
    (tmp_path / "ImageSets" / "Segmentation" / "train_aug.txt").write_text(
        "\n".join(names)
    )
    return tmp_path


class TestVOC:
    def test_oracle_layout_sample(self, voc_root):
        from sgdm_tpu.data.voc12 import VOCSegmentation

        ds = VOCSegmentation(
            root=str(voc_root), split="train_aug", image_size=32, base_size=64,
            size4cluster=48, condition_method="layout",
            condition={"layout": {"how": "oracle", "layout_dim": 21}},
        )
        assert len(ds) == 4
        s = ds[0]
        assert s["image"].shape == (32, 32, 3)
        assert s["segmask"].shape == (32, 32, 21)
        assert s["attr"].shape == (21,)
        assert s["img4unsup"].shape == (48, 48, 3)
        assert -1.0 <= s["image"].min() and s["image"].max() <= 1.0
        # segmask is a valid one-hot
        np.testing.assert_allclose(s["segmask"].sum(-1), 1.0)

    def test_stego_layout_sample(self, voc_root, tmp_path):
        from sgdm_tpu.data.voc12 import VOCSegmentation

        stego_dir = tmp_path / "stego"
        stego_dir.mkdir()
        for i in range(4):
            m = np.full((90, 120), i % 5, np.uint8)
            Image.fromarray(m).save(stego_dir / f"2007_{i:06d}.png")
        ds = VOCSegmentation(
            root=str(voc_root), split="train_aug", image_size=32, base_size=64,
            condition_method="stegoclusterlayout", stego_dir=str(stego_dir),
            stego_k=5,
            condition={"stegoclusterlayout": {"how": "stego", "stego_k": 5}},
        )
        s = ds[1]
        assert s["stegomask"].shape == (32, 32, 5)
        assert s["stego_attr"].shape == (5,)
        assert s["stego_attr"].sum() >= 1

    def test_lost_layout_sample(self, voc_root, tmp_path):
        import h5py

        from sgdm_tpu.data.voc12 import VOCSegmentation

        lost_file = tmp_path / "lost_k100.h5"
        with h5py.File(lost_file, "w") as f:
            f.attrs["cluster_k"] = 100
            for i in range(4):
                f.create_dataset(
                    f"2007_{i:06d}.jpg_bbox", data=np.array([10, 10, 60, 50])
                )
                f.create_dataset(f"2007_{i:06d}.jpg_clusterid", data=np.int64(3))
        ds = VOCSegmentation(
            root=str(voc_root), split="train_aug", image_size=32, base_size=64,
            condition_method="layout", lost_file=str(lost_file),
            condition={"layout": {"how": "lost", "layout_dim": 1}},
        )
        s = ds[0]
        assert s["lostbboxmask"].shape == (32, 32, 1)
        assert 0 < s["lostbboxmask"].sum() < 32 * 32


class TestLostAlgorithm:
    def test_finds_distinct_object(self):
        from sgdm_tpu.selfsup.lost import lost

        # patch features: an 8x8 grid where a 3x3 block is one cluster and
        # the background another (background is larger → higher degree →
        # the object has the LOWEST degree and is picked as seed)
        rng = np.random.RandomState(0)
        fg_dir = np.array([1.0, 0.0]) + 0
        bg_dir = np.array([0.0, 1.0])
        feats = np.tile(bg_dir, (64, 1)) + 0.01 * rng.randn(64, 2)
        grid = np.arange(64).reshape(8, 8)
        obj = grid[2:5, 2:5].ravel()
        feats[obj] = fg_dir + 0.01 * rng.randn(9, 2)
        # make cross-cluster similarity negative
        feats = feats - feats.mean(0)
        pred, mask_map, scores, seed = lost(
            feats, dims=(8, 8), scales=[16, 16], init_image_size=(128, 128)
        )
        assert seed in obj
        ys, xs = np.where(mask_map)
        assert set(grid[ys, xs].ravel()) == set(obj)
        np.testing.assert_array_equal(pred, [32, 32, 80, 80])


class TestStego:
    @pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
    def test_predict_mask_shapes(self):
        from sgdm_tpu.selfsup.stego import StegoInference

        st = StegoInference(n_classes=6, dim=16, arch="vit_small",
                            patch_size=8)
        img = np.random.RandomState(0).randint(0, 255, (64, 64, 3), np.uint8)
        mask = st.predict_mask(img, use_crf=True)
        assert mask.shape == (64, 64)
        assert mask.max() < 6

    def test_mask_dir_generation(self, tmp_path):
        from sgdm_tpu.selfsup.stego import StegoInference

        st = StegoInference(n_classes=4, dim=8, arch="vit_small", patch_size=8)
        imgs = [
            (f"im{i}.jpg",
             np.random.RandomState(i).randint(0, 255, (32, 32, 3), np.uint8))
            for i in range(2)
        ]
        out = st.generate_mask_dir(imgs, tmp_path / "stego")
        assert sorted(p.name for p in out.iterdir()) == ["im0.png", "im1.png"]


class TestSideRepoMetrics:
    def test_corloc(self):
        from sgdm_tpu.selfsup.lost import bbox_iou, corloc

        assert bbox_iou(np.array([0, 0, 10, 10]), np.array([0, 0, 10, 10])) == 1.0
        assert bbox_iou(np.array([0, 0, 10, 10]), np.array([20, 20, 30, 30])) == 0.0
        preds = np.array([[0, 0, 10, 10], [0, 0, 10, 10]])
        gts = [[np.array([1, 1, 9, 9])], [np.array([50, 50, 60, 60])]]
        assert corloc(preds, gts) == 0.5

    def test_unsupervised_miou_perfect_permutation(self):
        from sgdm_tpu.eval.seg_metrics import unsupervised_seg_metrics

        gts = np.random.RandomState(0).randint(0, 3, (64, 64))
        perm = np.array([2, 0, 1])
        preds = perm[gts]  # clusters are a relabeling of classes
        out = unsupervised_seg_metrics(preds, gts, n_clusters=3, n_classes=3)
        assert out["miou"] == 1.0
        assert out["pixel_acc"] == 1.0

    def test_ignore_label(self):
        from sgdm_tpu.eval.seg_metrics import unsupervised_seg_metrics

        gts = np.array([[0, 255], [1, 255]])
        preds = np.array([[0, 1], [1, 0]])
        out = unsupervised_seg_metrics(preds, gts, 2, 2)
        assert out["pixel_acc"] == 1.0
