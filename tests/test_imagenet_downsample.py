"""ImageNet downsampling scripts: image tree → pickles → ImageNetPickle
round trip."""

from __future__ import annotations

import numpy as np
from PIL import Image

from sgdm_tpu.data.imagenet_downsample import (
    pack_train_folder,
    pack_val_folder,
    planar_to_hwc,
    resize_image_folder,
)


def _make_tree(root, n_classes=2, per_class=12, size=48):
    rng = np.random.default_rng(0)
    for c in range(n_classes):
        d = root / f"class_{c:02d}"
        d.mkdir(parents=True)
        for i in range(per_class):
            arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img{i:03d}.jpg")


def test_resize_folder(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.default_rng(1)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (64, 48, 3), dtype=np.uint8)).save(
            src / f"a{i}.jpg")
    n = resize_image_folder(src, tmp_path / "out", 32, alg="box")
    assert n == 3
    im = Image.open(tmp_path / "out" / "a0.png")
    assert im.size == (32, 32) and im.mode == "RGB"


def test_pack_and_read_roundtrip(tmp_path):
    import pickle

    from sgdm_tpu.data.imagenet_pickle import ImageNetPickle

    tree = tmp_path / "train_tree"
    _make_tree(tree, n_classes=2, per_class=10)
    out = tmp_path / "pickles" / "size32"
    pack_train_folder(tree, out, size=32, num_batches=10, seed=0)
    # val: flat folder
    val_src = tmp_path / "valsrc"
    val_src.mkdir()
    rng = np.random.default_rng(2)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(
            val_src / f"v{i}.png")
    (tmp_path / "gt.txt").write_text("1\n2\n1\n2\n")
    pack_val_folder(val_src, out, size=32, ground_truth=tmp_path / "gt.txt")

    # pickle format invariants
    d1 = pickle.load(open(out / "train_data_batch_1", "rb"))
    assert d1["data"].dtype == np.uint8 and d1["data"].shape[1] == 3 * 32 * 32
    assert min(d1["labels"]) >= 1  # 1-based like the originals
    assert d1["mean"].shape == (3 * 32 * 32,)
    img = planar_to_hwc(d1["data"][0], 32)
    assert img.shape == (32, 32, 3)

    # the reader consumes it directly
    ds = ImageNetPickle(root=str(tmp_path / "pickles"), train=True,
                        image_size=32, num_classes=2)
    assert len(ds) == 20
    sample = ds[0]
    assert sample["image"].shape == (32, 32, 3)
    assert sample["image"].min() >= -1.0 and sample["image"].max() <= 1.0
    assert set(np.unique(ds.label_list)) <= {0, 1}  # shifted to 0-based

    val = ImageNetPickle(root=str(tmp_path / "pickles"), train=False,
                         image_size=32, num_classes=2)
    assert len(val) == 4
