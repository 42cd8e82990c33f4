"""Native batch-assembly engine (native/batchgather.cpp): bitwise parity
with the Python per-sample path, and the DataLoader batch-level wiring.

The reference's data plane runs on the torch DataLoader's C++ worker
pool (pl_datamodule/dm.py:34); this is the TPU rebuild's native
equivalent, so the contract is EXACT equality, not approximate."""

import numpy as np
import pytest
from PIL import Image

from sgdm_tpu.data.imagenet_downsample import pack_train_folder
from sgdm_tpu.data.imagenet_pickle import ImageNetPickle
from sgdm_tpu.data.loader import DataLoader, _collate
from sgdm_tpu.native import gather_image_batch, gather_rows


class TestGatherPrimitives:
    def test_chw_gather_bitwise(self):
        rng = np.random.default_rng(0)
        n, s = 50, 16
        data = rng.integers(0, 256, (n, 3 * s * s), dtype=np.uint8)
        idx = rng.integers(0, n, 13)
        imgs, u8 = gather_image_batch(data, idx, s, layout="chw")
        ref_u8 = np.stack(
            [data[i].reshape(3, s, s).transpose(1, 2, 0) for i in idx])
        ref = ref_u8.astype(np.float32) / 255.0 * 2.0 - 1.0
        assert np.array_equal(imgs, ref)       # bitwise, not allclose
        assert np.array_equal(u8, ref_u8)

    def test_hwc_gather_bitwise(self):
        rng = np.random.default_rng(1)
        n, s = 20, 8
        data = rng.integers(0, 256, (n, s, s, 3), dtype=np.uint8)
        idx = np.arange(n)[::-2]
        imgs, u8 = gather_image_batch(data, idx, s, layout="hwc")
        ref = data[idx].astype(np.float32) / 255.0 * 2.0 - 1.0
        assert np.array_equal(imgs, ref)
        assert np.array_equal(u8, data[idx])

    def test_row_gather(self):
        rng = np.random.default_rng(2)
        rows = rng.standard_normal((30, 5)).astype(np.float32)
        idx = rng.integers(0, 30, 11)
        assert np.array_equal(gather_rows(rows, idx), rows[idx])


@pytest.fixture
def pickle_ds(tmp_path):
    tree = tmp_path / "tree"
    rng = np.random.default_rng(3)
    for c in range(2):
        d = tree / f"class_{c}"
        d.mkdir(parents=True)
        for i in range(8):
            Image.fromarray(
                rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
            ).save(d / f"{i}.png")
    pack_train_folder(tree, tmp_path / "pickles" / "size32", size=32,
                      num_batches=10, seed=0)
    return ImageNetPickle(root=str(tmp_path / "pickles"), train=True,
                          image_size=32, num_classes=2,
                          condition_method="label")


class TestDatasetBatchPath:
    def test_get_batch_matches_per_sample(self, pickle_ds):
        idx = np.asarray([3, 0, 7, 7, 12])
        native = pickle_ds.get_batch(idx)
        ref = _collate([pickle_ds[int(i)] for i in idx])
        assert set(native) == set(ref)
        for k in ref:
            assert np.array_equal(np.asarray(native[k]),
                                  np.asarray(ref[k])), k

    def test_get_batch_h5_backed(self, pickle_ds, tmp_path):
        """The in64-style h5 pack path: bulk sorted-unique h5 read +
        native transform must equal per-sample (duplicates included)."""
        h5py = pytest.importorskip("h5py")
        root = tmp_path / "h5root" / "size64"
        root.mkdir(parents=True)
        # build a fake 'in64pickle.h5' at size 32 data: reuse rows
        rng = np.random.default_rng(9)
        data = rng.integers(0, 256, (30, 3 * 64 * 64), dtype=np.uint8)
        labels = rng.integers(0, 2, 30)
        with h5py.File(root / "in64pickle.h5", "w") as f:
            f.create_dataset("data_train", data=data)
            f.create_dataset("labels_train", data=labels)  # packs are 0-based
        ds = ImageNetPickle(root=str(tmp_path / "h5root"), train=True,
                            image_size=64, num_classes=2,
                            condition_method="label")
        assert not isinstance(ds.data, np.ndarray)
        idx = np.asarray([5, 2, 5, 17, 0, 2])   # duplicates on purpose
        native = ds.get_batch(idx)
        ref = _collate([ds[int(i)] for i in idx])
        for k in ref:
            assert np.array_equal(np.asarray(native[k]),
                                  np.asarray(ref[k])), k

    def test_loader_uses_batch_level_and_matches(self, pickle_ds):
        a = list(DataLoader(pickle_ds, batch_size=4, shuffle=True,
                            seed=5, num_workers=2))
        # same loader semantics through the per-sample path

        class NoBatch:
            def __init__(self, ds):
                self._ds = ds

            def __len__(self):
                return len(self._ds)

            def __getitem__(self, i):
                return self._ds[i]

        b = list(DataLoader(NoBatch(pickle_ds), batch_size=4, shuffle=True,
                            seed=5, num_workers=2))
        assert len(a) == len(b) > 0
        for ba, bb in zip(a, b):
            for k in bb:
                assert np.array_equal(np.asarray(ba[k]),
                                      np.asarray(bb[k])), k

    def test_multihost_shard_slices_batch(self, pickle_ds):
        full = list(DataLoader(pickle_ds, batch_size=4, shuffle=False,
                               num_workers=1))
        half = list(DataLoader(pickle_ds, batch_size=4, shuffle=False,
                               num_workers=1, shard=slice(0, 2)))
        for f, h in zip(full, half):
            assert np.array_equal(np.asarray(h["image"]),
                                  np.asarray(f["image"])[:2])
