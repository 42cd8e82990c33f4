"""Tests for the torch-free DataLoader and synthetic dataset."""

import numpy as np
import pytest

from sgdm_tpu.data.loader import DataLoader
from sgdm_tpu.data.synthetic import SyntheticImages


class TestSynthetic:
    def test_contract(self):
        ds = SyntheticImages(size=16, num_classes=4, length=20)
        s = ds[0]
        assert s["image"].shape == (16, 16, 3)
        assert s["image"].dtype == np.float32
        assert s["image"].min() >= -1.0 and s["image"].max() <= 1.0
        assert s["label"].shape == (4,)
        assert s["label"].sum() == 1.0
        assert s["img4unsup"].dtype == np.uint8

    def test_deterministic(self):
        ds = SyntheticImages(size=16, length=8)
        np.testing.assert_array_equal(ds[3]["image"], ds[3]["image"])

    def test_class_signal(self):
        ds = SyntheticImages(size=16, num_classes=4, length=8)
        a, b = ds[0]["image"], ds[1]["image"]  # different classes
        assert np.abs(a - b).mean() > 0.05


class TestDataLoader:
    def test_batching_drop_last(self):
        ds = SyntheticImages(size=8, length=10)
        dl = DataLoader(ds, batch_size=4, shuffle=False, drop_last=True)
        batches = list(dl)
        assert len(batches) == 2  # 10 // 4
        assert batches[0]["image"].shape == (4, 8, 8, 3)

    def test_no_drop_last(self):
        ds = SyntheticImages(size=8, length=10)
        dl = DataLoader(ds, batch_size=4, shuffle=False, drop_last=False)
        assert len(list(dl)) == 3

    def test_shuffle_reseeds_per_epoch(self):
        ds = SyntheticImages(size=8, length=32)
        dl = DataLoader(ds, batch_size=8, shuffle=True, seed=1)
        e1 = np.concatenate([b["id"] for b in dl])
        e2 = np.concatenate([b["id"] for b in dl])
        assert not np.array_equal(e1, e2)
        assert set(e1) == set(range(32))

    def test_shuffle_deterministic_given_seed(self):
        ds = SyntheticImages(size=8, length=32)
        a = np.concatenate([b["id"] for b in DataLoader(ds, 8, shuffle=True, seed=5)])
        b = np.concatenate([b["id"] for b in DataLoader(ds, 8, shuffle=True, seed=5)])
        np.testing.assert_array_equal(a, b)

    def test_worker_error_propagates(self):
        class Bad:
            def __len__(self):
                return 8

            def __getitem__(self, i):
                raise RuntimeError("boom")

        dl = DataLoader(Bad(), batch_size=4)
        with pytest.raises(RuntimeError, match="boom"):
            list(dl)


class TestEarlyBreak:
    def test_producer_exits_after_consumer_break(self):
        """Breaking out of iteration mid-epoch (limit_train_batches) must
        release the producer thread — a blocking q.put would leak one
        thread + prefetched batches per abandoned epoch."""
        import threading
        import time

        from sgdm_tpu.data.synthetic import SyntheticImages

        ds = SyntheticImages(size=8, length=64)
        dl = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2)
        before = threading.active_count()
        for _ in range(6):  # abandoned iterations
            for i, batch in enumerate(dl):
                if i >= 1:
                    break
        deadline = time.time() + 5.0
        while threading.active_count() > before + 1 and time.time() < deadline:
            time.sleep(0.1)
        # producers must have exited (allow 1 lingering pool janitor)
        assert threading.active_count() <= before + 1, (
            threading.active_count(), before)
