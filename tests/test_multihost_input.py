"""Multi-host input pipeline: per-process batch sharding.

Each process must load only its slice of every global batch (the reference's
per-rank DDP DataLoaders, SURVEY.md §5.8).  Simulated here with explicit
process_index/process_count since tests run single-process.
"""

from __future__ import annotations

import numpy as np

from sgdm_tpu.data.loader import DataLoader
from sgdm_tpu.parallel.mesh import local_batch_slice


class IdsDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"id": np.asarray(i), "image": np.full((2, 2, 1), i, np.float32)}


def test_local_batch_slice_arithmetic():
    assert local_batch_slice(64, process_index=0, process_count=4) == slice(0, 16)
    assert local_batch_slice(64, process_index=3, process_count=4) == slice(48, 64)
    assert local_batch_slice(64, process_index=0, process_count=1) == slice(0, 64)


def test_sharded_loaders_partition_the_global_batch():
    ds = IdsDataset(40)
    global_dl = DataLoader(ds, batch_size=8, shuffle=True, seed=7, num_workers=2)
    shard_dls = [
        DataLoader(
            ds, batch_size=8, shuffle=True, seed=7, num_workers=2,
            shard=local_batch_slice(8, process_index=i, process_count=2),
        )
        for i in range(2)
    ]
    # lockstep: every host sees the same number of steps (the GLOBAL count)
    assert len(global_dl) == len(shard_dls[0]) == len(shard_dls[1]) == 5

    g_batches = list(global_dl)
    s_batches = [list(dl) for dl in shard_dls]
    for step in range(5):
        ids_g = g_batches[step]["id"]
        ids_0 = s_batches[0][step]["id"]
        ids_1 = s_batches[1][step]["id"]
        assert ids_0.shape == ids_1.shape == (4,)
        # shards are disjoint and concatenate to the global batch, in order
        np.testing.assert_array_equal(np.concatenate([ids_0, ids_1]), ids_g)
        assert not set(ids_0.tolist()) & set(ids_1.tolist())


def test_epoch_reshuffle_consistent_across_shards():
    ds = IdsDataset(16)
    mk = lambda i: DataLoader(
        ds, batch_size=8, shuffle=True, seed=3, num_workers=1,
        shard=local_batch_slice(8, process_index=i, process_count=2),
    )
    a, b = mk(0), mk(1)
    for epoch in range(2):
        a.set_epoch(epoch)
        b.set_epoch(epoch)
        for ba, bb in zip(a, b):
            assert not set(ba["id"].tolist()) & set(bb["id"].tolist())
