"""Host-side data loading: a torch-free DataLoader with background prefetch.

TPU-native replacement for the reference's torch DataLoader + Lightning
DataModule (`pl_datamodule/dm.py:34-150`): same semantics — shuffle train
only, `drop_last=True` everywhere (dm.py:54-150), per-epoch reseeding — but
implemented as a thread-pool pipeline producing numpy batch dicts, with an
optional device-prefetch wrapper that overlaps host→HBM transfer with
compute (the torch version overlaps via worker processes + pinned memory).

Datasets are any objects with `__len__` and `__getitem__(i) -> dict[str,
np.ndarray]`.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterator, Mapping, Protocol, Sequence

import numpy as np

__all__ = ["MapDataset", "DataLoader", "prefetch_to_device"]


class MapDataset(Protocol):
    def __len__(self) -> int: ...

    def __getitem__(self, index: int) -> Mapping[str, Any]: ...


def _collate(samples: Sequence[Mapping[str, Any]]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        out[key] = np.stack([np.asarray(v) for v in vals], axis=0)
    return out


class DataLoader:
    """Minimal map-style loader: shuffle / batch / drop_last / prefetch."""

    def __init__(
        self,
        dataset: MapDataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = True,
        num_workers: int = 8,
        seed: int = 23,
        collate_fn: Callable | None = None,
        prefetch_batches: int = 4,
        shard: slice | None = None,
    ):
        """``batch_size`` is always the GLOBAL batch size.  On a multi-host
        run each process passes its ``shard`` (from
        `parallel.mesh.local_batch_slice`): the global index order is built
        identically on every host (same seed/epoch), and each host loads and
        collates only its slice — mirroring the reference's per-rank DDP
        DataLoaders (SURVEY.md §5.8).  `__len__` stays the global step count
        so all hosts run in lockstep."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.seed = seed
        self.collate_fn = collate_fn or _collate
        self.prefetch_batches = prefetch_batches
        self.shard = shard
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_batches(self) -> list[np.ndarray]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        nb = len(self)
        batches = [
            idx[i * self.batch_size:(i + 1) * self.batch_size] for i in range(nb)
        ]
        if self.shard is not None:
            batches = [b[self.shard] for b in batches]
        return batches

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        batches = self._index_batches()
        self._epoch += 1
        if not batches:
            return
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        # datasets exposing `get_batch` (e.g. ImageNetPickle's native
        # batchgather path) assemble the whole batch in one call — C++
        # OpenMP over samples with the GIL released — instead of the
        # per-sample Python map+collate
        batch_level = (hasattr(self.dataset, "get_batch")
                       and self.collate_fn is _collate)

        def load_batch(batch_idx: np.ndarray) -> dict[str, np.ndarray]:
            if batch_level:
                return self.dataset.get_batch(batch_idx)
            samples = list(pool.map(self.dataset.__getitem__, batch_idx.tolist()))
            return self.collate_fn(samples)

        def put_or_stop(item) -> bool:
            """Bounded put that aborts when the consumer left: a plain
            q.put() on a full queue would block this thread FOREVER after
            an early consumer break (limit_train_batches / limit_val
            every epoch), pinning prefetched batches in host memory."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer() -> None:
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    if not put_or_stop(load_batch(b)):
                        return
            except BaseException as e:  # surface worker errors to the consumer
                put_or_stop(e)
            finally:
                put_or_stop(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            pool.shutdown(wait=False, cancel_futures=True)


def prefetch_to_device(
    it: Iterator[dict[str, np.ndarray]], size: int = 2, sharding=None
) -> Iterator[Any]:
    """Move batches to device ahead of compute (double-buffering).

    With a `NamedSharding`, batches land sharded over the mesh (the per-rank
    DataLoader shard of the reference's DDP maps to per-device batch shards).
    """
    import jax

    buf: list[Any] = []

    def put(batch):
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    for batch in it:
        buf.append(put(batch))
        if len(buf) >= size:
            yield buf.pop(0)
    while buf:
        yield buf.pop(0)
