"""DataModule: config → train/val/test DataLoaders.

TPU-native rewrite of `pl_datamodule/dm.py:34-150 DataModuleFromConfig`:
same semantics — datasets instantiated from `target:`/`params:` sub-configs,
`drop_last=True` everywhere, shuffle train only, per-split batch size — with
the torch-free threaded loader underneath.
"""

from __future__ import annotations

from typing import Any, Mapping

from ..config.engine import instantiate_from_config, to_container
from .loader import DataLoader

__all__ = ["DataModuleFromConfig"]


def _process_shard(batch_size: int) -> "slice | None":
    """On a multi-host run, this process's slice of every global batch
    (per-rank DataLoader parity, SURVEY.md §5.8); None single-host.

    A failure here on an actual multi-process run must be LOUD: silently
    returning None would make every host load the full global batch —
    exactly the duplication this exists to prevent (round-2 VERDICT #4).
    """
    import jax

    try:
        multi = jax.process_count() > 1
    except RuntimeError:
        # backend not initialized yet (e.g. pure-host unit tests) — that is
        # genuinely a single-process situation, not a sharding failure
        return None
    if not multi:
        return None
    from ..parallel.mesh import local_batch_slice

    return local_batch_slice(batch_size)  # raises on misconfiguration


class DataModuleFromConfig:
    def __init__(
        self,
        batch_size: int,
        train: Mapping[str, Any] | None = None,
        validation: Mapping[str, Any] | None = None,
        test: Mapping[str, Any] | None = None,
        num_workers: int | None = None,
        seed: int = 23,
        **_unused: Any,
    ):
        self.batch_size = batch_size
        self.num_workers = num_workers if num_workers is not None else 8
        self.seed = seed
        self._cfgs = {"train": train, "validation": validation, "test": test}
        self.datasets: dict[str, Any] = {}

    def setup(self) -> None:
        for split, cfg in self._cfgs.items():
            if cfg is not None:
                self.datasets[split] = instantiate_from_config(to_container(cfg))

    def _loader(self, split: str, shuffle: bool) -> DataLoader:
        if split not in self.datasets:
            if self._cfgs.get(split) is None:
                # no config for this split: raise WITHOUT re-running
                # setup() (which would re-instantiate every configured
                # dataset — gigabytes of pickle re-reads per epoch when a
                # caller probes a removed split)
                raise KeyError(f"no dataset configured for split {split!r}")
            self.setup()
        return DataLoader(
            self.datasets[split],
            batch_size=self.batch_size,
            shuffle=shuffle,
            drop_last=True,  # parity: dm.py drop_last=True on every split
            num_workers=self.num_workers,
            seed=self.seed,
            shard=_process_shard(self.batch_size),
        )

    def train_dataloader(self) -> DataLoader:
        return self._loader("train", shuffle=True)

    def val_dataloader(self) -> DataLoader:
        return self._loader("validation", shuffle=False)

    def test_dataloader(self) -> DataLoader:
        return self._loader("test", shuffle=False)
