"""Downsampled-ImageNet (32/64 px) from Chrabaszcz pickles or the h5 pack.

TPU-native rewrite of `dataset/imagenet_pickle.py:35-260 ImageNet_Pickle`:

  * train = `train_data_batch_1..10` pickles, val = `val_data`, labels
    shifted to 0-based (:84-93); 64 px reads the converted single
    `in64pickle.h5` with `data_{split}`/`labels_{split}` (:96-110),
  * root layout `root/size{32,64}/...` (:118-126),
  * research ablations preserved: `data_ratio` subsample, `corruption`
    (shuffle a fraction of labels among themselves, :165-179), `subgroup`
    (split each class into k pseudo-classes round-robin, :181-192),
  * `debug=1` truncates to 1200 samples (:228-231),
  * emits image NHWC float32 [-1,1], `img4unsup` uint8 HWC, `id`, + the
    condition dict from the h5 lookup.

(`pickle_to_h5` conversion utility included, parity :130-146.)
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from ..utils.logging import logger
from .h5cond import ConditionLookup

__all__ = ["ImageNetPickle"]


def _unpickle(path: str | Path) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


class ImageNetPickle:
    dataset_name = "inp"

    def __init__(
        self,
        root: str,
        train: bool = True,
        image_size: int = 32,
        h5_file: str | None = None,
        condition_method: str | None = None,
        condition: dict | None = None,
        num_classes: int = 1000,
        debug: bool = False,
        data_ratio: float = 1.0,
        corruption: float = 0.0,
        subgroup: int = 1,
        size4cluster: int | None = None,
        **_unused,
    ):
        self.train = train
        self.split_name = "train" if train else "val"
        self.size = image_size
        self.debug = debug
        self.label_num = num_classes
        # imagenet_pickle_v2 semantics: emit img4unsup at the feature-
        # extractor resolution (upsampled; need_to_upsample256 parity)
        self.size4cluster = size4cluster

        root = self._sized_root(root)
        self.data, labels = self._read(root, train)
        self.label_list = np.asarray(labels)

        rng = np.random.default_rng(666)
        # reference parity (imagenet_pickle.py:155-193): the three ablation
        # knobs are an elif chain — mutually exclusive by design.  Make a
        # combined config LOUD instead of silently applying only the first.
        active = [k for k, v in (("data_ratio", data_ratio < 1),
                                 ("corruption", corruption > 0),
                                 ("subgroup", subgroup > 1)) if v]
        assert len(active) <= 1, (
            f"ablation knobs are mutually exclusive (reference elif chain), "
            f"got {active}")
        if data_ratio < 1:
            idx = rng.permutation(len(self.data))[: int(len(self.data) * data_ratio)]
            self.data = self.data[np.sort(idx)]
            self.label_list = self.label_list[np.sort(idx)]
            logger.warning(f"data_ratio={data_ratio}: {len(self.data)} samples")
        elif corruption > 0:
            # shuffle the first `corruption` fraction of labels among
            # themselves (imagenet_pickle.py:165-179)
            assert condition_method == "cluster"
            n = int(len(self.label_list) * corruption)
            shuffled = rng.permutation(n)
            self.label_list = np.array(self.label_list)
            self.label_list[:n] = self.label_list[shuffled]
            logger.warning(f"corrupted {corruption} of labels")
        elif subgroup > 1:
            # round-robin split of each class into `subgroup` pseudo-classes
            # (imagenet_pickle.py:181-192)
            assert condition_method == "label"
            counter = {k: 0 for k in range(num_classes)}

            def sub(label: int) -> int:
                f = counter[label]
                counter[label] = (1 + f) % subgroup
                return label + num_classes * f

            self.label_list = np.array([sub(int(l)) for l in self.label_list])
            self.label_num = num_classes * subgroup
            logger.warning(f"subgroup={subgroup}: label_num={self.label_num}")

        self.cond = ConditionLookup(
            condition_method,
            h5_file,
            self.split_name,
            self.dataset_name,
            label_list=self.label_list,
            num_classes=self.label_num,
            condition_cfg=condition,
            id2name=self.id2name,
        )

    # ------------------------------------------------------------------
    def _sized_root(self, root: str) -> Path:
        root = Path(root).expanduser().resolve()
        if self.size not in (32, 64):
            raise ValueError(self.size)
        return root / f"size{self.size}"

    def _read(self, root: Path, train: bool):
        h5_pack = root / "in64pickle.h5"
        if self.size == 64 and h5_pack.exists():
            import h5py

            f = h5py.File(h5_pack, "r")
            return f[f"data_{self.split_name}"], f[f"labels_{self.split_name}"]
        if train:
            datas, labels = [], []
            for i in range(1, 11):
                d = _unpickle(root / f"train_data_batch_{i}")
                datas.append(d["data"])
                labels.extend(d["labels"])
                if self.debug and self.size == 64:
                    break  # save memory (imagenet_pickle.py:81-82)
            data = np.concatenate(datas, 0)
        else:
            d = _unpickle(root / "val_data")
            data, labels = d["data"], d["labels"]
        labels = np.array([i - 1 for i in labels])  # 0-based
        return data, labels

    @staticmethod
    def pickle_to_h5(root: str, size: int = 64) -> Path:
        """Convert pickles → single h5 pack (imagenet_pickle.py:130-146)."""
        import h5py

        self = ImageNetPickle.__new__(ImageNetPickle)
        self.size = size
        self.debug = False
        self.split_name = "train"
        sized = Path(root).expanduser().resolve() / f"size{size}"
        dest = sized / "in64pickle.h5"
        train_data, train_labels = self._read(sized, True)
        self.split_name = "val"
        val_data, val_labels = self._read(sized, False)
        with h5py.File(dest, "w") as f:
            f.create_dataset("data_train", data=train_data)
            f.create_dataset("labels_train", data=train_labels)
            f.create_dataset("data_val", data=val_data)
            f.create_dataset("labels_val", data=val_labels)
        return dest

    # ------------------------------------------------------------------
    def id2name(self, index: int) -> str:
        return f"{index}.jpg"  # parity: imagenet_pickle.py:112-114

    def __len__(self) -> int:
        if self.debug:
            return min(1200, len(self.data))
        return len(self.data)

    def __getitem__(self, index: int) -> dict:
        img = np.asarray(self.data[index]).reshape(3, self.size, self.size)
        img = img.transpose(1, 2, 0)  # HWC uint8
        img4unsup = img
        if self.size4cluster and self.size4cluster != self.size:
            from PIL import Image

            img4unsup = np.asarray(
                Image.fromarray(img).resize(
                    (self.size4cluster, self.size4cluster), Image.BILINEAR
                )
            )
        out = {
            "image": img.astype(np.float32) / 255.0 * 2.0 - 1.0,
            "img4unsup": img4unsup,
            "id": np.int64(index),
        }
        out.update(self.cond.get(index))
        return out

    def get_batch(self, indices: np.ndarray) -> dict:
        """Batch-level fast path, picked up by `data.loader.DataLoader`:
        ONE native call (native/batchgather.cpp, OpenMP over samples,
        GIL released) for gather + CHW→HWC + normalize + collate —
        bitwise-identical to collating `__getitem__` (the torch-worker-
        pool data plane of the reference, pl_datamodule/dm.py:34).

        Falls back to the per-sample path when the rows aren't an
        in-memory uint8 array (h5-backed) or a per-sample PIL resize is
        configured (size4cluster)."""
        need_resize = self.size4cluster and self.size4cluster != self.size
        if need_resize:
            from .loader import _collate

            return _collate([self[int(i)] for i in indices])
        from ..native import gather_image_batch

        idx = np.asarray(indices, dtype=np.int64)
        if isinstance(self.data, np.ndarray):
            rows, row_idx = self.data, idx
        else:
            # h5-backed (the in64 pack): one bulk read — h5py wants
            # sorted unique indices, so read those and index back
            uniq, inverse = np.unique(idx, return_inverse=True)
            rows, row_idx = self.data[uniq], inverse.astype(np.int64)
        images, img_u8 = gather_image_batch(
            rows, row_idx, self.size, layout="chw")
        out = {"image": images, "img4unsup": img_u8,
               "id": idx.astype(np.int64)}
        conds = [self.cond.get(int(i)) for i in idx]
        if conds and conds[0]:
            for key in conds[0]:
                out[key] = np.stack([np.asarray(c[key]) for c in conds], 0)
        return out
