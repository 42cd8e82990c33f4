"""Feature-extraction CLI: dataset → feat h5 (reference-compatible).

TPU-native rewrite of `clustering/feat_extractor.py` +
`clustering/utils/feat_nospatial.py:195-316 extract_feat`:

  * CLI: `python -m sgdm_tpu.selfsup.feat_extractor --feat dino_vitb16
    --ds in32p --bs 32 --image_size 32`,
  * iterates train+val loaders, `transform_batch` (resize 224 +
    imagenet-norm), `batch_encode_feat` (CLS token), writes the feat-h5
    contract (SURVEY.md §2.7): datasets `train` [N, feat_dim] f32 / `val`,
    `train_labels`/`val_labels` when the dataset has labels, attrs
    {dataset_name, feat_from, feat_dim, version, is_grey} on
    `all_attributes`, sibling `.json` with id2name/name2id.
"""

from __future__ import annotations

import argparse
import json
from datetime import datetime
from pathlib import Path

import h5py
import numpy as np

from ..data.loader import DataLoader
from ..utils.logging import logger
from .ssl_backbone import get_ssl_backbone

__all__ = ["extract_feat"]


def extract_feat(
    dataset_train,
    dataset_val,
    dataset_name: str,
    feat_from: str = "dino_vitb16",
    batch_size: int = 32,
    out_root: str = "~/data/sg_data/feat",
    is_grey: bool = False,
    ckpt_path: str | None = None,
    version: str = "v4",
    crops: int = 1,
    spatial: bool = False,
    resampled_size: int = 14,
    attention_map: bool = False,
) -> Path:
    """``crops=10`` writes the tencrop variant: [N, 10, feat_dim] datasets
    (feat_tencrop.py parity); ``crops=1`` is the standard CLS-feature file.

    ``spatial=True`` writes the per-token 'withpatches' file consumed by
    patch clustering: datasets [N, 1 + resampled_size², feat_dim] plus the
    `resampled_size` attribute (`clustering/utils/cluster_patch.py:46-63`).
    ``attention_map=True`` additionally writes `{split}_attentions`
    [N, heads, n_patches] — the last-block CLS attention
    (`feat_nospatial.py:245-259`)."""
    backbone = get_ssl_backbone(feat_from, ckpt_path=ckpt_path)
    out_root = Path(out_root).expanduser()
    out_root.mkdir(parents=True, exist_ok=True)
    time_str = datetime.now().isoformat(timespec="hours")
    suffix = "_tencrop" if crops == 10 else ("_withpatches" if spatial else "")
    out_path = out_root / (
        f"{version}_{dataset_name}_{feat_from}{suffix}_grey{int(is_grey)}_{time_str}.h5"
    )
    n_tokens = 1 + resampled_size * resampled_size
    if attention_map:
        # only ViT backbones have patch/head structure; resnet/simclr/timm
        # extract fine with attention_map=False
        try:
            n_patches = (backbone.image_size
                         // backbone.model.patch_size) ** 2
            n_heads = backbone.model.num_heads
        except AttributeError as e:
            raise ValueError(
                f"--attention_map needs a ViT backbone with "
                f"patch_size/num_heads; {feat_from!r} has neither ({e})"
            ) from None
    else:
        n_patches = n_heads = 0

    id2name: dict[int, str] = {}
    with h5py.File(out_path, "w") as f:
        for split, ds in [("train", dataset_train), ("val", dataset_val)]:
            n = len(ds)
            if spatial:
                shape = (n, n_tokens, backbone.feat_dim)
            elif crops == 10:
                shape = (n, crops, backbone.feat_dim)
            else:
                shape = (n, backbone.feat_dim)
            feats = f.create_dataset(split, shape, dtype="f4")
            attn_ds = (
                f.create_dataset(f"{split}_attentions",
                                 (n, n_heads, n_patches), dtype="f4")
                if attention_map else None
            )
            has_labels = "label_id" in ds[0] or "label" in ds[0]
            labels = (
                f.create_dataset(f"{split}_labels", (n,), dtype="i8")
                if has_labels else None
            )
            dl = DataLoader(ds, batch_size=batch_size, shuffle=False,
                            drop_last=False)
            i = 0

            def _commit(start, feat_np, batch):
                """Write one batch's rows (feats + labels + name map)."""
                b = len(feat_np)
                feats[start:start + b] = feat_np
                if labels is not None:
                    lab = batch.get("label_id")
                    if lab is None:
                        lab = np.argmax(batch["label"], axis=-1)
                    labels[start:start + b] = lab
                for j in range(b):
                    idx = int(batch["id"][j])
                    name = (
                        ds.id2name(idx) if hasattr(ds, "id2name")
                        else f"{idx}.jpg"
                    )
                    id2name[idx] = name
                return b

            # plain CLS extraction runs one batch deep: the encode for
            # batch k is dispatched asynchronously, and batch k-1's result
            # is converted + written to h5 while the device computes —
            # loader/h5/host time hides behind device time
            from .ssl_backbone import SSLBackbone

            pending = None  # (start_idx, device_feat, batch)
            can_pipeline = (
                crops != 10 and not spatial and attn_ds is None
                and isinstance(backbone, SSLBackbone)
            )
            for batch in dl:
                imgs = batch["img4unsup"]
                if crops == 10:
                    from .ssl_backbone import tencrop_batch

                    tc = tencrop_batch(imgs)  # [B, 10, h, w, 3]
                    b_, c_ = tc.shape[:2]
                    flat = tc.reshape(b_ * c_, *tc.shape[2:])
                    feat = backbone.batch_encode_feat(
                        backbone.transform_batch(flat)
                    ).reshape(b_, c_, -1)
                    x = None
                elif spatial:
                    x = backbone.transform_batch(imgs)
                    feat = backbone.batch_encode_tokens(x, resampled_size)
                else:
                    x = backbone.transform_batch(imgs)
                    if can_pipeline:
                        dev = backbone.batch_encode_feat(x, as_numpy=False)
                        if pending is not None:
                            s0, d0, b0 = pending
                            _commit(s0, np.asarray(d0), b0)
                        pending = (i, dev, batch)
                        i += len(imgs)
                        if i % (batch_size * 50) == 0:
                            logger.info(f"{split}: {i}/{n}")
                        continue
                    feat = backbone.batch_encode_feat(x)
                if attn_ds is not None:
                    if x is None:
                        x = backbone.transform_batch(imgs)
                    attn_ds[i:i + len(imgs)] = (
                        backbone.batch_encode_cls_attention(x))
                i += _commit(i, feat, batch)
                if i % (batch_size * 50) == 0:
                    logger.info(f"{split}: {i}/{n}")
            if pending is not None:
                s0, d0, b0 = pending
                _commit(s0, np.asarray(d0), b0)
            assert i == n, (i, n)

        attrs = f.create_dataset("all_attributes", (1,))
        attrs.attrs["dataset_name"] = dataset_name
        attrs.attrs["feat_from"] = feat_from
        attrs.attrs["feat_dim"] = backbone.feat_dim
        attrs.attrs["version"] = version
        attrs.attrs["is_grey"] = int(is_grey)
        if spatial:
            attrs.attrs["resampled_size"] = resampled_size

    json.dump(
        {
            "id2name": {str(k): v for k, v in id2name.items()},
            "name2id": {v: k for k, v in id2name.items()},
        },
        open(str(out_path).replace(".h5", ".json"), "w"),
    )
    logger.warning(f"saved feats to {out_path}")
    return out_path


def _build_datasets(ds: str, image_size: int, data_root: str, debug: bool):
    """get_train_val_dl parity (dataset_common_utils.py:39-164)."""
    if ds in ("in32p", "in64p"):
        from ..data.imagenet_pickle import ImageNetPickle

        mk = lambda train: ImageNetPickle(
            root=data_root, train=train, image_size=image_size, debug=debug
        )
        return mk(True), mk(False)
    if ds == "cifar10":
        from ..data.cifar10 import CIFAR10

        return (CIFAR10(data_root, train=True, debug=debug),
                CIFAR10(data_root, train=False, debug=debug))
    if ds == "synthetic":
        from ..data.synthetic import SyntheticImages

        return (SyntheticImages(size=image_size, length=512, seed=0),
                SyntheticImages(size=image_size, length=128, seed=1))
    raise ValueError(ds)


def main() -> None:
    p = argparse.ArgumentParser(description="feat_extractor (TPU)")
    p.add_argument("--feat", default="dino_vitb16")
    p.add_argument("--ds", default="in32p")
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--image_size", type=int, default=32)
    p.add_argument("--data_root", default="~/data")
    p.add_argument("--out_root", default="~/data/sg_data/feat")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--tencrop", action="store_true")
    p.add_argument("--spatial", action="store_true",
                   help="write per-token features (patch clustering input)")
    p.add_argument("--resampled_size", type=int, default=14)
    p.add_argument("--attn", action="store_true",
                   help="also write last-block CLS attention maps")
    a = p.parse_args()
    train, val = _build_datasets(a.ds, a.image_size, a.data_root, a.debug)
    extract_feat(train, val, dataset_name=a.ds, feat_from=a.feat,
                 batch_size=a.bs, out_root=a.out_root, ckpt_path=a.ckpt,
                 crops=10 if a.tencrop else 1, spatial=a.spatial,
                 resampled_size=a.resampled_size, attention_map=a.attn)


if __name__ == "__main__":
    main()
