"""Clustering CLI: feat h5 → cluster h5 (bit-compatible schema).

TPU-native rewrite of `clustering/cluster_on_feat.py` +
`clustering/utils/cluster_standard.py:36-176` using the on-TPU k-means/kNN
(`ops.kmeans` / `ops.knn`) in place of faiss-gpu:

  * output schema (SURVEY.md §2.7): `train`/`val` int64 assignments,
    `centroids` [k, feat_dim], optional `train_feat` +
    `{split}_nns`/`{split}_nns_radius` when nns>0, `train/val_attentions`
    copied through, attrs {dataset_name, feat_from, cluster_k, feat_dim,
    is_grey} on `all_attributes`, sibling `.json` copied from the feat h5,
  * filename convention
    `v4_{ds}_cluster{k}_iter{n}minp{m}_nns{nns}_{feat}_grey{g}_{time}_{sha}.h5`
    (cluster_standard.py:60-70),
  * the normalization quirk is inherited from run_kmeans: trainval is
    concatenated BEFORE run_kmeans so assignment uses unnormalized features
    (cluster_standard.py:94-95 + SURVEY.md §7 hard-part 2),
  * NMI/AMI/ARI against labels when present (sklearn).
"""

from __future__ import annotations

import argparse
import shutil
import subprocess
from datetime import datetime
from pathlib import Path

import h5py
import numpy as np

from ..ops.kmeans import run_kmeans
from ..ops.knn import run_nns
from ..utils.logging import logger

__all__ = ["cal_cluster_metric", "clustering"]


def cal_cluster_metric(gt_np, pred_np, need_nmi=True, need_ami=True, need_ari=True):
    """Parity: clustering/cal_cluster_metric.py:7-15."""
    from sklearn.metrics import (
        adjusted_mutual_info_score,
        adjusted_rand_score,
        normalized_mutual_info_score,
    )

    result = dict(labels_pred_num=len(np.unique(gt_np)))
    if need_nmi:
        result["nmi"] = normalized_mutual_info_score(gt_np, pred_np)
    if need_ami:
        result["ami"] = adjusted_mutual_info_score(gt_np, pred_np)
    if need_ari:
        result["ari"] = adjusted_rand_score(gt_np, pred_np)
    return result


def _git_sha() -> str:
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "HEAD"], text=True
        ).strip()[:7]
    except Exception:
        return "nogit"


def clustering(
    feat_h5_path: str,
    nns: int = 0,
    cluster_k: int = 5000,
    niter: int = 30,
    minp: int = 200,
    cluster_h5_root: str | None = None,
    debug: bool = False,
    seed: int = 1234,
) -> Path:
    feat_h5_path = Path(feat_h5_path).expanduser().resolve()
    f_feat = h5py.File(feat_h5_path, "r")
    attrs = f_feat["all_attributes"].attrs
    dataset_name = attrs["dataset_name"]
    feat_from = attrs["feat_from"]
    is_grey = int(attrs.get("is_grey", 0))

    def get_feat(split):
        return f_feat[split][:1000] if debug else f_feat[split][:]

    if debug:
        cluster_k, niter = 10, 30

    time_str = datetime.now().isoformat(timespec="hours")
    fname = (
        f"v4_{dataset_name}_cluster{cluster_k}_iter{niter}minp{minp}_"
        f"nns{nns}_{feat_from}_grey{is_grey}_{time_str}_{_git_sha()}.h5"
    )
    if debug:
        fname = fname.replace(".h5", "debug.h5")
    root = Path(cluster_h5_root or "~/data/sg_data/cluster").expanduser()
    root.mkdir(parents=True, exist_ok=True)
    out_path = (root / fname).resolve()

    # sibling .json name map copied from the feat h5 (cluster_standard.py:28-33)
    src_json = Path(str(feat_h5_path).replace(".h5", ".json"))
    if src_json.exists():
        shutil.copy(src_json, Path(str(out_path).replace(".h5", ".json")))

    train_feat, val_feat = np.array(get_feat("train")), np.array(get_feat("val"))
    if train_feat.ndim == 3:  # tencrop feats [N, crops, D] → crop-mean
        # (cluster_tencrop.py variant: cluster on the aggregated crop feats)
        train_feat = train_feat.mean(axis=1)
        val_feat = val_feat.mean(axis=1)
    trainval_feat = np.concatenate([train_feat, val_feat], 0)
    trainset_size = len(train_feat)

    with h5py.File(out_path, "w") as f:
        f.create_dataset("train", data=-np.ones(len(train_feat), dtype=np.int64))
        f.create_dataset("val", data=-np.ones(len(val_feat), dtype=np.int64))
        dset = f.create_dataset("all_attributes", (1,))
        dset.attrs["dataset_name"] = dataset_name
        dset.attrs["feat_from"] = feat_from
        dset.attrs["cluster_k"] = cluster_k
        dset.attrs["feat_dim"] = attrs["feat_dim"]
        dset.attrs["is_grey"] = is_grey

        if nns > 0:
            logger.warning("creating nns datasets")
            sample_nns, radii = run_nns(
                np.array(train_feat), features_trainval=trainval_feat, k_nn=nns
            )
            f.create_dataset("train_feat", data=train_feat)
            f.create_dataset("train_nns", data=sample_nns[:trainset_size])
            f.create_dataset("train_nns_radius", data=radii[:trainset_size])
            f.create_dataset("val_nns", data=sample_nns[trainset_size:])
            f.create_dataset("val_nns_radius", data=radii[trainset_size:])

        if "train_attentions" in f_feat:
            f.create_dataset("train_attentions", data=f_feat["train_attentions"])
            f.create_dataset("val_attentions", data=f_feat["val_attentions"])

        assigned, centroids = run_kmeans(
            feat_train=train_feat, feat_trainval=trainval_feat,
            cluster_k=cluster_k, niter=niter, minp=minp, seed=seed,
        )
        f["train"][:] = assigned[:trainset_size]
        f["val"][:] = assigned[trainset_size:]
        f.create_dataset("centroids", data=centroids)

        if "train_labels" in f_feat:
            labels = np.concatenate(
                [get_feat("train_labels"), get_feat("val_labels")], 0
            )
            logger.warning(
                f"train cluster metrics: "
                f"{cal_cluster_metric(labels[:trainset_size], assigned[:trainset_size])}"
            )
            logger.warning(
                f"val cluster metrics: "
                f"{cal_cluster_metric(labels[trainset_size:], assigned[trainset_size:])}"
            )

    f_feat.close()
    logger.warning(f"saved {out_path}")
    return out_path


def main() -> None:
    p = argparse.ArgumentParser(description="cluster_on_feat (TPU)")
    p.add_argument("--feat_h5", required=True)
    p.add_argument("--k", type=int, default=5000)
    p.add_argument("--niter", type=int, default=30)
    p.add_argument("--minp", type=int, default=200)
    p.add_argument("--nns", type=int, default=0)
    p.add_argument("--out_root", default=None)
    p.add_argument("--debug", action="store_true")
    a = p.parse_args()
    clustering(a.feat_h5, nns=a.nns, cluster_k=a.k, niter=a.niter,
               minp=a.minp, cluster_h5_root=a.out_root, debug=a.debug)


if __name__ == "__main__":
    main()
