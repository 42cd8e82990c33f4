"""PCA-group clustering variant: split the PCA spectrum into views, cluster
each view independently (multi-view cluster assignments per sample).

TPU-native rewrite of `clustering/utils/cluster_pca.py:37-156
clustering_pca` + `run_pca_dr.py run_pca_sklearn` ('separate' mode): fit PCA
on (a subsample of) the train features, split the component spectrum into
`pca_group` contiguous chunks (optionally shuffling component order), and
run the faiss-semantics k-means per chunk; the output h5 stores `train`/
`val` as [N, pca_group] int64 assignment matrices (consumed via the
`patchcluster`-style multi-one-hot reader).
"""

from __future__ import annotations

from datetime import datetime
from pathlib import Path

import h5py
import numpy as np

from ..ops.kmeans import run_kmeans
from ..utils.logging import logger
from .cluster import _git_sha

__all__ = ["run_pca_views", "clustering_pca"]


def run_pca_views(
    train_feat: np.ndarray,
    trainval_feat: np.ndarray,
    total_view: int = 4,
    downsample_num: int = 100_000,
    pca_shuffle: bool = False,
    seed: int = 0,
) -> list[np.ndarray]:
    """Parity: run_pca_dr.py run_pca_sklearn (_type='separate')."""
    from sklearn.decomposition import PCA

    rng = np.random.default_rng(seed)
    fit = train_feat
    if len(fit) > downsample_num:
        fit = fit[rng.permutation(len(fit))[:downsample_num]]
    d = train_feat.shape[1]
    pca = PCA(n_components=d, svd_solver="full")
    pca.fit(fit)
    proj = pca.transform(trainval_feat)
    order = np.arange(d)
    if pca_shuffle:
        rng.shuffle(order)
    chunk = d // total_view
    return [
        np.ascontiguousarray(proj[:, order[i * chunk:(i + 1) * chunk]],
                             dtype=np.float32)
        for i in range(total_view)
    ]


def clustering_pca(
    feat_h5_path: str,
    cluster_k: int = 100,
    niter: int = 30,
    minp: int = 200,
    pca_group: int = 4,
    pca_shuffle: bool = False,
    cluster_h5_root: str | None = None,
    debug: bool = False,
) -> Path:
    feat_h5_path = Path(feat_h5_path).expanduser().resolve()
    f_feat = h5py.File(feat_h5_path, "r")
    attrs = f_feat["all_attributes"].attrs
    dataset_name, feat_from = attrs["dataset_name"], attrs["feat_from"]
    is_grey = int(attrs.get("is_grey", 0))

    def get(split):
        return f_feat[split][:1000] if debug else f_feat[split][:]

    time_str = datetime.now().isoformat(timespec="hours")
    fname = (
        f"v4_{dataset_name}_cluster{cluster_k}_iter{niter}minp{minp}_nns0_"
        f"{feat_from}_grey{is_grey}_pcagroup{pca_group}separate_"
        f"shuffle{int(pca_shuffle)}_{time_str}_{_git_sha()}.h5"
    )
    root = Path(cluster_h5_root or "~/data/sg_data/cluster").expanduser()
    root.mkdir(parents=True, exist_ok=True)
    out = (root / fname).resolve()

    train_feat = np.array(get("train"))
    val_feat = np.array(get("val"))
    trainval = np.concatenate([train_feat, val_feat], 0)
    n_train = len(train_feat)

    views = run_pca_views(train_feat, trainval, total_view=pca_group,
                          pca_shuffle=pca_shuffle)
    with h5py.File(out, "w") as f:
        f.create_dataset("train", data=-np.ones((n_train, pca_group), np.int64))
        f.create_dataset("val", data=-np.ones((len(val_feat), pca_group), np.int64))
        d = f.create_dataset("all_attributes", (1,))
        d.attrs["dataset_name"] = dataset_name
        d.attrs["feat_from"] = feat_from
        d.attrs["cluster_k"] = cluster_k
        d.attrs["feat_dim"] = attrs["feat_dim"]
        d.attrs["is_grey"] = is_grey
        for vi, view in enumerate(views):
            assigned, _ = run_kmeans(
                feat_train=view[:n_train].copy(), feat_trainval=view,
                cluster_k=cluster_k, niter=niter, minp=minp,
            )
            f["train"][:, vi] = assigned[:n_train]
            f["val"][:, vi] = assigned[n_train:]
            logger.info(f"pca view {vi}: done")
    f_feat.close()
    logger.warning(f"saved {out}")
    return out


def clustering_ensemble(
    feat_h5_path: str,
    cluster_k: int = 100,
    niter: int = 30,
    minp: int = 200,
    ensemble_num: int = 4,
    cluster_h5_root: str | None = None,
    debug: bool = False,
) -> Path:
    """Ensemble clustering: k-means run `ensemble_num` times on the same
    features, assignments stored as an [N, ensemble_num] matrix.

    Parity: clustering/utils/cluster_emsemble.py:37-144.  The reference's
    members differ only through faiss-GPU nondeterminism (its seed is
    fixed); here each member gets seed 1234+i explicitly, which is the
    same intent made deterministic.
    """
    feat_h5_path = Path(feat_h5_path).expanduser().resolve()
    f_feat = h5py.File(feat_h5_path, "r")
    attrs = f_feat["all_attributes"].attrs
    dataset_name, feat_from = attrs["dataset_name"], attrs["feat_from"]
    is_grey = int(attrs.get("is_grey", 0))

    def get(split):
        return f_feat[split][:1000] if debug else f_feat[split][:]

    time_str = datetime.now().isoformat(timespec="hours")
    fname = (
        f"v4_{dataset_name}_cluster{cluster_k}emsemble{ensemble_num}_"
        f"iter{niter}minp{minp}_nns0_{feat_from}_grey{is_grey}_"
        f"{time_str}_{_git_sha()}.h5"
    )
    root = Path(cluster_h5_root or "~/data/sg_data/cluster").expanduser()
    root.mkdir(parents=True, exist_ok=True)
    out = (root / fname).resolve()

    train_feat = np.array(get("train"))
    val_feat = np.array(get("val"))
    trainval = np.concatenate([train_feat, val_feat], 0)
    n_train = len(train_feat)

    with h5py.File(out, "w") as f:
        f.create_dataset("train", data=-np.ones((n_train, ensemble_num), np.int64))
        f.create_dataset("val", data=-np.ones((len(val_feat), ensemble_num), np.int64))
        d = f.create_dataset("all_attributes", (1,))
        d.attrs["dataset_name"] = dataset_name
        d.attrs["feat_from"] = feat_from
        d.attrs["cluster_k"] = cluster_k
        d.attrs["feat_dim"] = attrs["feat_dim"]
        d.attrs["is_grey"] = is_grey
        for ei in range(ensemble_num):
            assigned, _ = run_kmeans(
                feat_train=train_feat, feat_trainval=trainval,
                cluster_k=cluster_k, niter=niter, minp=minp, seed=1234 + ei,
            )
            f["train"][:, ei] = assigned[:n_train]
            f["val"][:, ei] = assigned[n_train:]
            logger.info(f"ensemble member {ei}: done")
    f_feat.close()
    logger.warning(f"saved {out}")
    return out
