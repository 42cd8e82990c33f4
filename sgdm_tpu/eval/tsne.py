"""t-SNE visualization of generated vs real features.

TPU-native rewrite of `eval/eval_tsne.py` `kluster_tsne_vis` (:153+) +
`tsne_vis_both`/`scatter` (:30-78): embed both image dirs with the SimCLR
backbone, t-SNE jointly, scatter with generated='o' / real='v' markers.
When filenames carry cluster ids (`..._cluster{id}.png`, the naming the
reference's own generator writes, eval_tsne.py:97-100,184-203), points are
colored per cluster id with a distinct-color palette — otherwise colored by
source (generated vs real).
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np

from ..utils.logging import logger
from .knn_eval import embed_image_dir

__all__ = ["kluster_tsne_vis"]

_CLUSTER_RE = re.compile(r"cluster(\d+)\.[A-Za-z]+$")


def _dir_cluster_ids(folder: str | Path, max_items: int | None) -> np.ndarray | None:
    """Per-file cluster ids parsed from `*cluster{id}.png` names, in the
    same sorted order `embed_image_dir` reads the folder; None when any
    file lacks the tag.  Parity: eval_tsne.py:96-100 get_cluster_id."""
    files = sorted(
        p for p in Path(folder).iterdir()
        if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )
    if max_items:
        files = files[:max_items]
    ids = []
    for f in files:
        m = _CLUSTER_RE.search(f.name)
        if m is None:
            return None
        ids.append(int(m.group(1)))
    return np.asarray(ids) if ids else None


def kluster_tsne_vis(
    sample_dir: str | Path,
    gt_dir: str | Path,
    save_path: str | Path = "outputs/tsne_vis.png",
    backbone=None,
    max_items: int = 1000,
    perplexity: float = 30.0,
    seed: int = 0,
) -> Path:
    from sklearn.manifold import TSNE

    f_sample, _ = embed_image_dir(sample_dir, backbone, max_items=max_items)
    f_real, _ = embed_image_dir(gt_dir, backbone, max_items=max_items)
    feats = np.concatenate([f_sample, f_real])
    source = np.array([0] * len(f_sample) + [1] * len(f_real))

    cid_s = _dir_cluster_ids(sample_dir, max_items)
    cid_r = _dir_cluster_ids(gt_dir, max_items)
    cluster_ids = (
        np.concatenate([cid_s, cid_r])
        if cid_s is not None and cid_r is not None
        else None
    )

    xy = TSNE(
        n_components=2, perplexity=min(perplexity, len(feats) / 4),
        random_state=seed, init="pca",
    ).fit_transform(feats)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6))
    markers = {0: ("o", "generated"), 1: ("v", "real")}
    if cluster_ids is not None:
        # cluster-colored mode (eval_tsne.py:223-228): one color per
        # cluster id, marker distinguishes generated vs real
        uniq = np.unique(cluster_ids)
        cmap = plt.get_cmap("hsv", len(uniq) + 1)
        colors = {k: cmap(i) for i, k in enumerate(uniq)}
        for src, (marker, name) in markers.items():
            m = source == src
            ax.scatter(
                xy[m, 0], xy[m, 1], s=8, alpha=0.6, marker=marker,
                c=[colors[k] for k in cluster_ids[m]], label=name,
            )
    else:
        for src, (marker, name) in markers.items():
            m = source == src
            ax.scatter(
                xy[m, 0], xy[m, 1], s=4, alpha=0.5, marker=marker,
                label=name, c="tab:orange" if src == 0 else "tab:blue",
            )
    ax.legend()
    ax.set_xticks([])
    ax.set_yticks([])
    save_path = Path(save_path)
    save_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    logger.info(f"saved t-SNE vis to {save_path}")
    return save_path
