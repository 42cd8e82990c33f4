"""KNN evaluation: embed generated + real images, find nearest neighbors.

TPU-native rewrite of `eval/eval_knn.py` — embed the sample dir and the GT
dir with the SimCLR ResNet-50 encoder (the reference's embedder,
`self_sl/simclr_related.py:26-44`; any backbone from `selfsup.ssl_backbone`
can be substituted), run exact kNN on TPU (`ops.knn`), report the mean NN
distance and save query→neighbor grids.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..ops.knn import knn_search
from ..utils.logging import logger, make_grid

__all__ = ["embed_image_dir", "get_knn_eval_dict"]


def _load_dir(folder: str | Path, max_items: int | None = None) -> np.ndarray:
    from PIL import Image

    files = sorted(
        p for p in Path(folder).iterdir()
        if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )
    if max_items:
        files = files[:max_items]
    return np.stack([np.asarray(Image.open(f).convert("RGB")) for f in files])


def embed_image_dir(folder: str | Path, backbone=None, batch_size: int = 128,
                    max_items: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Returns (feats [N,D], imgs [N,H,W,3] uint8)."""
    if backbone is None:
        from ..selfsup.ssl_backbone import get_ssl_backbone

        backbone = get_ssl_backbone("simclr_rn50")
    imgs = _load_dir(folder, max_items)
    feats = []
    for i in range(0, len(imgs), batch_size):
        x = backbone.transform_batch(imgs[i:i + batch_size])
        feats.append(backbone.batch_encode_feat(x))
    return np.concatenate(feats), imgs


def get_knn_eval_dict(
    sample_dir: str | Path,
    gt_dir: str | Path,
    knn_k: int = 5,
    q_num: int = 10,
    batch_size: int = 128,
    backbone=None,
    papervis_dir: str | Path | None = None,
    max_items: int | None = 2000,
) -> dict[str, float]:
    """Parity: eval/eval_knn.py:131+ get_knn_eval_dict (metric + grids)."""
    q_feats, q_imgs = embed_image_dir(sample_dir, backbone, batch_size, max_items)
    g_feats, g_imgs = embed_image_dir(gt_dir, backbone, batch_size, max_items)

    d2, idx = knn_search(g_feats, q_feats, k=knn_k)
    mean_nn_dist = float(np.sqrt(d2[:, 0]).mean())
    out = {
        "knn_mean_nn_dist": mean_nn_dist,
        "knn_mean_k_dist": float(np.sqrt(d2).mean()),
    }
    logger.info(f"knn eval: {out}")

    if papervis_dir is not None:
        from PIL import Image

        papervis_dir = Path(papervis_dir)
        papervis_dir.mkdir(parents=True, exist_ok=True)
        rows = []
        for qi in range(min(q_num, len(q_imgs))):
            row = [q_imgs[qi]] + [g_imgs[j] for j in idx[qi]]
            rows.extend(row)
        grid = make_grid(np.stack(rows), ncol=knn_k + 1)
        Image.fromarray(grid).save(papervis_dir / "knn_grid.png")
    return out
