"""ImageNet downsampling scripts: image folders → Chrabaszcz pickles.

TPU-native rewrite of `side_repo/Imagenet32_Scripts/` — the offline prep
that produces the `train_data_batch_1..10` / `val_data` pickle files
`data.imagenet_pickle.ImageNetPickle` consumes:

  * `resize_image_folder` — per-folder PIL resize with the paper's
    interpolation choices (`image_resizer_imagent.py:61-90`; 'box' is the
    headline algorithm),
  * `pack_train_folder` — class-subdir tree → 10 shuffled train pickles,
    each `{'data': uint8 [N, 3·S²] planar RGB, 'labels': 1-based list,
    'mean': float [3·S²]}` (`image2numpy_imagenet_train.py:26-114`),
  * `pack_val_folder` — flat val folder + ground-truth label file →
    `val_data` pickle (`image2numpy_imagenet_val.py`).

CLI:
  python -m sgdm_tpu.data.imagenet_downsample resize --in_dir ... --size 32
  python -m sgdm_tpu.data.imagenet_downsample pack --in_dir ... --out_dir ...
"""

from __future__ import annotations

import argparse
import pickle
from pathlib import Path

import numpy as np

__all__ = ["resize_image_folder", "pack_train_folder", "pack_val_folder",
           "planar_to_hwc"]

_ALGS = {
    "lanczos": "LANCZOS", "nearest": "NEAREST", "bilinear": "BILINEAR",
    "bicubic": "BICUBIC", "box": "BOX", "hamming": "HAMMING",
}


def _pil_alg(name: str):
    from PIL import Image

    return getattr(Image, _ALGS[name])


def resize_image_folder(in_dir: str | Path, out_dir: str | Path, size: int,
                        alg: str = "box") -> int:
    """Resize every readable image in `in_dir` to size×size PNGs
    (image_resizer_imagent.py:61-90; grayscale → RGB)."""
    from PIL import Image

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    n = 0
    for p in sorted(Path(in_dir).iterdir()):
        try:
            im = Image.open(p)
            if im.mode != "RGB":
                im = im.convert("RGB")
        except OSError:
            continue
        im.resize((size, size), _pil_alg(alg)).save(out_dir / (p.stem + ".png"))
        n += 1
    return n


def _img_to_planar_row(path: Path, size: int) -> np.ndarray | None:
    """Image file → uint8 [3·S²] planar row (r..g..b), resizing if needed."""
    from PIL import Image

    try:
        im = Image.open(path)
        if im.mode != "RGB":
            im = im.convert("RGB")
        if im.size != (size, size):
            im = im.resize((size, size), _pil_alg("box"))
    except OSError:
        return None
    arr = np.asarray(im, dtype=np.uint8)  # [S, S, 3]
    return arr.transpose(2, 0, 1).reshape(-1)  # planar rgb


def planar_to_hwc(row: np.ndarray, size: int) -> np.ndarray:
    """Inverse of the planar packing, for round-trip checks."""
    return np.asarray(row, np.uint8).reshape(3, size, size).transpose(1, 2, 0)


def pack_train_folder(in_dir: str | Path, out_dir: str | Path, size: int = 32,
                      num_batches: int = 10, seed: int = 0) -> Path:
    """Class-subdir tree → shuffled `train_data_batch_1..N` pickles.

    Folder order defines labels (the reference uses map_clsloc order,
    utils.py:33-54); labels are 1-BASED like the original files
    (ImageNetPickle shifts them back to 0-based at read time)."""
    in_dir, out_dir = Path(in_dir), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rows, labels = [], []
    folders = sorted(p for p in in_dir.iterdir() if p.is_dir())
    assert folders, f"no class folders under {in_dir}"
    for label, folder in enumerate(folders, start=1):
        for p in sorted(folder.iterdir()):
            row = _img_to_planar_row(p, size)
            if row is not None:
                rows.append(row)
                labels.append(label)
    x = np.stack(rows)
    y = np.asarray(labels)
    x_mean = x.mean(axis=0)

    rng = np.random.RandomState(seed)
    idx = rng.permutation(len(x))
    per = len(x) // num_batches
    for i in range(1, num_batches + 1):
        sl = idx[(i - 1) * per:] if i == num_batches else idx[(i - 1) * per: i * per]
        d = {"data": x[sl], "labels": y[sl].tolist(), "mean": x_mean}
        pickle.dump(d, open(out_dir / f"train_data_batch_{i}", "wb"))
    return out_dir


def pack_val_folder(in_dir: str | Path, out_dir: str | Path, size: int = 32,
                    ground_truth: str | Path | None = None) -> Path:
    """Flat val folder (+ optional 1-based ground-truth label file, one per
    line in filename-sorted order — ILSVRC2015_clsloc_validation_ground_
    truth.txt format) → `val_data` pickle."""
    in_dir, out_dir = Path(in_dir), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(p for p in in_dir.iterdir() if p.is_file())
    if ground_truth:
        gt = [int(l) for l in Path(ground_truth).read_text().split()]
    else:
        gt = [1] * len(files)
    rows, labels = [], []
    for p, label in zip(files, gt):
        row = _img_to_planar_row(p, size)
        if row is not None:
            rows.append(row)
            labels.append(label)
    d = {"data": np.stack(rows), "labels": labels}
    pickle.dump(d, open(out_dir / "val_data", "wb"))
    return out_dir


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("resize")
    r.add_argument("--in_dir", required=True)
    r.add_argument("--out_dir", required=True)
    r.add_argument("--size", type=int, default=32)
    r.add_argument("--alg", default="box", choices=sorted(_ALGS))
    t = sub.add_parser("pack")
    t.add_argument("--in_dir", required=True, help="class-subdir train tree")
    t.add_argument("--out_dir", required=True)
    t.add_argument("--size", type=int, default=32)
    t.add_argument("--num_batches", type=int, default=10)
    t.add_argument("--seed", type=int, default=0)
    v = sub.add_parser("pack_val")
    v.add_argument("--in_dir", required=True)
    v.add_argument("--out_dir", required=True)
    v.add_argument("--size", type=int, default=32)
    v.add_argument("--ground_truth", default=None)
    a = p.parse_args()
    if a.cmd == "resize":
        n = resize_image_folder(a.in_dir, a.out_dir, a.size, a.alg)
        print(f"resized {n} images → {a.out_dir}")
    elif a.cmd == "pack":
        pack_train_folder(a.in_dir, a.out_dir, a.size, a.num_batches, a.seed)
        print(f"packed train pickles → {a.out_dir}")
    else:
        pack_val_folder(a.in_dir, a.out_dir, a.size, a.ground_truth)
        print(f"packed val_data → {a.out_dir}")


if __name__ == "__main__":
    main()
