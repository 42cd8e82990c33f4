"""One-off dataset preparation utilities (host-side, no device work).

TPU-repo equivalents of the reference's ds_utils prep scripts — re-authored
as parameterized CLI subcommands instead of hard-coded-path scripts:

  * ``cocostuff-from-coco17`` — copy the STEGO-curated subset of COCO-2017
    images into the cocostuff27 train/val folder layout
    (ref: dataset/ds_utils/extract_cocostuff_from_coco17.py:25-44).
  * ``ffhq-onelevel`` — flatten FFHQ's sharded thumbnail folders into one
    directory (ref: dataset/ds_utils/put_all_ffhq_in_onelevel.py:12-17).
  * ``cityscapes-resize`` — resize Cityscapes leftImg8bit/gtCoarse splits
    to a square size (bilinear images, nearest labels)
    (ref: dataset/ds_utils/resize_cityscapes_trainextra_to_320.py:60-81).

Usage::

    python -m sgdm_tpu.data.prep cocostuff-from-coco17 \
        --coco17-images /data/coco/images --curated /data/curated \
        --dest ~/data/cocostuff27/images
    python -m sgdm_tpu.data.prep ffhq-onelevel --src .../thumbnails64x64 \
        --dest .../thumbnails64x64_onelevel
    python -m sgdm_tpu.data.prep cityscapes-resize --src .../cityscapes \
        --dest .../cs320_v2 --size 320 --splits train_extra val

The resize fan-out uses a thread pool (PIL releases the GIL during
decode/encode) rather than the reference's torch DataLoader-as-a-for-loop.
"""

from __future__ import annotations

import argparse
import shutil
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterable

__all__ = [
    "make_clean_dir",
    "extract_cocostuff_from_coco17",
    "ffhq_onelevel",
    "resize_cityscapes",
]


def make_clean_dir(path: str | Path) -> Path:
    """Recreate ``path`` empty (ref: diffusion_utils/util.py make_clean_dir)."""
    p = Path(path)
    if p.exists():
        shutil.rmtree(p)
    p.mkdir(parents=True)
    return p


def _read_id_list(txt: Path) -> list[str]:
    ids = [line.strip() for line in txt.read_text().splitlines() if line.strip()]
    if not ids:
        raise ValueError(f"empty curated id list: {txt}")
    return ids


def extract_cocostuff_from_coco17(
    coco17_images: str | Path,
    curated_dir: str | Path,
    dest: str | Path,
    *,
    curated_name: str = "Coco164kFull_Stuff_Coarse_7.txt",
    limit: int | None = None,
) -> dict[str, int]:
    """Copy the curated cocostuff image subset out of a COCO-2017 tree.

    ``coco17_images`` holds ``train2017/`` and ``val2017/``; ``curated_dir``
    holds ``{split}2017/<curated_name>`` id lists (one image id per line,
    the STEGO curation).  Writes ``dest/train`` and ``dest/val``.
    Returns per-split copy counts.
    """
    coco17_images, curated_dir = Path(coco17_images), Path(curated_dir)
    counts = {}
    for split in ("train", "val"):
        ids = _read_id_list(curated_dir / f"{split}2017" / curated_name)
        if limit is not None:
            ids = ids[:limit]
        src_dir = coco17_images / f"{split}2017"
        out = make_clean_dir(Path(dest) / split)
        for img_id in ids:
            src = src_dir / f"{img_id}.jpg"
            if not src.exists():
                raise FileNotFoundError(
                    f"curated id {img_id!r} has no image at {src}")
            shutil.copyfile(src, out / src.name)
        counts[split] = len(ids)
    return counts


def ffhq_onelevel(src: str | Path, dest: str | Path,
                  *, suffix: str = ".png") -> int:
    """Flatten FFHQ's ``NN000/NNNNN.png`` shards into one flat directory.
    Returns the number of files copied; duplicate basenames are an error
    (they would silently overwrite)."""
    src = Path(src)
    out = make_clean_dir(dest)
    seen: set[str] = set()
    n = 0
    for f in sorted(src.rglob(f"*{suffix}")):
        if not f.is_file():
            continue
        if f.name in seen:
            raise ValueError(f"duplicate basename across shards: {f.name}")
        seen.add(f.name)
        shutil.copyfile(f, out / f.name)
        n += 1
    if n == 0:
        raise FileNotFoundError(f"no {suffix} files under {src}")
    return n


def _resize_tree(src_dir: Path, out_dir: Path, size: int, resample,
                 workers: int, *, pattern: str = "*.png",
                 preserve_mode: bool = False) -> int:
    from PIL import Image

    files = [f for f in sorted(src_dir.rglob(pattern)) if f.is_file()]
    if not files:
        raise FileNotFoundError(f"no {pattern} files under {src_dir}")
    make_clean_dir(out_dir)

    def one(f: Path) -> None:
        img = Image.open(f)
        if not preserve_mode:
            img = img.convert("RGB")
        # label maps keep their native mode (L/P/I): .convert("RGB") would
        # clamp >8-bit ids to 255 and triple the array shape for consumers
        # that read class-id maps as 2-D (e.g. data/cityscapes.py)
        img.resize((size, size), resample).save(out_dir / f.name)

    with ThreadPoolExecutor(max_workers=workers) as pool:
        list(pool.map(one, files))
    return len(files)


def resize_cityscapes(
    src: str | Path,
    dest: str | Path,
    *,
    size: int = 320,
    splits: Iterable[str] = ("train_extra", "val"),
    workers: int = 8,
    label_pattern: str = "*_labelIds.png",
) -> dict[str, tuple[int, int]]:
    """Resize ``leftImg8bit/{split}`` (bilinear, RGB) and ``gtCoarse/{split}``
    (nearest, native mode — label maps must neither interpolate nor be
    RGB-converted) to ``size``×``size`` under ``dest/{split}_images`` /
    ``dest/{split}_labels``.  ``label_pattern`` selects only the class-id
    maps: gtCoarse ships 3 PNGs per frame (labelIds / instanceIds / color)
    and sweeping all of them would mis-pair the images↔labels outputs.
    Returns {split: (n_images, n_labels)}; the counts must match."""
    from PIL import Image

    src, dest = Path(src), Path(dest)
    counts = {}
    for split in splits:
        n_img = _resize_tree(src / "leftImg8bit" / split,
                             dest / f"{split}_images", size,
                             Image.BILINEAR, workers)
        n_lbl = _resize_tree(src / "gtCoarse" / split,
                             dest / f"{split}_labels", size,
                             Image.NEAREST, workers,
                             pattern=label_pattern, preserve_mode=True)
        if n_img != n_lbl:
            raise ValueError(
                f"{split}: {n_img} images but {n_lbl} labels matching "
                f"{label_pattern!r} — images↔labels would mis-pair")
        counts[split] = (n_img, n_lbl)
    return counts


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="sgdm_tpu.data.prep",
                                 description=__doc__.split("\n\n")[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("cocostuff-from-coco17")
    p.add_argument("--coco17-images", required=True)
    p.add_argument("--curated", required=True)
    p.add_argument("--dest", required=True)
    p.add_argument("--curated-name", default="Coco164kFull_Stuff_Coarse_7.txt")
    p.add_argument("--limit", type=int, default=None,
                   help="debug: first N ids per split")

    p = sub.add_parser("ffhq-onelevel")
    p.add_argument("--src", required=True)
    p.add_argument("--dest", required=True)

    p = sub.add_parser("cityscapes-resize")
    p.add_argument("--src", required=True)
    p.add_argument("--dest", required=True)
    p.add_argument("--size", type=int, default=320)
    p.add_argument("--splits", nargs="+", default=["train_extra", "val"])
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--label-pattern", default="*_labelIds.png")

    args = ap.parse_args(argv)
    if args.cmd == "cocostuff-from-coco17":
        counts = extract_cocostuff_from_coco17(
            args.coco17_images, args.curated, args.dest,
            curated_name=args.curated_name, limit=args.limit)
    elif args.cmd == "ffhq-onelevel":
        counts = {"copied": ffhq_onelevel(args.src, args.dest)}
    else:
        counts = resize_cityscapes(args.src, args.dest, size=args.size,
                                   splits=args.splits, workers=args.workers,
                                   label_pattern=args.label_pattern)
    print(counts)


if __name__ == "__main__":
    main()
