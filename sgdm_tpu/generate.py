"""Standalone generation CLI: sample images from a trained run.

The reference exposes sampling only through the full eval harness
(`main.py train=0 resume_from=...` → `eval/run_exp.py` FID/exploration
suite).  This is the production serving surface the harness wraps: restore
a checkpoint, build ONE jitted guided-sampling program
(`training/state.py make_sample_fn` — CFG fused into the scanned denoise
step, fused Pallas forward kernels), and write PNGs.

    python -m sgdm_tpu.generate --run outputs/myrun --n 64 \
        --sampler ddim --steps 250 --labels 3,7,123 --out samples/

Vector-conditioned methods (label / cluster / centroid …) sample from
`--labels` or random ids.  Layout-conditioned methods take their
per-image layouts from the CLI too:

  * ``--mask-dir DIR`` — id-pixel mask PNGs (STEGO outputs or GT
    segmasks), nearest-resized to the sample size and one-hot encoded
    exactly like the training pipeline (`data/transforms.py
    segmask_to_onehot` / `mask_to_attr_nhot`); `stegoclusterlayout`
    additionally derives its `stego_attr` n-hot cond from the mask.
  * ``--boxes "x0,y0,x1,y1[;…]"`` — LOST-style boxes (sample-pixel
    coords) → binary bbox-mask layouts for `clusterlayout how=lost`,
    with `--labels` supplying the box-cluster ids.

Masks/boxes are cycled over the batch like `--labels`.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from .utils.logging import logger

__all__ = ["generate", "main"]

_LAYOUT_METHODS = ("layout", "clusterlayout", "stegoclusterlayout")


def _load_trainer(run_dir: Path):
    import yaml

    from .training.trainer import SelfGuidedDiffusionTrainer

    cfg_path = run_dir / "config.yaml"
    if not cfg_path.exists():
        raise FileNotFoundError(
            f"{cfg_path} not found — point --run at a training output dir")
    cfg = yaml.safe_load(cfg_path.read_text())
    # generation is single-program; no need for the training mesh
    (cfg.setdefault("pl", {}).setdefault("trainer", {}))["strategy"] = None
    trainer = SelfGuidedDiffusionTrainer(**cfg)
    # the run's native resolution — the --image-size default
    trainer.run_image_size = int((cfg.get("data") or {}).get("image_size", 64))
    return trainer


def _resolve_ckpt(run_dir: Path, which: str) -> Path:
    from .training.checkpoints import CheckpointManager

    meta_path = run_dir / "ckpts" / "meta.json"
    if which in ("last", "best"):
        if not meta_path.exists():
            raise FileNotFoundError(f"{meta_path} missing — no checkpoints?")
        meta = json.loads(meta_path.read_text())
        key = "last_path" if which == "last" else "best_path"
        p = meta.get(key)
        if not p:
            raise FileNotFoundError(
                f"run has no {which!r} checkpoint recorded in {meta_path}")
        return Path(p)
    return CheckpointManager.resolve(which)


def _build_layouts(trainer, method: str, n: int, image_size: int,
                   mask_dir, boxes, labels, cond_dim: int):
    """Per-sample layout batch [n,H,W,C] (+ attr conds for stego).

    Mirrors the training pipeline's encodings (`data/complex_base.py:
    142-160`): stego/GT masks → `segmask_to_onehot` (+ `mask_to_attr_nhot`
    for the stego_attr cond), LOST boxes → binary bbox masks
    (`data/transforms.py:114`).
    """
    from .data.transforms import (bbox_to_mask, mask_to_attr_nhot,
                                  segmask_to_onehot)

    mcfg = (trainer.condition_cfg or {}).get(method) or {}
    how = mcfg.get("how", "stego" if method == "stegoclusterlayout"
                   else "lost")
    needs_masks = method == "stegoclusterlayout" or how in ("oracle", "stego")

    if needs_masks:
        if not mask_dir:
            raise SystemExit(
                f"condition_method={method!r} (how={how!r}) needs id-pixel "
                "mask PNGs — pass --mask-dir (STEGO outputs or GT segmasks)")
        from PIL import Image
        paths = sorted(Path(mask_dir).glob("*.png"))
        if not paths:
            raise SystemExit(f"no .png masks in {mask_dir}")
        layout_dim = int(mcfg.get("layout_dim")
                         or mcfg.get("stego_k") or cond_dim or 0)
        if layout_dim <= 0:
            raise SystemExit(f"{method}: layout_dim unset in the run config")
        # decode each unique mask once; samples then index the cache
        uniq_layouts, uniq_attrs = [], []
        for p in paths[:min(n, len(paths))]:
            img = Image.open(p)
            if img.size != (image_size, image_size):
                img = img.resize((image_size, image_size), Image.NEAREST)
            m = np.asarray(img)
            if m.ndim == 3:
                m = m[..., 0]
            ids = m[m != 255]  # 255 = ignore label (remapped to 0 below)
            if ids.size and int(ids.max()) >= layout_dim:
                raise SystemExit(
                    f"{p.name}: mask id {int(ids.max())} "
                    f">= layout_dim {layout_dim}")
            uniq_layouts.append(segmask_to_onehot(m, layout_dim))
            if method == "stegoclusterlayout":
                uniq_attrs.append(mask_to_attr_nhot(m, cond_dim or layout_dim))
        k = len(uniq_layouts)
        layouts = [uniq_layouts[i % k] for i in range(n)]
        attrs = [uniq_attrs[i % k] for i in range(n)] if uniq_attrs else []
        return (np.stack(layouts),
                np.stack(attrs) if attrs else None)

    # how == "lost": binary bbox masks
    if not boxes:
        raise SystemExit(
            f"condition_method={method!r} how=lost needs boxes — pass "
            '--boxes "x0,y0,x1,y1[;...]" in sample-pixel coordinates '
            "(box-cluster ids via --labels)")
    parsed = []
    for spec in boxes.split(";"):
        b = np.asarray([float(v) for v in spec.split(",")])
        if b.shape != (4,):
            raise SystemExit(f"bad box {spec!r} — want x0,y0,x1,y1")
        parsed.append(b)
    layouts = [bbox_to_mask((image_size, image_size),
                            parsed[i % len(parsed)])[..., None]
               .astype(np.float32) for i in range(n)]
    return np.stack(layouts), None


def generate(
    run_dir: str | Path,
    *,
    n: int = 16,
    batch_size: int | None = None,
    ckpt: str = "last",
    sampler: str = "ddim",
    steps: int = 250,
    cond_scale: float | None = None,
    labels: list[int] | None = None,
    image_size: int | None = None,
    seed: int = 0,
    use_ema: bool = True,
    out_dir: str | Path = "samples",
    mask_dir: str | Path | None = None,
    boxes: str | None = None,
) -> list[Path]:
    """Sample ``n`` images from the run's checkpoint; returns PNG paths."""
    import jax
    import jax.numpy as jnp

    from .training.state import make_sample_fn

    run_dir = Path(run_dir)
    trainer = _load_trainer(run_dir)
    method = trainer.condition_method
    if image_size is None:  # default: the resolution the run trained at
        image_size = trainer.run_image_size

    cond_dim = int(trainer.cond_dim or 0)
    layouts = attr_conds = None
    if method in _LAYOUT_METHODS:
        layouts, attr_conds = _build_layouts(
            trainer, method, n, image_size, mask_dir, boxes, labels, cond_dim)

    bs = min(batch_size or n, n)
    example = {"image": jnp.zeros((1, image_size, image_size, 3))}
    if cond_dim:
        example["cond"] = jnp.zeros((1, cond_dim))
    if layouts is not None:
        example["layout"] = jnp.zeros((1, *layouts.shape[1:]))
    trainer._init_state(example)
    path = _resolve_ckpt(run_dir, ckpt)
    state = _restore(trainer, path)
    params = state.ema_params if use_ema else state.params
    logger.info(f"restored {path} (step {int(state.step)}); sampling {n} "
                f"imgs via {sampler}-{steps}, cond_scale="
                f"{cond_scale if cond_scale is not None else trainer.cond_scale}")

    sample = make_sample_fn(
        trainer.model, trainer.diffusion, sampling_method=sampler,
        num_steps=steps,
        cond_scale=(cond_scale if cond_scale is not None
                    else (trainer.cond_scale or 0.0)),
    )

    rng = jax.random.PRNGKey(seed)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    from PIL import Image

    paths: list[Path] = []
    made = 0
    while made < n:
        b = min(bs, n - made)
        rng, krng, crng = jax.random.split(rng, 3)
        cond = ids = None
        if attr_conds is not None:  # stegoclusterlayout: n-hot from masks
            cond = jnp.asarray(attr_conds[made:made + b])
        elif cond_dim:
            if labels:
                ids = np.asarray([labels[(made + j) % len(labels)]
                                  for j in range(b)])
                if (ids < 0).any() or (ids >= cond_dim).any():
                    raise ValueError(f"labels must be in [0,{cond_dim})")
            else:
                ids = np.asarray(
                    jax.random.randint(crng, (b,), 0, cond_dim))
            cond = jax.nn.one_hot(jnp.asarray(ids), cond_dim)
        layout = (jnp.asarray(layouts[made:made + b])
                  if layouts is not None else None)
        imgs, _ = sample(params, krng, b, image_size, 3, cond=cond,
                         layout=layout)
        imgs = np.asarray(imgs)  # uint8 NHWC
        for j in range(b):
            name = f"{made + j:06d}"
            if ids is not None:
                name += f"_c{int(ids[j])}"
            p = out / f"{name}.png"
            Image.fromarray(imgs[j]).save(p)
            paths.append(p)
        made += b
    logger.info(f"wrote {len(paths)} images to {out}")
    return paths


def _restore(trainer, path: Path):
    from .training.checkpoints import CheckpointManager

    trainer.ckpt = trainer.ckpt or CheckpointManager(path.parent)
    return trainer.ckpt.restore(trainer.state, path)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(
        prog="sgdm_tpu.generate",
        description="Sample images from a trained run directory.")
    ap.add_argument("--run", required=True, help="training output dir "
                    "(contains config.yaml + ckpts/)")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--ckpt", default="last",
                    help="'last', 'best', or an explicit checkpoint path")
    ap.add_argument("--sampler", default="ddim",
                    help="ddpm | ddim | plms | pndm | tero | vdm | ...")
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--cond-scale", type=float, default=None,
                    help="CFG scale (default: the run's training value)")
    ap.add_argument("--labels", default=None,
                    help="comma-separated condition ids, cycled over the "
                         "batch (default: random)")
    ap.add_argument("--image-size", type=int, default=None,
                    help="sample resolution (default: the run's "
                         "data.image_size from config.yaml)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-ema", action="store_true",
                    help="sample the raw params instead of the EMA shadow")
    ap.add_argument("--out", default="samples")
    ap.add_argument("--mask-dir", default=None,
                    help="id-pixel mask PNGs for layout-conditioned runs "
                         "(STEGO outputs / GT segmasks), cycled over n")
    ap.add_argument("--boxes", default=None,
                    help='LOST boxes "x0,y0,x1,y1[;...]" in sample-pixel '
                         "coords for clusterlayout how=lost")
    a = ap.parse_args(argv)
    labels = [int(x) for x in a.labels.split(",")] if a.labels else None
    generate(a.run, n=a.n, batch_size=a.batch_size, ckpt=a.ckpt,
             sampler=a.sampler, steps=a.steps, cond_scale=a.cond_scale,
             labels=labels, image_size=a.image_size, seed=a.seed,
             use_ema=not a.no_ema, out_dir=a.out, mask_dir=a.mask_dir,
             boxes=a.boxes)


if __name__ == "__main__":
    main()
