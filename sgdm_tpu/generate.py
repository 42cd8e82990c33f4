"""Standalone generation CLI: sample images from a trained run.

The reference exposes sampling only through the full eval harness
(`main.py train=0 resume_from=...` → `eval/run_exp.py` FID/exploration
suite).  This is the production serving surface the harness wraps: restore
a checkpoint, build ONE jitted guided-sampling program
(`training/state.py make_sample_fn` — CFG fused into the scanned denoise
step, fused Pallas forward kernels), and write PNGs.

    python -m sgdm_tpu.generate --run outputs/myrun --n 64 \
        --sampler ddim --steps 250 --labels 3,7,123 --out samples/

Works for the vector-conditioned methods (label / cluster / centroid …);
layout-conditioned models (segmentation masks, LOST boxes) need real
per-image layouts — use the eval harness with a dataset for those.
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
    return SelfGuidedDiffusionTrainer(**cfg)


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
    image_size: int = 64,
    seed: int = 0,
    use_ema: bool = True,
    out_dir: str | Path = "samples",
) -> list[Path]:
    """Sample ``n`` images from the run's checkpoint; returns PNG paths."""
    import jax
    import jax.numpy as jnp

    from .training.state import make_sample_fn

    run_dir = Path(run_dir)
    trainer = _load_trainer(run_dir)
    method = trainer.condition_method
    if method in _LAYOUT_METHODS:
        raise NotImplementedError(
            f"condition_method={method!r} needs per-image layouts; use the "
            "eval harness (main.py train=0 resume_from=...) with a dataset")

    cond_dim = int(trainer.cond_dim or 0)
    bs = min(batch_size or n, n)
    example = {"image": jnp.zeros((1, image_size, image_size, 3))}
    if cond_dim:
        example["cond"] = jnp.zeros((1, cond_dim))
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
        cond = None
        if cond_dim:
            if labels:
                ids = np.asarray([labels[(made + j) % len(labels)]
                                  for j in range(b)])
                if (ids < 0).any() or (ids >= cond_dim).any():
                    raise ValueError(f"labels must be in [0,{cond_dim})")
            else:
                ids = np.asarray(
                    jax.random.randint(crng, (b,), 0, cond_dim))
            cond = jax.nn.one_hot(jnp.asarray(ids), cond_dim)
        imgs, _ = sample(params, krng, b, image_size, 3, cond=cond)
        imgs = np.asarray(imgs)  # uint8 NHWC
        for j in range(b):
            name = f"{made + j:06d}"
            if cond_dim:
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
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-ema", action="store_true",
                    help="sample the raw params instead of the EMA shadow")
    ap.add_argument("--out", default="samples")
    a = ap.parse_args(argv)
    labels = [int(x) for x in a.labels.split(",")] if a.labels else None
    generate(a.run, n=a.n, batch_size=a.batch_size, ckpt=a.ckpt,
             sampler=a.sampler, steps=a.steps, cond_scale=a.cond_scale,
             labels=labels, image_size=a.image_size, seed=a.seed,
             use_ema=not a.no_ema, out_dir=a.out)


if __name__ == "__main__":
    main()
