"""First-use golden assertion for real pretrained-weight ports.

Round-3 deliverable (VERDICT #7): until real checkpoints exist in an
image, the weight ports are verified only by random-weight round trips
(tests/test_golden_weight_ports.py).  This module closes the remaining
hole: the FIRST time a real checkpoint is loaded, the port is verified
on the spot instead of trusted —

  1. if a sidecar golden (`<ckpt>.golden.npz`) exists, the JAX forward on
     a fixed seeded input must match it;
  2. otherwise, if torch (CPU) can evaluate the same checkpoint — the
     in-package TFIDInception replica for pt_inception, the reference's
     vendored DINO ViT for dino checkpoints — the torch forward is
     computed, written as the sidecar, and asserted against;
  3. if no torch ground truth is reachable, a loud warning is logged and
     verification is skipped (never silently passed).

A mapping error in the loader then fails at load time with a clear
message rather than corrupting every downstream FID/cluster number.
Match: ref eval/eval_fid.py:47-91 (external clean-fid inception),
self_sl/ssl_backbone.py:102-127 (hub DINO weights).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from .logging import logger

__all__ = ["verify_inception_load", "verify_dino_load"]

_ATOL = 1e-3  # f32 torch-CPU vs XLA forward, 299px inception / 224px ViT

_STEGO_DINO_SRC = "/root/reference/side_repo/STEGO/src"


def _fixed_input(shape, seed=1234):
    return (np.random.default_rng(seed).standard_normal(shape) * 0.4).astype(
        np.float32)


def _sidecar(ckpt_path) -> Path:
    return Path(str(ckpt_path) + ".golden.npz")


def _check(name: str, got: np.ndarray, want: np.ndarray, ckpt) -> None:
    err = float(np.abs(got - want).max())
    if err > _ATOL:
        raise RuntimeError(
            f"weight-port verification FAILED for {ckpt}: {name} differs "
            f"from the torch ground truth by {err:.2e} (tol {_ATOL}). The "
            "loader mapping is wrong for this checkpoint format — do not "
            "trust FID/cluster outputs until this is fixed."
        )
    logger.info(f"weight-port golden ok: {name} max|Δ|={err:.2e} ({ckpt})")


def verify_inception_load(ckpt_path, params) -> bool:
    """Verify a freshly-loaded pt_inception param tree against torch.

    Returns True when verified, False when skipped (no ground truth).
    """
    import jax.numpy as jnp

    from ..eval.inception import FIDInceptionV3

    x = _fixed_input((1, 3, 299, 299))
    out = FIDInceptionV3().apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    pool3 = np.asarray(out["pool3"], np.float32)

    side = _sidecar(ckpt_path)
    if side.exists():
        want = np.load(side)["pool3"]
        _check("inception.pool3", pool3, want, ckpt_path)
        return True
    try:
        import torch

        from ..eval.torch_inception_ref import TFIDInception

        tm = TFIDInception().eval()
        tm.load_state_dict(torch.load(
            ckpt_path, map_location="cpu", weights_only=True), strict=False)
        with torch.no_grad():
            want = tm(torch.from_numpy(x))[0].numpy()
    except Exception as e:  # torch missing / incompatible state dict
        logger.warning(
            f"weight-port verification SKIPPED for {ckpt_path}: no torch "
            f"ground truth available ({e!r}). Treat downstream FID numbers "
            "as unverified until a golden sidecar exists."
        )
        return False
    _check("inception.pool3", pool3, want, ckpt_path)
    _save_sidecar(side, pool3=want)
    return True


def verify_dino_load(ckpt_path, model, params) -> bool:
    """Verify freshly-loaded DINO ViT params (CLS features) against the
    reference's vendored torch ViT when available."""
    import jax.numpy as jnp

    size = getattr(model, "pretrain_img_size", 224)
    x = _fixed_input((1, 3, size, size))
    cls = np.asarray(model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), out="cls"
    ), np.float32)

    side = _sidecar(ckpt_path)
    if side.exists():
        _check("dino.cls", cls, np.load(side)["cls"], ckpt_path)
        return True
    try:
        import sys

        import torch

        if not os.path.isdir(_STEGO_DINO_SRC):
            raise FileNotFoundError(_STEGO_DINO_SRC)
        if _STEGO_DINO_SRC not in sys.path:
            sys.path.append(_STEGO_DINO_SRC)
        from dino import vision_transformer as vt

        arch = "vit_small" if model.embed_dim <= 384 else "vit_base"
        tm = getattr(vt, arch)(patch_size=model.patch_size).eval()
        sd = torch.load(ckpt_path, map_location="cpu", weights_only=True)
        sd = sd.get("teacher", sd) if isinstance(sd, dict) else sd
        tm.load_state_dict(
            {k.replace("backbone.", ""): v for k, v in sd.items()},
            strict=False)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
    except Exception as e:
        logger.warning(
            f"weight-port verification SKIPPED for {ckpt_path}: no torch "
            f"ground truth available ({e!r})."
        )
        return False
    _check("dino.cls", cls, want, ckpt_path)
    _save_sidecar(side, cls=want)
    return True


def _save_sidecar(path: Path, **arrays) -> None:
    try:
        np.savez(path, **arrays)
        logger.info(f"wrote weight-port golden sidecar {path}")
    except OSError as e:  # read-only checkpoint dir: verification still ran
        logger.warning(f"could not write golden sidecar {path}: {e}")
