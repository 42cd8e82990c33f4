"""STEGO segmentation inference: self-supervised masks for pixel guidance.

TPU-native rewrite of the STEGO inference path the reference uses to
generate `stego_dir` mask PNGs (`side_repo/STEGO/src/sg_sample_segmask.py:
119-160` + `modules.py:17-171`):

  * `DinoFeaturizer`: frozen DINO ViT patch tokens → linear clusterer head
    (+ nonlinear head added, `modules.py:72-86`) to a `dim`-d code,
  * `ClusterLookup` probe: L2-normalized inner products against learned
    cluster centroids; `log_softmax(alpha * ip)` with alpha=2 at inference
    (`modules.py:141-170`, `sg_sample_segmask.py:149`),
  * inference: flip-TTA code averaging, bilinear upsample to image size,
    dense-CRF refinement (our C++ permutohedral CRF replaces pydensecrf),
    argmax → per-image PNG of cluster ids (the `stego_dir` contract,
    consumed by `dataset/transforms/complex_ds_common_util.py:165-209`).

Weights: a STEGO checkpoint (torch .ckpt) provides the head + probe; the
DINO trunk loads via `models.vit`.  Without checkpoints a seeded random
head is used (pipeline plumbing only; flagged).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..models.vit import VisionTransformer, vit_base, vit_small
from ..native import dense_crf
from ..utils.logging import logger

__all__ = ["DinoFeaturizer", "cluster_probe_log_probs", "StegoInference"]


class DinoFeaturizer(nn.Module):
    """DINO trunk + clusterer heads → per-patch code. Parity: modules.py:17-126."""

    dim: int = 70
    backbone: VisionTransformer = None  # type: ignore[assignment]
    nonlinear: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x [B,H,W,3] (imagenet-normalized) → code [B, h, w, dim]."""
        p = self.backbone.patch_size
        b, hh, ww, _ = x.shape
        gh, gw = hh // p, ww // p
        tokens = self.backbone(x, out="tokens")  # [B, 1+N, C]
        feat = tokens[:, 1:].reshape(b, gh, gw, -1)
        code = nn.Conv(self.dim, (1, 1), name="cluster1")(feat)
        if self.nonlinear:
            h = nn.Conv(feat.shape[-1], (1, 1), name="cluster2_1")(feat)
            code = code + nn.Conv(self.dim, (1, 1), name="cluster2_2")(nn.relu(h))
        return code


def cluster_probe_log_probs(code: jax.Array, clusters: jax.Array,
                            alpha: float = 2.0) -> jax.Array:
    """log_softmax(alpha * <norm(code), norm(cluster)>). Parity: modules.py:153-168."""
    cn = clusters / jnp.linalg.norm(clusters, axis=1, keepdims=True)
    fn = code / jnp.maximum(jnp.linalg.norm(code, axis=-1, keepdims=True), 1e-12)
    ip = jnp.einsum("bhwc,nc->bhwn", fn, cn)
    return jax.nn.log_softmax(alpha * ip, axis=-1)


class StegoInference:
    def __init__(
        self,
        n_classes: int = 27,
        dim: int = 70,
        arch: str = "vit_small",
        patch_size: int = 8,
        ckpt_path: str | None = None,
        dino_ckpt_path: str | None = None,
        seed: int = 0,
    ):
        bb = (vit_small if arch == "vit_small" else vit_base)(patch_size)
        self.model = DinoFeaturizer(dim=dim, backbone=bb)
        self.n_classes = n_classes
        if ckpt_path and Path(ckpt_path).exists():
            self.params, self.clusters = self._load_ckpt(ckpt_path, bb)
        else:
            logger.warning(
                "No STEGO checkpoint; using a seeded random head (plumbing "
                "only, masks are not semantically meaningful)."
            )
            x = jnp.zeros((1, 224, 224, 3))
            variables = self.model.init(jax.random.PRNGKey(seed), x)
            params = variables["params"]
            if dino_ckpt_path:
                from ..models.vit import load_dino_torch_weights

                params = dict(params)
                params["backbone"] = load_dino_torch_weights(dino_ckpt_path)
            self.params = params
            self.clusters = jax.random.normal(
                jax.random.PRNGKey(seed + 1), (n_classes, dim)
            )

        @jax.jit
        def _code(params, x):
            return self.model.apply({"params": params}, x)

        self._code = _code

    def _load_ckpt(self, path: str, backbone) -> tuple[dict, jax.Array]:
        """Map a LitUnsupervisedSegmenter torch ckpt onto our modules."""
        import torch

        from ..models.vit import load_dino_torch_weights

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("state_dict", ckpt)
        net = {k.replace("net.model.", ""): v for k, v in sd.items()
               if k.startswith("net.model.")}
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".pth") as f:
            torch.save(net, f.name)
            bb_params = load_dino_torch_weights(f.name)
        params = {
            "backbone": bb_params,
            "cluster1": {
                "kernel": jnp.asarray(
                    sd["net.cluster1.0.weight"].numpy().transpose(2, 3, 1, 0)
                ),
                "bias": jnp.asarray(sd["net.cluster1.0.bias"].numpy()),
            },
            "cluster2_1": {
                "kernel": jnp.asarray(
                    sd["net.cluster2.0.weight"].numpy().transpose(2, 3, 1, 0)
                ),
                "bias": jnp.asarray(sd["net.cluster2.0.bias"].numpy()),
            },
            "cluster2_2": {
                "kernel": jnp.asarray(
                    sd["net.cluster2.2.weight"].numpy().transpose(2, 3, 1, 0)
                ),
                "bias": jnp.asarray(sd["net.cluster2.2.bias"].numpy()),
            },
        }
        clusters = jnp.asarray(sd["cluster_probe.clusters"].numpy())
        return params, clusters

    # ------------------------------------------------------------------
    def predict_mask(self, img_uint8: np.ndarray, use_crf: bool = True) -> np.ndarray:
        """One image → cluster-id mask [H, W] uint8.

        Parity: sg_sample_segmask.py:136-154 (flip-TTA, bilinear upsample,
        cluster-probe log-probs, dense CRF, argmax).
        """
        from .ssl_backbone import IMAGENET_MEAN, IMAGENET_STD

        h0, w0 = img_uint8.shape[:2]
        p = self.model.backbone.patch_size
        h = (h0 // p) * p or p
        w = (w0 // p) * p or p
        x = jnp.asarray(img_uint8[:h, :w], dtype=jnp.float32) / 255.0
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        x = x[None]

        code1 = self._code(self.params, x)
        code2 = self._code(self.params, x[:, :, ::-1])
        code = (code1 + code2[:, :, ::-1]) / 2.0
        code = jax.image.resize(
            code, (1, h, w, code.shape[-1]), method="bilinear"
        )
        log_probs = cluster_probe_log_probs(code, self.clusters)  # [1,h,w,C]
        logits = np.asarray(log_probs[0]).transpose(2, 0, 1)  # [C,h,w]
        if use_crf:
            probs = dense_crf(logits.astype(np.float32),
                              np.ascontiguousarray(img_uint8[:h, :w]))
        else:
            probs = logits
        mask = probs.argmax(0).astype(np.uint8)
        if (h, w) != (h0, w0):  # pad back to original size (nearest edge)
            full = np.zeros((h0, w0), dtype=np.uint8)
            full[:h, :w] = mask
            full[h:, :w] = mask[-1:, :]
            full[:, w:] = full[:, w - 1:w]
            mask = full
        return mask

    def generate_mask_dir(self, image_iter, out_dir: str | Path) -> Path:
        """images (name, uint8 array) → PNG mask per image (stego_dir)."""
        from PIL import Image

        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        for name, img in image_iter:
            mask = self.predict_mask(np.asarray(img))
            stem = Path(name).stem
            Image.fromarray(mask).save(out / f"{stem}.png")
        return out


def main() -> None:
    """CLI parity: `python STEGO/src/sg_generate_segmask.py sample=voc12`
    (README.md:225) — renders the stego_dir mask PNGs."""
    import argparse

    import numpy as np
    from PIL import Image as PILImage

    p = argparse.ArgumentParser(description="STEGO segmentation masks (TPU)")
    p.add_argument("--image_dir", required=True,
                   help="dir of images to segment (recursive)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--ckpt", default=None, help="STEGO torch .ckpt")
    p.add_argument("--dino_ckpt", default=None)
    p.add_argument("--n_classes", type=int, default=27)
    p.add_argument("--dim", type=int, default=70)
    p.add_argument("--arch", default="vit_small")
    p.add_argument("--patch_size", type=int, default=8)
    p.add_argument("--no_crf", action="store_true")
    a = p.parse_args()

    st = StegoInference(
        n_classes=a.n_classes, dim=a.dim, arch=a.arch,
        patch_size=a.patch_size, ckpt_path=a.ckpt,
        dino_ckpt_path=a.dino_ckpt,
    )
    files = sorted(
        f for f in Path(a.image_dir).rglob("*")
        if f.suffix.lower() in (".jpg", ".jpeg", ".png")
    )

    def it():
        for f in files:
            yield f.name, np.asarray(PILImage.open(f).convert("RGB"))

    st.generate_mask_dir(it(), a.out_dir)
    logger.info(f"wrote {len(files)} masks to {a.out_dir}")


if __name__ == "__main__":
    main()
