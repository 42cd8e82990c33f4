"""SSL backbone zoo with a unified interface.

TPU-native rewrite of `self_sl/ssl_backbone.py` — the unified contract is
`{feat_dim, transform_batch, batch_encode_feat}` (:91-127 DINO branch):
resize to 224 + ImageNet normalization, then the CLS token of the ViT.

Backbones resolve torch checkpoints from local paths (zero-egress image;
point `SGDM_SSL_CKPT_DIR` or pass ckpt_path) via the weight ports in
`models.vit`.  Without a checkpoint a deterministic random backbone is
used — features are self-consistent (fine for pipeline tests/clustering
plumbing) but loudly flagged as not-pretrained.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vit import load_dino_torch_weights, vit_base, vit_small
from ..utils.logging import logger

__all__ = ["get_ssl_backbone", "SSLBackbone", "IMAGENET_MEAN", "IMAGENET_STD"]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

_CKPT_NAMES = {
    "dino_vits16": "dino_deitsmall16_pretrain.pth",
    "dino_vits8": "dino_deitsmall8_pretrain.pth",
    "dino_vitb16": "dino_vitbase16_pretrain.pth",
    "dino_vitb8": "dino_vitbase8_pretrain.pth",
    "dino_xcit_m24_p8": "dino_xcit_medium_24_p8_pretrain.pth",
    # the three VISSL zoo checkpoints (vissl_backbone.py:53-72 wget names)
    "vissl_simclr": "model_final_checkpoint_phase999.torch",
    "vissl_deepclusterv2": "deepclusterv2_800ep_pretrain.pth.tar",
    "vissl_jigsaw": "converted_vissl_rn50_jigsaw_in1k_goyal19.torch",
    "simclr_rn50": "simclr_imagenet.ckpt",
    "rn50": "resnet50-0676ba61.pth",  # torchvision IMAGENET1K_V1
}


class SSLBackbone:
    """feat_dim / transform_batch / batch_encode_feat (ssl_backbone parity)."""

    def __init__(self, name: str, model, params, image_size: int = 224):
        self.name = name
        self.model = model
        self.params = params
        self.image_size = image_size
        self._is_vit = hasattr(model, "embed_dim")
        self.feat_dim = model.embed_dim if self._is_vit else model.feat_dim
        is_vit = self._is_vit

        # outputs are always f32 — the feat h5 contract and every consumer
        # (k-means, kNN, probes) expect f32 even when the backbone computes
        # in bfloat16
        @jax.jit
        def _encode(params, x):
            if is_vit:
                out = model.apply({"params": params}, x, out="cls")
            else:
                out = model.apply({"params": params}, x)
            return out.astype(jnp.float32)

        @jax.jit
        def _encode_tokens(params, x):
            return model.apply(
                {"params": params}, x, out="tokens").astype(jnp.float32)

        @jax.jit
        def _encode_attn(params, x):
            return model.apply(
                {"params": params}, x, out="attn_last").astype(jnp.float32)

        size = image_size

        # one jitted program per input shape — the eager version costs a
        # per-op dispatch over the device transport (~4 ms each on the
        # remote-TPU tunnel), which is material at extraction throughput
        @jax.jit
        def _transform(imgs_uint8):
            x = imgs_uint8.astype(jnp.float32) / 255.0
            if x.shape[1] != size:
                x = jax.image.resize(
                    x, (x.shape[0], size, size, x.shape[3]),
                    method="bilinear",
                )
            return (x - IMAGENET_MEAN) / IMAGENET_STD

        self._encode = _encode
        self._encode_tokens = _encode_tokens
        self._encode_attn = _encode_attn
        self._transform = _transform

    def transform_batch(self, imgs_uint8: np.ndarray) -> jnp.ndarray:
        """uint8 [B,H,W,3] → resized 224 + imagenet-normalized float32.

        Parity: ssl_backbone.py transform_batch (resize 224 + norm).
        """
        return self._transform(jnp.asarray(imgs_uint8))

    def batch_encode_feat(self, batch: jnp.ndarray, *,
                          as_numpy: bool = True) -> np.ndarray | jax.Array:
        """CLS-token features [B, feat_dim].

        ``as_numpy=False`` returns the (asynchronously dispatched) device
        array without blocking — callers can overlap host-side work (h5
        writes, the next batch's data loading) with device compute and
        convert later (`selfsup/feat_extractor.py`)."""
        out = self._encode(self.params, batch)
        return np.asarray(out) if as_numpy else out

    def batch_encode_tokens(self, batch: jnp.ndarray,
                            resampled_size: int = 14) -> np.ndarray:
        """Per-token features [B, 1 + S², feat_dim]: CLS + the patch-token
        grid adaptively average-pooled to S×S (the 'withpatches' spatial
        feat file consumed by `clustering/utils/cluster_patch.py:35`,
        attrs['resampled_size'])."""
        toks = self._encode_tokens(self.params, batch)  # [B, 1+n, D]
        cls, patches = toks[:, :1], toks[:, 1:]
        b, n, d = patches.shape
        g = int(round(float(n) ** 0.5))
        s = resampled_size
        grid = patches.reshape(b, g, g, d)
        if g != s:
            grid = jax.image.resize(grid, (b, s, s, d), method="linear")
        out = jnp.concatenate([cls, grid.reshape(b, s * s, d)], axis=1)
        return np.asarray(out)

    def batch_encode_cls_attention(self, batch: jnp.ndarray) -> np.ndarray:
        """Last-block CLS→patch attention [B, heads, n_patches]
        (feat_nospatial.py:173-176: `attentions[:, :, 0, 1:]`)."""
        attn = self._encode_attn(self.params, batch)  # [B, H, N, N]
        return np.asarray(attn[:, :, 0, 1:])


def _find_ckpt(name: str, ckpt_path: str | None) -> str | None:
    if ckpt_path:
        if Path(ckpt_path).exists():
            return ckpt_path
        # an EXPLICIT path must not silently degrade to the default
        # search → seeded-random backbone (quietly meaningless features)
        raise FileNotFoundError(
            f"ssl checkpoint for {name!r} not found: {ckpt_path}")
    fname = _CKPT_NAMES.get(name)
    for root in [os.environ.get("SGDM_SSL_CKPT_DIR"), "/root/data/ssl",
                 os.path.expanduser("~/.cache/torch/hub/checkpoints")]:
        if root and fname and (Path(root) / fname).exists():
            return str(Path(root) / fname)
    return None


def _load_native_backbone(name: str, path: str, image_size: int) -> SSLBackbone:
    """Encoder checkpoints exported by our own MSN/MAE trainers
    (`selfsup.pretrain_common.save_encoder_ckpt`): flax-serialized params in
    VisionTransformer layout + a .json meta describing the architecture."""
    import json

    from ..models.vit import VisionTransformer
    from .pretrain_common import load_encoder_ckpt

    meta = json.loads(Path(str(path) + ".json").read_text())
    model = VisionTransformer(
        patch_size=meta["patch_size"], embed_dim=meta["embed_dim"],
        depth=meta["depth"], num_heads=meta["num_heads"],
        pretrain_img_size=meta["pretrain_img_size"],
    )
    x = jnp.zeros((1, meta["pretrain_img_size"], meta["pretrain_img_size"], 3))
    template = model.init(jax.random.PRNGKey(0), x)["params"]
    params = load_encoder_ckpt(path, template)
    logger.info(f"loaded native {meta.get('method', '?')} encoder from {path}")
    return SSLBackbone(name, model, params, image_size=image_size)


class _TimmBackbone:
    """torch-CPU adapter for `timm_{arch}` zoo names.

    Parity: self_sl/timm_backbone.py:14-75 timm_4sg — forward_features +
    global-average-pool for conv nets, with the same unified
    {feat_dim, transform_batch, batch_encode_feat} contract (features
    returned as ndarray, not the reference's {'feat': tensor} dict).
    """

    def __init__(self, arch: str, image_size: int = 224):
        import timm
        import torch

        pretrained = "random" not in arch
        arch = arch.replace("_random", "")
        self.model = timm.create_model(arch, pretrained=pretrained).eval()
        self.image_size = image_size
        self.feat_dim = getattr(
            self.model, "embed_dim", None
        ) or self.model.feature_info[-1]["num_chs"]
        self._torch = torch

    def transform_batch(self, imgs_uint8: np.ndarray):
        t = self._torch
        x = t.from_numpy(np.asarray(imgs_uint8)).float().permute(0, 3, 1, 2) / 255.0
        x = t.nn.functional.interpolate(
            x, size=(self.image_size, self.image_size), mode="bilinear",
            align_corners=False,
        )
        mean = t.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
        std = t.tensor(IMAGENET_STD).view(1, 3, 1, 1)
        return (x - mean) / std

    def batch_encode_feat(self, batch) -> np.ndarray:
        with self._torch.no_grad():
            feat = self.model.forward_features(batch)
            if feat.dim() == 4:  # conv feature map → GAP
                feat = feat.mean(dim=[2, 3])
            elif feat.dim() == 3:  # token sequence → CLS
                feat = feat[:, 0]
        return feat.numpy()


def _timm_backbone(name: str, image_size: int) -> _TimmBackbone:
    try:
        import timm  # noqa: F401
    except ImportError as e:
        raise ImportError(
            f"ssl backbone '{name}' needs the `timm` package (reference "
            "shim self_sl/timm_backbone.py:14), which is not installed in "
            "this image. `pip install timm` with a local wheel, or use a "
            "native backbone (dino_*/mae_*/msn_*/simclr_rn50/rn50)."
        ) from e
    return _TimmBackbone(name.replace("timm_", "", 1), image_size=image_size)


def get_ssl_backbone(
    name: str = "dino_vitb16", image_size: int = 224,
    ckpt_path: str | None = None, seed: int = 0,
    compute_dtype: str | None = None,
) -> SSLBackbone:
    """Parity: self_sl/ssl_backbone.py:373 get_ssl_backbone (DINO family;
    MAE/MSN/SimCLR load through the same ViT port when checkpoints exist).
    A `.msgpack` ckpt_path loads a natively pre-trained encoder (our MSN/MAE
    trainers) with its architecture taken from the sidecar meta json.

    ``compute_dtype``: matmul dtype for the ViT backbones (default float32;
    env ``SGDM_FEAT_DTYPE`` overrides).  float32 is both the reference-
    parity choice (torch runs the extractors in fp32) and the MEASURED
    fastest on the v5e bench chip at every batch size (e.g. bs256:
    842 vs 723 imgs/s) — extraction throughput is dispatch/host-bound, not
    MXU-bound, and bfloat16 only adds cast/relayout traffic around the
    always-f32 softmax/LayerNorm islands (models/vit.py).  The knob stays
    for MXU-richer targets; features come back f32 either way."""
    compute_dtype = compute_dtype or os.environ.get(
        "SGDM_FEAT_DTYPE") or "float32"
    vit_dtype = jnp.bfloat16 if str(compute_dtype) in (
        "bf16", "bfloat16") else jnp.float32
    if ckpt_path and str(ckpt_path).endswith(".msgpack"):
        return _load_native_backbone(name, ckpt_path, image_size)
    if name.startswith("timm_"):
        return _timm_backbone(name, image_size)
    from ..models.resnet import (ResNet50, load_simclr_torch_weights,
                                 load_vissl_torch_weights, resnet101)
    from ..models.xcit import load_xcit_torch_weights, xcit_medium_24_p8

    builders = {
        # VISSL zoo (self_sl/vissl_backbone.py:53-72): ResNet trunks,
        # trunk-features-only — loaded natively from the same checkpoint
        # files the reference wgets (no vissl/classy_vision stack needed)
        "vissl_simclr": resnet101,          # RN101 simclr_8node_resnet
        "vissl_deepclusterv2": ResNet50,    # SwAV-format RN50
        "vissl_jigsaw": ResNet50,           # converted VISSL RN50
        # XCiT port (reference arch zoo self_sl/ssl_backbone.py:114-118;
        # torch.hub dino_xcit_medium_24_p8 checkpoints load via
        # models/xcit.py load_xcit_torch_weights)
        "dino_xcit_m24_p8": lambda: xcit_medium_24_p8(dtype=vit_dtype),
        "dino_vits16": lambda: vit_small(16, dtype=vit_dtype),
        "dino_vits8": lambda: vit_small(8, dtype=vit_dtype),
        "dino_vitb16": lambda: vit_base(16, dtype=vit_dtype),
        "dino_vitb8": lambda: vit_base(8, dtype=vit_dtype),
        "mae_vitb16": lambda: vit_base(16, dtype=vit_dtype),
        "msn_vits16": lambda: vit_small(16, dtype=vit_dtype),
        "msn_vitb16": lambda: vit_base(16, dtype=vit_dtype),
        # the pl_bolts SimCLR ResNet-50 encoder — the KNN-eval embedder
        # (self_sl/simclr_related.py:26-44)
        "simclr_rn50": ResNet50,
        # supervised ImageNet ResNet-50 (reference zoo 'rn50' via torch.hub,
        # self_sl/ssl_backbone.py:118-127) — torchvision state dicts load
        # through the same mapper (identical layer naming)
        "rn50": ResNet50,
    }
    if name not in builders:
        raise ValueError(f"unknown ssl backbone {name}; have {list(builders)}")
    model = builders[name]()
    path = _find_ckpt(name, ckpt_path)
    if path:
        logger.info(f"loading {name} weights from {path}")
        if name in ("simclr_rn50", "rn50"):
            params = load_simclr_torch_weights(path)
        elif name.startswith("vissl_"):
            params = load_vissl_torch_weights(path)
        elif name == "dino_xcit_m24_p8":
            params = load_xcit_torch_weights(path)
        else:
            params = load_dino_torch_weights(path)
        if name.startswith("dino_") and "xcit" not in name:
            # first-use golden assertion against the torch ground truth
            # (utils.weight_verify; sidecar golden on later loads)
            from ..utils.weight_verify import verify_dino_load

            verify_dino_load(path, model, params)
    else:
        logger.warning(
            f"No checkpoint for {name} (set SGDM_SSL_CKPT_DIR). Using a "
            f"DETERMINISTIC RANDOM backbone — features are self-consistent "
            f"but not pretrained."
        )
        x = jnp.zeros((1, image_size, image_size, 3))
        params = model.init(jax.random.PRNGKey(seed), x)["params"]
    return SSLBackbone(name, model, params, image_size=image_size)


def tencrop_batch(imgs_uint8: np.ndarray, crop_frac: float = 0.875) -> np.ndarray:
    """Classic TenCrop: 4 corners + center, each plus its horizontal flip.

    uint8 [B, H, W, 3] → uint8 [B, 10, ch, cw, 3] (torchvision TenCrop
    semantics; used by the tencrop feature-extractor variant,
    clustering/utils/feat_tencrop.py).
    """
    b, h, w, _ = imgs_uint8.shape
    ch, cw = int(h * crop_frac), int(w * crop_frac)
    tops = [0, 0, h - ch, h - ch, (h - ch) // 2]
    lefts = [0, w - cw, 0, w - cw, (w - cw) // 2]
    crops = []
    for t, l in zip(tops, lefts):
        c = imgs_uint8[:, t:t + ch, l:l + cw]
        crops.append(c)
        crops.append(c[:, :, ::-1])
    return np.stack(crops, axis=1)
