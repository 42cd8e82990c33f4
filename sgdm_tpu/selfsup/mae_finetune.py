"""MAE end-to-end fine-tuning: the supervised-classification recipe that
turns a pre-trained MAE encoder into an ImageNet classifier.

TPU-native rewrite of `self_sl/mae/main_finetune.py` + `engine_finetune.py`
(the last SSL-quality trainer; the pre-train half is `mae_train.py`, the
frozen-feature half is `eval_probes.linear_probe`).  Reference semantics
kept, re-designed for XLA:

  * ViT classifier head (`models_vit.py`): ``global_pool=True`` pools the
    PRE-final-norm patch tokens and applies a fresh ``fc_norm`` LayerNorm
    (the backbone's own norm is bypassed); ``global_pool=False`` uses the
    normed CLS token.  Head weight init trunc-normal(2e-5)
    (main_finetune.py:257).
  * layer-wise lr decay (ELECTRA/BEiT, `util/lr_decay.py:15-61`): scale
    ``layer_decay**(num_layers - layer_id)`` with patch-embed/cls/pos at
    layer 0, block i at i+1, norm/fc_norm/head at num_layers = depth+1 —
    implemented as ONE optax transform scaling the post-AdamW update tree
    (equivalent to torch per-group lr), not per-group optimizers.
  * no-weight-decay for 1-D params + cls_token/pos_embed
    (`param_groups_lrd` ndim==1 / no_weight_decay_list).
  * mixup/cutmix (timm `Mixup`, batch mode): Beta(α,α) lambda,
    switch_prob cutmix selection, area-corrected cutmix lambda, label
    smoothing folded into the soft targets — all inside the jitted train
    step (static-shape cutmix via iota masks, no dynamic slicing).
  * SoftTargetCE / label-smoothing CE (`main_finetune.py:290-296`).
  * stochastic depth (``--drop_path``, linearly ramped over blocks —
    `models/vit.py Block.drop_path`).
  * per-iteration warmup + half-cosine lr (`util/lr_sched.py`, shared
    `mae_train.mae_lr_schedule`), lr = blr·bs/256.
  * train aug: RandomResizedCrop(0.08-1) + hflip + a compact RandAugment
    (the `rand-m9-mstd0.5-inc1` policy family: 2 ops/image, magnitude
    N(9,0.5), increasing-severity op set) + imagenet-normalize + random
    erasing (pixel mode, p=0.25) — host-side numpy/PIL, overlapped with
    device compute by the threaded loader.

Gradient accumulation (`--accum_iter`) is not reproduced here — the
diffusion trainer's `lax.scan` micro-batching (`training/state.py`) is the
framework's accumulation primitive; at finetune batch sizes a TPU chip
does not need it.
"""

from __future__ import annotations

import argparse
import math
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from ..models.vit import VisionTransformer
from ..utils.logging import logger
from .mae_train import mae_lr_schedule
from .pretrain_common import random_resized_crop, save_encoder_ckpt

__all__ = [
    "ViTClassifier", "layerwise_lr_scales", "finetune_wd_mask",
    "scale_by_tree", "make_finetune_tx", "apply_mixup", "soft_target_ce",
    "label_smoothing_ce", "FinetuneDataset", "train_finetune", "main",
]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


# ----------------------------------------------------------------------
# model
# ----------------------------------------------------------------------

class ViTClassifier(nn.Module):
    """Encoder + classification head (models_vit.py VisionTransformer)."""

    encoder: VisionTransformer
    num_classes: int
    global_pool: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        pre, normed = self.encoder(
            x, out="tokens_pair", deterministic=not train)
        if self.global_pool:
            f = pre[:, 1:].mean(axis=1)
            f = nn.LayerNorm(epsilon=1e-6, name="fc_norm")(f)
        else:
            f = normed[:, 0]
        return nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.truncated_normal(2e-5),
            name="head",
        )(f)


# ----------------------------------------------------------------------
# optimizer: layer-wise lr decay + wd mask
# ----------------------------------------------------------------------

def _layer_id(path, depth: int) -> int:
    """util/lr_decay.py:64-76 get_layer_id_for_vit over flax paths."""
    keys = [getattr(p, "key", str(p)) for p in path]
    if keys and keys[0] == "encoder":
        name = keys[1] if len(keys) > 1 else ""
        if name in ("cls_token", "pos_embed", "patch_embed"):
            return 0
        if name.startswith("blocks_"):
            return int(name.split("_")[1]) + 1
    return depth + 1  # encoder final norm, fc_norm, head


def layerwise_lr_scales(params, layer_decay: float, depth: int):
    """Per-leaf lr multipliers: layer_decay**(num_layers - layer_id)
    (util/lr_decay.py:23-25, num_layers = depth + 1)."""
    num_layers = depth + 1
    return jax.tree_util.tree_map_with_path(
        lambda path, p: layer_decay ** (num_layers - _layer_id(path, depth)),
        params,
    )


def finetune_wd_mask(params):
    """True=decayed: ndim>1 and not cls_token/pos_embed
    (param_groups_lrd:32)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, p: p.ndim > 1 and not any(
            getattr(k, "key", str(k)) in ("cls_token", "pos_embed")
            for k in path),
        params,
    )


def scale_by_tree(scales):
    """Multiply the update tree leaf-wise — per-group lr as one transform."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        return jax.tree.map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init, update)


def make_finetune_tx(params, lr_schedule, *, weight_decay: float,
                     layer_decay: float, depth: int,
                     clip_grad: float | None = None):
    """AdamW + wd mask + layer-decay scaling (main_finetune.py:282-288).
    Scaling the post-AdamW update equals torch's per-group lr: decoupled
    AdamW multiplies BOTH the adam step and the wd step by the group lr."""
    chain = []
    if clip_grad:
        chain.append(optax.clip_by_global_norm(clip_grad))
    chain.append(optax.adamw(lr_schedule, b1=0.9, b2=0.999,
                             weight_decay=weight_decay,
                             mask=finetune_wd_mask(params)))
    chain.append(scale_by_tree(layerwise_lr_scales(params, layer_decay,
                                                   depth)))
    return optax.chain(*chain)


# ----------------------------------------------------------------------
# mixup / cutmix / losses
# ----------------------------------------------------------------------

def _smooth_onehot(y, num_classes: int, smoothing: float):
    off = smoothing / num_classes
    return jax.nn.one_hot(y, num_classes) * (1.0 - smoothing) + off


def apply_mixup(rng, x, y, num_classes: int, *, mixup_alpha: float = 0.8,
                cutmix_alpha: float = 1.0, prob: float = 1.0,
                switch_prob: float = 0.5, smoothing: float = 0.1):
    """timm Mixup, batch mode: one lambda per batch, mixup OR cutmix per
    step (switch_prob), cutmix lambda corrected by the realized box area,
    smoothing folded into the soft targets.  Static shapes throughout —
    the cutmix box is an iota mask, not a dynamic slice."""
    r_apply, r_switch, r_lam_m, r_lam_c, r_cy, r_cx = jax.random.split(rng, 6)
    y1 = _smooth_onehot(y, num_classes, smoothing)
    y2 = y1[::-1]
    x2 = x[::-1]
    b, h, w, _ = x.shape

    lam_m = (jax.random.beta(r_lam_m, mixup_alpha, mixup_alpha)
             if mixup_alpha > 0 else jnp.float32(1.0))
    x_mix = lam_m * x + (1.0 - lam_m) * x2

    if cutmix_alpha > 0:
        lam0 = jax.random.beta(r_lam_c, cutmix_alpha, cutmix_alpha)
        ratio = jnp.sqrt(1.0 - lam0)
        ch, cw = h * ratio, w * ratio
        cy = jax.random.uniform(r_cy, (), minval=0.0, maxval=float(h))
        cx = jax.random.uniform(r_cx, (), minval=0.0, maxval=float(w))
        y0, y1b = jnp.clip(cy - ch / 2, 0, h), jnp.clip(cy + ch / 2, 0, h)
        x0, x1b = jnp.clip(cx - cw / 2, 0, w), jnp.clip(cx + cw / 2, 0, w)
        yy = jnp.arange(h, dtype=jnp.float32)[:, None]
        xx = jnp.arange(w, dtype=jnp.float32)[None, :]
        box = ((yy >= y0) & (yy < y1b) & (xx >= x0) & (xx < x1b))
        x_cut = jnp.where(box[None, :, :, None], x2, x)
        lam_c = 1.0 - box.mean()
    else:
        x_cut, lam_c = x_mix, lam_m

    if mixup_alpha > 0 and cutmix_alpha > 0:
        use_cut = jax.random.bernoulli(r_switch, switch_prob)
    else:
        use_cut = jnp.asarray(cutmix_alpha > 0)
    lam = jnp.where(use_cut, lam_c, lam_m)
    x_out = jnp.where(use_cut, x_cut, x_mix)
    targets = lam * y1 + (1.0 - lam) * y2

    applied = jax.random.bernoulli(r_apply, prob)
    return (jnp.where(applied, x_out, x),
            jnp.where(applied, targets, y1))


def soft_target_ce(logits, soft_targets):
    """timm SoftTargetCrossEntropy."""
    return -jnp.mean(jnp.sum(soft_targets * jax.nn.log_softmax(logits, -1),
                             axis=-1))


def label_smoothing_ce(logits, y, num_classes: int, smoothing: float = 0.1):
    """timm LabelSmoothingCrossEntropy (= soft CE on smoothed one-hots)."""
    return soft_target_ce(logits, _smooth_onehot(y, num_classes, smoothing))


# ----------------------------------------------------------------------
# host-side train augmentation
# ----------------------------------------------------------------------

_RA_OPS = (
    "autocontrast", "equalize", "invert", "rotate", "posterize", "solarize",
    "solarize_add", "color", "contrast", "brightness", "sharpness",
    "shear_x", "shear_y", "translate_x", "translate_y",
)


def _rand_augment(rng: np.random.Generator, img01: np.ndarray,
                  num_ops: int = 2, magnitude: float = 9.0,
                  mstd: float = 0.5) -> np.ndarray:
    """Compact `rand-m9-mstd0.5-inc1` (timm auto_augment rand_augment:
    2 uniformly-chosen ops, magnitude ~ N(m, mstd) clipped to [0,10],
    increasing-severity level maps).  Operates on [0,1] float HWC."""
    from PIL import Image, ImageEnhance, ImageOps

    pil = Image.fromarray(np.clip(img01 * 255.0, 0, 255).astype(np.uint8))
    for op in rng.choice(len(_RA_OPS), size=num_ops, replace=True):
        m = float(np.clip(rng.normal(magnitude, mstd), 0.0, 10.0))
        frac = m / 10.0
        sign = -1.0 if rng.random() < 0.5 else 1.0
        name = _RA_OPS[int(op)]
        if name == "autocontrast":
            pil = ImageOps.autocontrast(pil)
        elif name == "equalize":
            pil = ImageOps.equalize(pil)
        elif name == "invert":
            pil = ImageOps.invert(pil)
        elif name == "rotate":
            pil = pil.rotate(sign * 30.0 * frac, resample=Image.BILINEAR)
        elif name == "posterize":
            pil = ImageOps.posterize(pil, max(1, 8 - int(4 * frac)))
        elif name == "solarize":
            pil = ImageOps.solarize(pil, int(255 * (1.0 - frac)))
        elif name == "solarize_add":
            arr = np.asarray(pil, np.int32)
            add = int(110 * frac)
            arr = np.where(arr < 128, np.clip(arr + add, 0, 255), arr)
            pil = Image.fromarray(arr.astype(np.uint8))
        elif name in ("color", "contrast", "brightness", "sharpness"):
            enh = {"color": ImageEnhance.Color,
                   "contrast": ImageEnhance.Contrast,
                   "brightness": ImageEnhance.Brightness,
                   "sharpness": ImageEnhance.Sharpness}[name]
            pil = enh(pil).enhance(1.0 + sign * 0.9 * frac)
        elif name in ("shear_x", "shear_y"):
            s = sign * 0.3 * frac
            mat = (1, s, 0, 0, 1, 0) if name == "shear_x" else (1, 0, 0, s, 1, 0)
            pil = pil.transform(pil.size, Image.AFFINE, mat,
                                resample=Image.BILINEAR)
        else:  # translate_x / translate_y (relative, ±0.45)
            t = sign * 0.45 * frac
            dx = t * pil.size[0] if name == "translate_x" else 0
            dy = t * pil.size[1] if name == "translate_y" else 0
            pil = pil.transform(pil.size, Image.AFFINE, (1, 0, dx, 0, 1, dy),
                                resample=Image.BILINEAR)
    return np.asarray(pil, np.float32) / 255.0


def _random_erase(rng: np.random.Generator, x: np.ndarray,
                  prob: float = 0.25, scale=(0.02, 0.33),
                  ratio=(0.3, 3.3)) -> np.ndarray:
    """timm RandomErasing 'pixel' mode on the normalized tensor."""
    if rng.random() >= prob:
        return x
    h, w = x.shape[:2]
    area = h * w
    for _ in range(10):
        target = rng.uniform(*scale) * area
        ar = math.exp(rng.uniform(math.log(ratio[0]), math.log(ratio[1])))
        eh, ew = int(round(math.sqrt(target * ar))), int(
            round(math.sqrt(target / ar)))
        if eh < h and ew < w and eh > 0 and ew > 0:
            top = rng.integers(0, h - eh + 1)
            left = rng.integers(0, w - ew + 1)
            x = x.copy()
            x[top:top + eh, left:left + ew] = rng.standard_normal(
                (eh, ew, x.shape[2])).astype(np.float32)
            return x
    return x


class FinetuneDataset:
    """Train: RRC(0.08-1)+hflip → RandAugment → normalize → RandomErasing.
    Eval: center resize → normalize.  Yields {'image', 'label_id'}."""

    def __init__(self, base, size: int, train: bool, seed: int = 0,
                 reprob: float = 0.25, randaug: bool = True):
        self.base, self.size, self.train = base, size, train
        self.seed, self.reprob, self.randaug = seed, reprob, randaug
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Re-randomize the per-sample augmentations each epoch (the
        DataLoader calls this; timm/MAE recipe parity — a fixed (seed, i)
        stream would show every image ONE augmented view all run)."""
        self._epoch = epoch

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i):
        item = self.base[i]
        img = (np.asarray(item["image"], np.float32) + 1.0) / 2.0
        if self.train:
            rng = np.random.default_rng((self.seed, self._epoch, i))
            img = random_resized_crop(rng, img, self.size,
                                      scale=(0.08, 1.0))
            if self.randaug:
                img = _rand_augment(rng, img)
            img = (img - IMAGENET_MEAN) / IMAGENET_STD
            img = _random_erase(rng, img, prob=self.reprob)
        else:
            from .pretrain_common import _resize_np

            img = (_resize_np(img, self.size) - IMAGENET_MEAN) / IMAGENET_STD
        lab = item.get("label_id")
        if lab is None:
            lab = int(np.argmax(item["label"]))
        return {"image": np.ascontiguousarray(img, np.float32),
                "label_id": np.int32(lab)}


# ----------------------------------------------------------------------
# train / eval steps
# ----------------------------------------------------------------------

def make_finetune_train_step(model: ViTClassifier, tx, num_classes: int, *,
                             mixup_alpha: float, cutmix_alpha: float,
                             smoothing: float, mixup_prob: float = 1.0,
                             switch_prob: float = 0.5):
    mixup_on = mixup_alpha > 0 or cutmix_alpha > 0

    @jax.jit
    def step(params, opt_state, x, y, rng):
        rng_mix, rng_dp = jax.random.split(rng)
        if mixup_on:
            x, targets = apply_mixup(
                rng_mix, x, y, num_classes, mixup_alpha=mixup_alpha,
                cutmix_alpha=cutmix_alpha, prob=mixup_prob,
                switch_prob=switch_prob, smoothing=smoothing)
        else:
            targets = _smooth_onehot(y, num_classes, smoothing)

        def loss_fn(p):
            logits = model.apply({"params": p}, x, train=True,
                                 rngs={"drop_path": rng_dp})
            return soft_target_ce(logits, targets)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_finetune_eval_step(model: ViTClassifier):
    @jax.jit
    def step(params, x, y):
        logits = model.apply({"params": params}, x, train=False)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()
        top1 = jnp.mean(jnp.argmax(logits, -1) == y)
        top5 = jnp.mean(jnp.any(
            jax.lax.top_k(logits, min(5, logits.shape[-1]))[1] == y[:, None],
            axis=-1))
        return loss, top1, top5

    return step


# ----------------------------------------------------------------------
# driver
# ----------------------------------------------------------------------

def train_finetune(args) -> Path:
    from flax import serialization

    from ..data.loader import DataLoader
    from .mae_train import _build_dataset
    from .pretrain_common import load_encoder_ckpt

    base_train = _build_dataset(args.ds, args.input_size, args.n_train)
    base_val = _build_dataset(args.ds, args.input_size, args.n_val)
    ds_train = FinetuneDataset(base_train, args.input_size, train=True,
                               seed=args.seed, reprob=args.reprob,
                               randaug=not args.no_randaug)
    ds_val = FinetuneDataset(base_val, args.input_size, train=False)

    encoder = VisionTransformer(
        patch_size=args.patch_size, embed_dim=args.embed_dim,
        depth=args.depth, num_heads=args.num_heads,
        pretrain_img_size=args.input_size, drop_path_rate=args.drop_path)
    model = ViTClassifier(encoder=encoder, num_classes=args.nb_classes,
                          global_pool=not args.cls_token)
    params = model.init(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, args.input_size, args.input_size, 3)))["params"]

    if args.finetune:
        # the head/fc_norm stay freshly initialized; pos-embed size
        # mismatches need no interpolation step here — our encoder
        # interpolates at apply time (models/vit.py interpolate_pos_embed)
        params = dict(params)
        params["encoder"] = load_encoder_ckpt(args.finetune,
                                              params["encoder"])
        logger.info(f"loaded pretrained encoder from {args.finetune}")

    steps_per_epoch = max(len(ds_train) // args.batch_size, 1)
    eff_bs = args.batch_size
    lr = args.lr if args.lr is not None else args.blr * eff_bs / 256.0
    sched = mae_lr_schedule(lr, args.min_lr, args.warmup_epochs,
                            args.epochs, steps_per_epoch)
    tx = make_finetune_tx(params, sched, weight_decay=args.weight_decay,
                          layer_decay=args.layer_decay, depth=args.depth,
                          clip_grad=args.clip_grad)
    opt_state = tx.init(params)

    train_step = make_finetune_train_step(
        model, tx, args.nb_classes, mixup_alpha=args.mixup,
        cutmix_alpha=args.cutmix, smoothing=args.smoothing)
    eval_step = make_finetune_eval_step(model)

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)
    best_acc, step_i = 0.0, 0
    for epoch in range(args.epochs):
        ds_train.set_epoch(epoch)  # fresh augmentations every epoch
        dl = DataLoader(ds_train, batch_size=args.batch_size, shuffle=True,
                        drop_last=True, seed=args.seed + epoch)
        losses = []
        for batch in dl:
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(batch["image"]),
                jnp.asarray(batch["label_id"]), sub)
            losses.append(float(loss))
            step_i += 1
        stats = []
        dl_val = DataLoader(ds_val, batch_size=args.batch_size,
                            shuffle=False, drop_last=False)
        for batch in dl_val:
            lo, t1, t5 = eval_step(params, jnp.asarray(batch["image"]),
                                   jnp.asarray(batch["label_id"]))
            stats.append((float(lo), float(t1), float(t5),
                          len(batch["label_id"])))
        n = sum(s[3] for s in stats)
        acc1 = sum(s[1] * s[3] for s in stats) / n
        acc5 = sum(s[2] * s[3] for s in stats) / n
        logger.info(
            f"epoch {epoch}: train_loss {np.mean(losses):.4f} "
            f"val acc1 {acc1:.4f} acc5 {acc5:.4f} "
            f"lr {float(sched(step_i)):.2e}")
        if acc1 >= best_acc:
            best_acc = acc1
            path = out_dir / "finetuned.msgpack"
            path.write_bytes(serialization.to_bytes(params))
            # the fine-tuned ENCODER is also exportable for the
            # SSLBackbone zoo (feat extraction from a finetuned trunk)
            save_encoder_ckpt(
                out_dir / "finetuned_encoder.msgpack", params["encoder"],
                meta={"arch": "vit", "patch_size": args.patch_size,
                      "embed_dim": args.embed_dim, "depth": args.depth,
                      "num_heads": args.num_heads,
                      "pretrain_img_size": args.input_size,
                      "method": "mae_finetune"})
    logger.info(f"best val acc1 {best_acc:.4f}")
    return out_dir / "finetuned.msgpack"


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("MAE fine-tuning (TPU)")
    p.add_argument("--ds", default="synthetic")
    p.add_argument("--n_train", type=int, default=512)
    p.add_argument("--n_val", type=int, default=128)
    p.add_argument("--nb_classes", type=int, default=10)
    p.add_argument("--input_size", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--patch_size", type=int, default=8)
    p.add_argument("--embed_dim", type=int, default=192)
    p.add_argument("--depth", type=int, default=6)
    p.add_argument("--num_heads", type=int, default=3)
    p.add_argument("--drop_path", type=float, default=0.1)
    p.add_argument("--clip_grad", type=float, default=None)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--blr", type=float, default=1e-3)
    p.add_argument("--layer_decay", type=float, default=0.75)
    p.add_argument("--min_lr", type=float, default=1e-6)
    p.add_argument("--warmup_epochs", type=float, default=5)
    p.add_argument("--smoothing", type=float, default=0.1)
    p.add_argument("--mixup", type=float, default=0.0)
    p.add_argument("--cutmix", type=float, default=0.0)
    p.add_argument("--reprob", type=float, default=0.25)
    p.add_argument("--no_randaug", action="store_true")
    p.add_argument("--finetune", default="",
                   help="pretrained encoder .msgpack (mae_train export)")
    p.add_argument("--cls_token", action="store_true",
                   help="CLS head instead of global average pool")
    p.add_argument("--output_dir", default="./output_finetune")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None) -> None:
    train_finetune(build_argparser().parse_args(argv))


if __name__ == "__main__":
    main()
