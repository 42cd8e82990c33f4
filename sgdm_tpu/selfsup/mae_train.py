"""MAE pre-training: the full trainer.

TPU-native rewrite of `self_sl/mae/main_pretrain.py:107` +
`engine_pretrain.py`: the masked-autoencoder core (`selfsup.mae.MAE`) in a
jitted train step with the official optimization recipe —

  * AdamW(betas=(0.9, 0.95)), weight decay 0.05 masked off 1-dim params
    (optim_factory.add_weight_decay; main_pretrain.py:179-180),
  * effective lr = blr · eff_batch/256 (:163-166),
  * per-iteration half-cosine lr with linear warmup epochs
    (util/lr_sched.py:9-21; epoch is fractional per iteration),
  * mask_ratio 0.75, per-patch-normalized pixel loss on masked patches
    (mae.py mae_loss; norm_pix semantics),
  * RandomResizedCrop(scale=(0.2, 1)) + hflip augmentation.

CLI (tiny CPU defaults so the integration test runs):
  python -m sgdm_tpu.selfsup.mae_train --ds synthetic --epochs 1 ...
exports the ENCODER params in VisionTransformer layout (.msgpack + meta) so
SSLBackbone/feat-extraction loads them directly.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils.logging import logger
from .mae import MAE, mae_loss
from .pretrain_common import random_resized_crop, save_encoder_ckpt, wd_mask

__all__ = ["train_mae", "main", "mae_lr_schedule"]


def mae_lr_schedule(lr: float, min_lr: float, warmup_epochs: float,
                    epochs: float, steps_per_epoch: int):
    """util/lr_sched.py:9-21 adjust_learning_rate with fractional epoch."""

    def f(step):
        e = jnp.asarray(step, jnp.float32) / steps_per_epoch
        warm = lr * e / jnp.maximum(warmup_epochs, 1e-8)
        cos = min_lr + (lr - min_lr) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * (e - warmup_epochs)
                          / jnp.maximum(epochs - warmup_epochs, 1e-8))
        )
        return jnp.where(e < warmup_epochs, warm, cos)

    return f


class AugmentedDataset:
    """RandomResizedCrop(0.2-1) + hflip + ImageNet normalization
    (main_pretrain.py:123-127 transform_train parity — the Normalize step
    matters: every consumer of the exported encoder
    (`ssl_backbone.transform_batch`, `mae_finetune.FinetuneDataset`)
    normalizes its inputs, so the encoder must be trained on the same
    distribution).  `set_epoch` re-randomizes the augmentations each
    epoch (torch DataLoader parity)."""

    def __init__(self, base, size: int, seed: int = 0):
        self.base = base
        self.size = size
        self.seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i):
        from .ssl_backbone import IMAGENET_MEAN, IMAGENET_STD

        img = np.asarray(self.base[i]["image"], dtype=np.float32)
        img = (img + 1.0) / 2.0
        rng = np.random.default_rng((self.seed, self._epoch, i))
        img = random_resized_crop(rng, img, self.size, scale=(0.2, 1.0))
        return {"image": (img - IMAGENET_MEAN) / IMAGENET_STD}


def make_mae_full_train_step(model: MAE, tx: optax.GradientTransformation):
    @jax.jit
    def step(params, opt_state, x, rng):
        def loss_fn(params):
            pred, target, mask = model.apply({"params": params}, x, rng)
            return mae_loss(pred, target, mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def _build_dataset(ds: str, size: int, n: int):
    if ds == "synthetic":
        from ..data.synthetic import SyntheticImages

        return SyntheticImages(size=size, length=n, num_classes=10)
    if ds == "cifar10":
        from ..data.cifar10 import CIFAR10

        return CIFAR10(root="/root/data", train=True)
    if ds == "in32p":
        from ..data.imagenet_pickle import ImageNetPickle

        return ImageNetPickle(root="/root/data/in32", train=True, image_size=size)
    raise ValueError(ds)


def train_mae(args) -> Path:
    from ..data.loader import DataLoader

    model = MAE(
        patch_size=args.patch_size, embed_dim=args.embed_dim,
        depth=args.depth, num_heads=args.num_heads,
        decoder_dim=args.decoder_dim, decoder_depth=args.decoder_depth,
        decoder_heads=args.decoder_heads, mask_ratio=args.mask_ratio,
        pretrain_img_size=args.input_size,
    )
    base = _build_dataset(args.ds, max(args.input_size, 32), args.data_len)
    dataset = AugmentedDataset(base, args.input_size)
    dl = DataLoader(dataset, batch_size=args.batch_size, shuffle=True,
                    num_workers=args.workers, seed=args.seed)
    steps_per_epoch = max(len(dl), 1)

    eff_lr = args.blr * args.batch_size / 256.0  # main_pretrain.py:163-166
    lr_fn = mae_lr_schedule(eff_lr, args.min_lr, args.warmup_epochs,
                            args.epochs, steps_per_epoch)

    rng = jax.random.PRNGKey(args.seed)
    x0 = jnp.zeros((1, args.input_size, args.input_size, 3))
    params = model.init(rng, x0, jax.random.fold_in(rng, 0))["params"]

    tx = optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.95),
        optax.add_decayed_weights(args.weight_decay, mask=wd_mask),
        optax.scale_by_schedule(lambda s: -lr_fn(s)),
    )
    opt_state = tx.init(params)
    step_fn = make_mae_full_train_step(model, tx)

    it = 0
    for epoch in range(args.epochs):
        dl.set_epoch(epoch)
        dataset.set_epoch(epoch)  # fresh augmentations every epoch
        for raw in dl:
            x = jnp.asarray(raw["image"], jnp.float32)
            params, opt_state, loss = step_fn(
                params, opt_state, x, jax.random.fold_in(rng, it + 1)
            )
            if it % args.log_every == 0:
                logger.info(f"mae epoch {epoch} it {it} loss {float(loss):.4f}")
            it += 1

    out = Path(args.out)
    encoder = model.encoder_params_for_backbone(
        jax.tree.map(np.asarray, params)
    )
    save_encoder_ckpt(out, encoder, meta={
        "arch": "vit", "patch_size": args.patch_size,
        "embed_dim": args.embed_dim, "depth": args.depth,
        "num_heads": args.num_heads, "pretrain_img_size": args.input_size,
        "method": "mae",
    })
    logger.info(f"saved MAE encoder → {out}")
    return out


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ds", default="synthetic",
                   choices=["synthetic", "cifar10", "in32p"])
    p.add_argument("--data-len", type=int, default=256)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    # model (tiny CPU defaults; paper: mae_vit_base_patch16 @ 224)
    p.add_argument("--input-size", type=int, default=32)
    p.add_argument("--patch-size", type=int, default=8)
    p.add_argument("--embed-dim", type=int, default=64)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--num-heads", type=int, default=2)
    p.add_argument("--decoder-dim", type=int, default=32)
    p.add_argument("--decoder-depth", type=int, default=1)
    p.add_argument("--decoder-heads", type=int, default=2)
    p.add_argument("--mask-ratio", type=float, default=0.75)
    # optimization (main_pretrain.py defaults)
    p.add_argument("--blr", type=float, default=1e-3)
    p.add_argument("--min-lr", type=float, default=0.0)
    p.add_argument("--warmup-epochs", type=float, default=0.25)
    p.add_argument("--weight-decay", type=float, default=0.05)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--out", default="outputs/mae_encoder.msgpack")
    return p


def main(argv=None) -> None:
    import os

    if os.environ.get("SGDM_FORCE_CPU"):
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    train_mae(build_argparser().parse_args(argv))


if __name__ == "__main__":
    main()
