"""MSN pre-training: the full trainer (Masked Siamese Networks).

TPU-native rewrite of the vendored MSN stack
(`self_sl/msn/src/msn_train.py:66 main` + `src/losses.py` +
`src/data_manager.py`), structured as one jitted train step in a plain epoch
loop:

  * multi-crop: 1 target view + `rand_views` anchor views at `rand_size` +
    `focal_views` small crops at `focal_size` (msn_train.py:182-198),
  * anchor patch_drop — a random subset of patch tokens is KEPT (deit.py
    forward patch_drop) via `VisionTransformer(..., patch_keep_ids=...)`,
  * prototypes trained jointly; snn soft-assignment at temperature tau with
    targets sharpened at scheduled T (losses.py:17-89, incl. the
    `targets.repeat(num_views)` and the me-max `+ log(K)` constant),
  * AdamW + WarmupCosineSchedule lr + CosineWDSchedule wd with 1-dim/bias
    params excluded from decay (init_opt, msn_train.py:518-560),
  * EMA target encoder with the linear momentum ramp 0.996→1.0 over
    1.25·total steps (:253-255), sharpen ramp likewise (:257-259).

CLI (CPU-friendly tiny config is the default so the integration test runs):
  python -m sgdm_tpu.selfsup.msn_train --ds synthetic --epochs 1 ...
exports an SSLBackbone-loadable encoder checkpoint (.msgpack + .json meta).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.vit import VisionTransformer
from ..utils.logging import logger
from .pretrain_common import (
    linear_ramp,
    multicrop_views,
    save_encoder_ckpt,
    scheduled_weight_decay,
    warmup_cosine_lr,
    wd_mask,
)

__all__ = ["msn_multiview_loss", "make_msn_full_train_step", "train_msn", "main"]


def msn_multiview_loss(
    anchor_emb: jax.Array,   # [V*B, D] all anchor views, view-major
    target_emb: jax.Array,   # [B, D] target (EMA) view
    prototypes: jax.Array,   # [K, D]
    *,
    num_views: int,
    tau: float = 0.1,
    T: jax.Array | float = 0.25,
    memax_weight: float = 1.0,
    ent_weight: float = 0.0,
):
    """Parity: self_sl/msn/src/losses.py:17-89 (snn at tau for both sides,
    targets sharpened at T and repeated per anchor view, me-max + log K)."""

    def snn(query, temp):
        q = query / jnp.maximum(jnp.linalg.norm(query, axis=-1, keepdims=True), 1e-12)
        s = prototypes / jnp.maximum(
            jnp.linalg.norm(prototypes, axis=-1, keepdims=True), 1e-12
        )
        return jax.nn.softmax(q @ s.T / temp, axis=-1)

    probs = snn(anchor_emb, tau)
    targets = snn(jax.lax.stop_gradient(target_emb), tau)
    targets = targets ** (1.0 / T)
    targets = targets / targets.sum(-1, keepdims=True)
    targets = jax.lax.stop_gradient(jnp.tile(targets, (num_views, 1)))

    ploss = -(targets * jnp.log(probs + 1e-12)).sum(-1).mean()
    avg = probs.mean(0)
    rloss = (avg * jnp.log(avg + 1e-12)).sum() + jnp.log(float(avg.shape[0]))
    sloss = (-(probs * jnp.log(probs + 1e-12)).sum(-1)).mean()  # H(probs)
    loss = ploss + memax_weight * rloss + ent_weight * sloss
    aux = {"ploss": ploss, "me_max": rloss, "ent": sloss,
           "max_t": targets.max(-1).mean()}
    return loss, aux


def _views_first(x: jax.Array) -> jax.Array:
    """[B, V, ...] → [V*B, ...] VIEW-major (all of view 0, then view 1, …).

    msn_multiview_loss tiles the per-sample targets view-major
    (`jnp.tile(targets, (num_views, 1))` = num_views B-blocks), so the
    anchor rows must be ordered the same way; a plain batch-major
    `reshape(B*V, ...)` would pair most anchor views with ANOTHER
    sample's target (row B+j would meet target j%B, not j//V)."""
    b, v = x.shape[:2]
    return x.transpose(1, 0, *range(2, x.ndim)).reshape(v * b, *x.shape[2:])


def _keep_ids(rng, b, n, patch_drop):
    n_keep = max(int(n * (1.0 - patch_drop)), 1)
    noise = jax.random.uniform(rng, (b, n))
    return jnp.argsort(noise, axis=1)[:, :n_keep]


def make_msn_full_train_step(
    encoder: VisionTransformer,
    tx: optax.GradientTransformation,
    *,
    rand_size: int,
    focal_size: int,
    rand_views: int,
    focal_views: int,
    patch_drop: float = 0.15,
    tau: float = 0.1,
    memax_weight: float = 1.0,
    ent_weight: float = 0.0,
):
    p = encoder.patch_size
    n_rand = (rand_size // p) ** 2
    n_focal = (focal_size // p) ** 2
    num_views = rand_views + focal_views

    @jax.jit
    def step(params, target_params, prototypes, opt_state, batch, rng, m, T):
        """batch: {'target' [B,R,R,3], 'anchors' [B,V,R,R,3],
        'focals' [B,F,f,f,3]}; m = EMA momentum; T = sharpen temp."""
        kr, kf = jax.random.split(rng)
        b = batch["target"].shape[0]

        def loss_fn(trainables):
            enc_params, protos = trainables

            def enc(x, keep):
                return encoder.apply({"params": enc_params}, x,
                                     out="cls", patch_keep_ids=keep)

            embs = []
            a = _views_first(batch["anchors"])
            embs.append(enc(a, _keep_ids(kr, a.shape[0], n_rand, patch_drop)))
            if focal_views:
                f = _views_first(batch["focals"])
                embs.append(enc(f, _keep_ids(kf, f.shape[0], n_focal, patch_drop)))
            anchor_emb = jnp.concatenate(embs, axis=0)
            target_emb = encoder.apply(
                {"params": target_params}, batch["target"], out="cls"
            )
            return msn_multiview_loss(
                anchor_emb, target_emb, protos,
                num_views=num_views, tau=tau, T=T,
                memax_weight=memax_weight, ent_weight=ent_weight,
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            (params, prototypes)
        )
        updates, opt_state = tx.update(grads, opt_state, (params, prototypes))
        params, prototypes = optax.apply_updates((params, prototypes), updates)
        # momentum update of the target encoder (msn_train.py:374-378)
        target_params = jax.tree.map(
            lambda t, q: m * t + (1.0 - m) * q, target_params, params
        )
        return params, target_params, prototypes, opt_state, loss, aux

    return step


class MultiCropDataset:
    """Wrap any image dataset (dict with 'image' in [-1,1] NHWC) into
    ImageNet-normalized multi-crop views (data_manager.py:85-103
    make_multicrop_transform parity — the Normalize step matters: the
    exported encoder's consumers all normalize their inputs).  `set_epoch`
    re-randomizes the crops each epoch."""

    def __init__(self, base, *, rand_size, focal_size, rand_views,
                 focal_views, seed=0):
        self.base = base
        self.kw = dict(rand_size=rand_size, focal_size=focal_size,
                       rand_views=rand_views, focal_views=focal_views)
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
        views = multicrop_views(rng, img, **self.kw)
        return {k: (v - IMAGENET_MEAN) / IMAGENET_STD
                for k, v in views.items()}


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


def train_msn(args) -> Path:
    from ..data.loader import DataLoader

    encoder = VisionTransformer(
        patch_size=args.patch_size, embed_dim=args.embed_dim,
        depth=args.depth, num_heads=args.num_heads,
        pretrain_img_size=args.rand_size,
    )
    base = _build_dataset(args.ds, max(args.rand_size, 32), args.data_len)
    dataset = MultiCropDataset(
        base, rand_size=args.rand_size, focal_size=args.focal_size,
        rand_views=args.rand_views, focal_views=args.focal_views,
    )
    dl = DataLoader(dataset, batch_size=args.batch_size, shuffle=True,
                    num_workers=args.workers, seed=args.seed)
    steps_per_epoch = max(len(dl), 1)
    total = steps_per_epoch * args.epochs

    rng = jax.random.PRNGKey(args.seed)
    x0 = jnp.zeros((1, args.rand_size, args.rand_size, 3))
    params = encoder.init(rng, x0)["params"]
    target_params = jax.tree.map(jnp.copy, params)
    prototypes = jax.random.normal(
        jax.random.fold_in(rng, 1), (args.num_proto, args.embed_dim)
    ) * 0.025

    lr_fn = warmup_cosine_lr(args.start_lr, args.lr, args.final_lr,
                             warmup_steps=args.warmup * steps_per_epoch,
                             total_steps=total)

    def mask_fn(trainables):
        enc_mask = wd_mask(trainables[0])
        return (enc_mask, False)  # prototypes: WD_exclude (init_opt :539-545)

    tx = optax.chain(
        optax.clip_by_global_norm(args.clip_grad) if args.clip_grad > 0
        else optax.identity(),
        optax.scale_by_adam(),
        scheduled_weight_decay(args.wd, args.final_wd, total, mask=mask_fn),
        optax.scale_by_schedule(lambda s: -lr_fn(s)),
    )
    opt_state = tx.init((params, prototypes))
    step_fn = make_msn_full_train_step(
        encoder, tx, rand_size=args.rand_size, focal_size=args.focal_size,
        rand_views=args.rand_views, focal_views=args.focal_views,
        patch_drop=args.patch_drop, tau=args.tau,
        memax_weight=args.memax_weight, ent_weight=args.ent_weight,
    )
    m_fn = linear_ramp(args.momentum, 1.0, total)
    T_fn = linear_ramp(args.start_sharpen, args.final_sharpen, total)

    it = 0
    for epoch in range(args.epochs):
        dl.set_epoch(epoch)
        dataset.set_epoch(epoch)  # fresh augmentations every epoch
        for raw in dl:
            batch = {k: jnp.asarray(v, jnp.float32) for k, v in raw.items()}
            srng = jax.random.fold_in(rng, it + 2)
            params, target_params, prototypes, opt_state, loss, aux = step_fn(
                params, target_params, prototypes, opt_state, batch, srng,
                jnp.float32(m_fn(it)), jnp.float32(T_fn(it)),
            )
            if it % args.log_every == 0:
                logger.info(
                    f"msn epoch {epoch} it {it} loss {float(loss):.4f} "
                    f"ploss {float(aux['ploss']):.4f} "
                    f"me_max {float(aux['me_max']):.4f}"
                )
            it += 1

    out = Path(args.out)
    save_encoder_ckpt(out, params, meta={
        "arch": "vit", "patch_size": args.patch_size,
        "embed_dim": args.embed_dim, "depth": args.depth,
        "num_heads": args.num_heads, "pretrain_img_size": args.rand_size,
        "method": "msn",
    })
    logger.info(f"saved MSN encoder → {out}")
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
    # model (defaults tiny for CPU; paper: patch 16, 384/12/6 @ 224)
    p.add_argument("--patch-size", type=int, default=8)
    p.add_argument("--embed-dim", type=int, default=64)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--num-heads", type=int, default=2)
    # views (paper: rand 224×2... actually 1 rand anchor + 10 focal 96px)
    p.add_argument("--rand-size", type=int, default=32)
    p.add_argument("--focal-size", type=int, default=16)
    p.add_argument("--rand-views", type=int, default=1)
    p.add_argument("--focal-views", type=int, default=2)
    p.add_argument("--patch-drop", type=float, default=0.15)
    # criterion (self_sl/msn defaults)
    p.add_argument("--num-proto", type=int, default=64)
    p.add_argument("--tau", type=float, default=0.1)
    p.add_argument("--start-sharpen", type=float, default=0.25)
    p.add_argument("--final-sharpen", type=float, default=0.25)
    p.add_argument("--memax-weight", type=float, default=1.0)
    p.add_argument("--ent-weight", type=float, default=0.0)
    # optimization
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--start-lr", type=float, default=2e-4)
    p.add_argument("--final-lr", type=float, default=1e-6)
    p.add_argument("--warmup", type=int, default=1, help="warmup epochs")
    p.add_argument("--wd", type=float, default=0.04)
    p.add_argument("--final-wd", type=float, default=0.4)
    p.add_argument("--momentum", type=float, default=0.996)
    p.add_argument("--clip-grad", type=float, default=3.0)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--out", default="outputs/msn_encoder.msgpack")
    return p


def main(argv=None) -> None:
    import os

    if os.environ.get("SGDM_FORCE_CPU"):
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    train_msn(build_argparser().parse_args(argv))


if __name__ == "__main__":
    main()
