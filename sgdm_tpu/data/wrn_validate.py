"""WRN validation trainer for the downsampled-ImageNet pickles.

TPU-native port of the last reference source file with runnable logic
(ref: side_repo/Imagenet32_Scripts/WRNs_imagenet.py:1-462): a
pre-activation Wide-ResNet classifier (Zagoruyko & Komodakis WRN on the
"Identity Mappings" full-pre-activation layout, SGDR-era Lasagne recipe)
trained directly on the `train_data_batch_1..10` / `val_data` pickles to
sanity-check a freshly-packed dataset — reporting top-1/top-5 like the
Chrabaszcz downsampled-ImageNet paper.

Reference quirks kept (WRNs_imagenet.py):
  * stem + each block's conv_1 are `batch_norm(ConvLayer(...))` — conv
    → BN → ReLU with the conv BIAS REMOVED by the lasagne wrapper
    (:149-150,183); conv_2 keeps its bias (:157-159);
  * first block of stack 1 has NO pre-activation and a 1×1 projection
    (:140-142,168-171); `increase_dim` blocks stride-2 both conv_1 and
    a bias-free 1×1 projection FROM THE RAW INPUT, not the
    pre-activation (:163-166);
  * stacks: 16 stem, then n blocks each at 16k/32k (+64k at ≥32 px,
    +128k at ≥64 px) (:130,185-205);
  * data pipeline: x/255, subtract the TRAIN mean image (val too,
    :61-82), horizontal-flip DOUBLING of every train batch (:108-113),
    pad-4 random crop augmentation (:233-241);
  * SGD momentum 0.9, L2 `reg_fac` on the *regularizable* params only
    (conv/dense kernels, not biases/BN, :287-289), LR ×`lr_fac` at
    epochs E1/E2/E3 (:407-410), batch 128, val batch 500;
  * resume (`-c`) restores params + optimizer velocity + epoch and
    replays the LR schedule (:321-336).

TPU-first: the step is one jitted program (forward + CE loss + L2 + SGD
momentum update, donated state); augmentation stays host-side numpy like
the reference (32-64 px rows are loader-cheap).
"""

from __future__ import annotations

import pickle
import time
from argparse import ArgumentParser
from functools import partial
from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.logging import logger

__all__ = ["WideResNet", "train_wrn", "main", "load_databatch",
           "load_validation_data"]

he_relu = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
he_lin = nn.initializers.variance_scaling(1.0, "fan_in", "normal")


def _conv(feat: int, stride: int = 1, bias: bool = True, name: str | None = None,
          dtype: Any = jnp.float32, kernel=(3, 3)):
    return nn.Conv(feat, kernel, strides=(stride, stride), padding="SAME",
                   use_bias=bias, kernel_init=he_relu, dtype=dtype, name=name)


class _BN(nn.Module):
    """lasagne BatchNormLayer defaults: eps 1e-4, alpha(=1-momentum) 0.1."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-4, dtype=self.dtype, name="bn")(x)


class ResidualBlock(nn.Module):
    filters: int
    first: bool = False
    increase_dim: bool = False
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        stride = 2 if self.increase_dim else 1
        if self.first:
            pre = x  # no pre-activation on the very first block (:140-142)
        else:
            pre = nn.relu(_BN(self.dtype, name="bn_pre")(x, train))
        # conv_1 = batch_norm(ConvLayer(...)): conv (bias dropped) → BN → ReLU
        h = _conv(self.filters, stride, bias=False, dtype=self.dtype,
                  name="conv1")(pre)
        h = nn.relu(_BN(self.dtype, name="bn1")(h, train))
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = _conv(self.filters, 1, bias=True, dtype=self.dtype, name="conv2")(h)
        if self.increase_dim:
            # bias-free 1×1 stride-2 projection from the RAW input (:163-166)
            sc = _conv(self.filters, 2, bias=False, kernel=(1, 1),
                       dtype=self.dtype, name="proj")(x)
        elif self.first:
            sc = _conv(self.filters, 1, bias=False, kernel=(1, 1),
                       dtype=self.dtype, name="proj")(x)
        else:
            sc = x
        return h + sc


class WideResNet(nn.Module):
    """ResNet_FullPre_Wide (WRNs_imagenet.py:123-216), NHWC."""

    nout: int = 1000
    n: int = 4
    k: float = 1.0
    dropout: float = 0.0
    img_size: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        widths = [int(16 * self.k), int(32 * self.k)]
        if self.img_size >= 32:
            widths.append(int(64 * self.k))
        if self.img_size >= 64:
            widths.append(int(128 * self.k))
        h = _conv(16, 1, bias=False, dtype=self.dtype, name="stem")(x)
        h = nn.relu(_BN(self.dtype, name="bn_stem")(h, train))
        for s, w in enumerate(widths):
            h = ResidualBlock(w, first=(s == 0), increase_dim=(s > 0),
                              dropout=self.dropout, dtype=self.dtype,
                              name=f"stack{s}_block0")(h, train)
            for b in range(1, self.n):
                h = ResidualBlock(w, dropout=self.dropout, dtype=self.dtype,
                                  name=f"stack{s}_block{b}")(h, train)
        h = nn.relu(_BN(self.dtype, name="bn_post")(h, train))
        h = h.mean(axis=(1, 2))  # GlobalPoolLayer
        return nn.Dense(self.nout, kernel_init=he_lin, dtype=self.dtype,
                        name="fc")(h)  # logits (ref applies softmax in-loss)


# ---------------------------------------------------------------------------
# data (load_databatch / load_validation_data parity, NHWC)
# ---------------------------------------------------------------------------

def _planar_to_nhwc(x: np.ndarray, img_size: int) -> np.ndarray:
    s2 = img_size * img_size
    x = np.dstack((x[:, :s2], x[:, s2:2 * s2], x[:, 2 * s2:]))
    return x.reshape(x.shape[0], img_size, img_size, 3)


def load_databatch(folder: str | Path, idx: int, img_size: int = 32) -> dict:
    d = pickle.load(open(Path(folder) / f"train_data_batch_{idx}", "rb"))
    x = d["data"] / np.float32(255)
    mean = d["mean"] / np.float32(255)
    y = np.asarray([i - 1 for i in d["labels"]], np.int32)
    x -= mean
    x = _planar_to_nhwc(x, img_size)
    # mirrored-image doubling (:108-113)
    x = np.concatenate([x, x[:, :, ::-1, :]], axis=0)
    y = np.concatenate([y, y], axis=0)
    return {"X": x.astype(np.float32), "Y": y, "mean": mean}


def load_validation_data(folder: str | Path, mean: np.ndarray,
                         img_size: int = 32) -> dict:
    d = pickle.load(open(Path(folder) / "val_data", "rb"))
    x = d["data"] / np.float32(255) - mean
    y = np.asarray([i - 1 for i in d["labels"]], np.int32)
    return {"X": _planar_to_nhwc(x, img_size).astype(np.float32), "Y": y}


def iterate_minibatches(x, y, bs, rng: np.random.RandomState | None = None,
                        augment: bool = False, img_size: int = 32):
    """Shuffle + pad-4 random-crop augmentation (:223-247)."""
    idx = np.arange(len(x))
    if rng is not None:
        rng.shuffle(idx)
    for s in range(0, len(x) - bs + 1, bs):
        sel = idx[s:s + bs]
        xb = x[sel]
        if augment:
            padded = np.pad(xb, ((0, 0), (4, 4), (4, 4), (0, 0)))
            crops = rng.randint(0, 9, size=(bs, 2))
            xb = np.stack([padded[i, r:r + img_size, c:c + img_size]
                           for i, (r, c) in enumerate(crops)])
        yield xb, y[sel]


# ---------------------------------------------------------------------------
# train/eval steps
# ---------------------------------------------------------------------------

def _l2_of_kernels(params) -> jax.Array:
    """lasagne regularize_layer_params(all_layers, l2): *regularizable*
    params only — conv/dense kernels, not biases/BN (:287-289)."""
    total = 0.0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        if any(getattr(p, "key", None) == "kernel" for p in path):
            total = total + jnp.sum(leaf.astype(jnp.float32) ** 2)
    return total


def make_wrn_steps(model: WideResNet, reg_fac: float, momentum: float = 0.9):
    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, bn_state, velocity, xb, yb, lr, key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": bn_state}, xb, train=True,
                mutable=["batch_stats"], rngs={"dropout": key})
            ce = -jnp.mean(jax.nn.log_softmax(out.astype(jnp.float32))[
                jnp.arange(out.shape[0]), yb])
            return ce + reg_fac * _l2_of_kernels(p), (ce, mut["batch_stats"])

        grads, (ce, bn_state) = jax.grad(loss_fn, has_aux=True)(params)
        # lasagne.updates.momentum: v' = m·v - lr·g ; p' = p + v'
        velocity = jax.tree.map(lambda v, g: momentum * v - lr * g,
                                velocity, grads)
        params = jax.tree.map(lambda p, v: p + v, params, velocity)
        return params, bn_state, velocity, ce

    @jax.jit
    def eval_step(params, bn_state, xb, yb):
        out = model.apply({"params": params, "batch_stats": bn_state}, xb,
                          train=False).astype(jnp.float32)
        logp = jax.nn.log_softmax(out)
        ce = -jnp.mean(logp[jnp.arange(out.shape[0]), yb])
        top1 = jnp.mean(jnp.argmax(out, -1) == yb)
        top5 = jnp.mean(jnp.any(
            jax.lax.top_k(out, min(5, out.shape[-1]))[1] == yb[:, None],
            axis=-1))
        return ce, top1, top5

    return train_step, eval_step


def _evaluate(eval_step, params, bn_state, X, Y, bs: int = 500):
    errs, a1, a5, nb = 0.0, 0.0, 0.0, 0
    for xb, yb in iterate_minibatches(X, Y, min(bs, len(X))):
        e, t1, t5 = eval_step(params, bn_state, jnp.asarray(xb),
                              jnp.asarray(yb))
        errs += float(e); a1 += float(t1); a5 += float(t5); nb += 1
    return errs / nb, a1 / nb, a5 / nb


def train_wrn(data_folder: str, img_size: int = 32, n: int = 4, k: float = 1.0,
              num_epochs: int = 40, lr: float = 0.01, lr_fac: float = 0.2,
              lr_drops: Sequence[int] = (10, 20, 30), reg_fac: float = 5e-4,
              dropout: float = 0.0, batch_size: int = 128, nout: int = 1000,
              num_train_batches: int = 10, cont: str | None = None,
              ckpt_path: str | None = None, seed: int = 23,
              val_batch_size: int = 500) -> dict:
    """Returns the final test metrics dict (loss/top1/top5)."""
    model = WideResNet(nout=nout, n=n, k=k, dropout=dropout,
                       img_size=img_size)
    first = load_databatch(data_folder, 1, img_size)
    mean = first["mean"]
    val = load_validation_data(data_folder, mean, img_size)

    key = jax.random.PRNGKey(seed)
    variables = jax.jit(partial(model.init, train=False))(
        key, jnp.zeros((1, img_size, img_size, 3)))
    params, bn_state = variables["params"], variables.get("batch_stats", {})
    velocity = jax.tree.map(jnp.zeros_like, params)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    logger.info("WRN n=%d k=%g img=%d: %.2fM params", n, k, img_size,
                n_params / 1e6)

    train_step, eval_step = make_wrn_steps(model, reg_fac)
    start_epoch, cur_lr = 0, lr
    if cont:
        net = pickle.load(open(cont, "rb"))
        params = jax.tree.map(jnp.asarray, net["params"])
        bn_state = jax.tree.map(jnp.asarray, net["batch_stats"])
        velocity = jax.tree.map(jnp.asarray, net["velocity"])
        start_epoch = net["epoch"]
        for e in range(start_epoch):  # replay the LR schedule (:331-336)
            if (e + 1) in lr_drops:
                cur_lr *= lr_fac
        logger.info("resumed %s at epoch %d (lr %g)", cont, start_epoch,
                    cur_lr)

    rng = np.random.RandomState(seed)
    t0 = time.time()
    for epoch in range(start_epoch, num_epochs):
        t_ep = time.time()
        tr_err, tr_batches = 0.0, 0
        for ib in range(1, num_train_batches + 1):
            if ib == 1 and epoch == start_epoch and first is not None:
                data, first = first, None  # release the flip-doubled copy
                # (~3 GB at real IN32 scale) once consumed; later epochs
                # reload from disk like every other (ib, epoch)
            else:
                data = load_databatch(data_folder, ib, img_size)
            for xb, yb in iterate_minibatches(
                    data["X"], data["Y"], batch_size, rng, augment=True,
                    img_size=img_size):
                key, sub = jax.random.split(key)
                params, bn_state, velocity, ce = train_step(
                    params, bn_state, velocity, jnp.asarray(xb),
                    jnp.asarray(yb), jnp.float32(cur_lr), sub)
                tr_err += float(ce); tr_batches += 1
        v_err, v1, v5 = _evaluate(eval_step, params, bn_state,
                                  val["X"], val["Y"], val_batch_size)
        logger.info(
            "epoch %d/%d (%.1fs, lr %g): train loss %.4f | val loss %.4f "
            "top1 %.2f%% top5 %.2f%%", epoch + 1, num_epochs,
            time.time() - t_ep, cur_lr, tr_err / max(tr_batches, 1),
            v_err, v1 * 100, v5 * 100)
        if ckpt_path:
            net = {"params": jax.tree.map(np.asarray, params),
                   "batch_stats": jax.tree.map(np.asarray, bn_state),
                   "velocity": jax.tree.map(np.asarray, velocity),
                   "epoch": epoch + 1}
            pickle.dump(net, open(ckpt_path, "wb"))
        if (epoch + 1) in lr_drops:
            cur_lr *= lr_fac
            logger.info("new LR: %g", cur_lr)

    t_err, t1, t5 = _evaluate(eval_step, params, bn_state, val["X"],
                              val["Y"], val_batch_size)
    logger.info("final (%.1fs total): test loss %.4f | top1 %.2f%% | "
                "top5 %.2f%%", time.time() - t0, t_err, t1 * 100, t5 * 100)
    return {"loss": t_err, "top1": t1, "top5": t5,
            "params": params, "batch_stats": bn_state}


def main(argv: list[str] | None = None) -> None:
    p = ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("-df", "--data_folder", required=True)
    p.add_argument("-s", "--img_size", type=int, default=32)
    p.add_argument("-lr", "--learning_rate", type=float, default=0.01)
    p.add_argument("-k", "--network_width", type=float, default=1)
    p.add_argument("-n", "--blocks_per_stack", type=int, default=4)
    p.add_argument("-d", "--decay", type=float, default=5e-4)
    p.add_argument("-e", "--epochs", type=int, default=40)
    p.add_argument("-c", "--cont", default=None,
                   help="checkpoint pickle to resume from")
    p.add_argument("--ckpt", default="wrn_last.p",
                   help="rolling checkpoint path ('' disables)")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--nout", type=int, default=1000)
    p.add_argument("--num-train-batches", type=int, default=10)
    a = p.parse_args(argv)
    train_wrn(a.data_folder, img_size=a.img_size, n=a.blocks_per_stack,
              k=a.network_width, num_epochs=a.epochs, lr=a.learning_rate,
              reg_fac=a.decay, batch_size=a.batch_size, nout=a.nout,
              num_train_batches=a.num_train_batches, cont=a.cont,
              ckpt_path=a.ckpt or None)


if __name__ == "__main__":
    main()
