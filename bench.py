"""Benchmark: IN64 flagship training throughput (samples/sec/chip).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Primary metric (BASELINE.md): train samples/sec/chip on the IN64 headline
config — unet_fast (model_channels=128, 64×64×3, cluster/label conditioning,
cond_drop_prob=0.1), full fused train step (loss+grad+AdamW+EMA), bfloat16
compute / float32 params.

Baseline: the reference publishes no throughput numbers (BASELINE.md).  The
A100 PyTorch estimate of ~250 samples/sec derives from the in-repo wall-time
comments (`config/data/cifar100.yaml:15`: 1 IN32 epoch ≈ 1 h ⇒ ~356 img/s at
32 px on the das6 GPU, scaled by the 4× pixel count to 64 px and up-rated to
A100-class hardware with TF32 off, `main.py:34-35`).  vs_baseline is
measured/250.

Also reports DDIM sampler throughput as a secondary line on --all.
"""

from __future__ import annotations

import argparse
import json
import os
import time

# The axon TPU plugin compiles remotely (~100-200 s per program); the
# persistent cache makes repeat bench runs near-instant.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

BASELINE_SAMPLES_PER_SEC = 250.0  # estimated A100 torch baseline (see above)


def build(batch_size: int, image_size: int, cond_dim: int, channels: int = 128,
          use_pallas: bool = True, use_checkpoint: bool = False,
          compiler_options: dict | None = None, fused_optim: bool = False,
          mu_dtype: str | None = None, family: str = "unet",
          layout_dim: int = 0):
    import jax
    import jax.numpy as jnp

    from sgdm_tpu.diffusion import GaussianDiffusion
    from sgdm_tpu.models import UNetModel
    from sgdm_tpu.training.optim import create_optimizer, lambda_linear_schedule
    from sgdm_tpu.training.state import create_train_state, make_train_step

    if family == "unetca":
        # VOC64-equivalent headline config (ref: README.md:29-81 —
        # unetca_fast, cond_token_num=1, context_dim=32,
        # stegoclusterlayout: cond = stego_attr n-hot [B,K], layout =
        # stegomask one-hot [B,H,W,K], K = layout_dim = 21 for VOC)
        from sgdm_tpu.models import UNetCAModel

        model = UNetCAModel(
            model_channels=channels, out_channels=3, num_res_blocks=2,
            channel_mult=(1, 2, 4), attention_resolutions=(4,), num_heads=8,
            use_scale_shift_norm=True, dropout=0.0,
            cond_dim=cond_dim, cond_token_num=1, context_dim=32,
            condition_method="stegoclusterlayout",
            use_pallas=use_pallas, use_checkpoint=use_checkpoint,
            dtype=jnp.bfloat16,
        )
    else:
        model = UNetModel(
            model_channels=channels, out_channels=3, num_res_blocks=2,
            channel_mult=(1, 2, 4), attention_resolutions=(4,), num_heads=8,
            use_scale_shift_norm=True, resblock_updown=True, dropout=0.1,
            cond_dim=cond_dim, use_pallas=use_pallas,
            use_checkpoint=use_checkpoint,
            dtype=jnp.bfloat16,
        )
    diffusion = GaussianDiffusion(num_timesteps=1000)
    tx = create_optimizer("adamw", lr=1e-4, wd=0.01, mu_dtype=mu_dtype)
    rng = jax.random.PRNGKey(0)
    batch = {
        "image": jax.random.normal(rng, (batch_size, image_size, image_size, 3)),
        "cond": jnp.zeros((batch_size, cond_dim)),
    }
    if family == "unetca":
        batch["layout"] = jnp.zeros(
            (batch_size, image_size, image_size, layout_dim or cond_dim))
    cond_kwargs = {k: batch[k] for k in ("cond", "layout") if k in batch}
    state = create_train_state(model, tx, rng, batch, cond_kwargs)
    optim_hparams = dict(lr_schedule=lambda_linear_schedule(1e-4),
                         beta1=0.9, beta2=0.999, eps=1e-8, weight_decay=0.01)
    step = make_train_step(model, diffusion, tx, cond_drop_prob=0.1,
                           compiler_options=compiler_options,
                           fused_optim=fused_optim,
                           optim_hparams=optim_hparams)
    return model, diffusion, state, step, batch


def bench_train(batch_size=256, image_size=64, cond_dim=1000, channels=128,
                iters=20, warmup=3, use_pallas=True, use_checkpoint=False,
                compiler_options=None, fused_optim=False, mu_dtype=None,
                family="unet", layout_dim=0):
    import jax

    model, diffusion, state, step, batch = build(
        batch_size, image_size, cond_dim, channels, use_pallas, use_checkpoint,
        compiler_options=compiler_options, fused_optim=fused_optim,
        mu_dtype=mu_dtype, family=family, layout_dim=layout_dim,
    )
    rng = jax.random.PRNGKey(1)
    for _ in range(warmup):
        state, metrics = step(state, batch, rng)
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, rng)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    sps = batch_size * iters / dt
    return sps, float(metrics["loss"])


def bench_ddim(batch_size=64, image_size=64, cond_dim=1000, channels=128,
               num_steps=50, reps=2, param_dtype=None, family="unet",
               layout_dim=0):
    import jax
    import jax.numpy as jnp

    from sgdm_tpu.training.state import make_sample_fn

    model, diffusion, state, _, batch = build(
        batch_size, image_size, cond_dim, channels, family=family,
        layout_dim=layout_dim,
    )
    sample = make_sample_fn(
        model, diffusion, sampling_method="ddim", num_steps=num_steps,
        cond_scale=2.0, param_dtype=param_dtype,
    )
    cond = batch["cond"]
    skw = {"layout": batch["layout"]} if "layout" in batch else {}
    out, _ = sample(state.ema_params, jax.random.PRNGKey(0),
                    batch_size, image_size, 3, cond=cond, **skw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(reps):
        # i+1: rep 0 must not repeat the warmup call byte-for-byte — a
        # caching transport could serve it without executing (bench_feat
        # varies its batch per rep for the same reason)
        out, _ = sample(state.ema_params, jax.random.PRNGKey(i + 1),
                        batch_size, image_size, 3, cond=cond, **skw)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    steps_per_sec = num_steps * reps / dt
    imgs_per_sec = batch_size * reps / dt
    return steps_per_sec, imgs_per_sec


def bench_feat(batch_size=256, image_size=64, reps=5, name="dino_vitb16"):
    """SSL feature extraction imgs/sec (BASELINE.json target metric):
    uint8 batch → resize 224 + imagenet-norm → ViT CLS features.

    bs=256 is the measured device-saturation point (round-3 sweep, f32,
    jitted transform: 603 imgs/s at bs64 / 771 at bs128 / 842 at bs256 —
    extraction is an offline batch job, so the saturating batch is the
    honest throughput configuration; BASELINE.md round 3)."""
    import time

    import numpy as np

    from sgdm_tpu.selfsup.ssl_backbone import get_ssl_backbone

    bk = get_ssl_backbone(name)
    imgs = np.random.default_rng(0).integers(
        0, 255, (batch_size, image_size, image_size, 3), dtype=np.uint8)
    feats = bk.batch_encode_feat(bk.transform_batch(imgs))  # warm/compile
    t0 = time.perf_counter()
    for i in range(reps):
        # vary the batch so a caching transport cannot reuse the execution
        feats = bk.batch_encode_feat(bk.transform_batch(
            np.roll(imgs, i + 1, axis=0)))
    assert feats.shape == (batch_size, bk.feat_dim)
    dt = time.perf_counter() - t0
    return batch_size * reps / dt


def _ensure_e2e_dataset(n: int, image_size: int = 64, k: int = 1000,
                        seed: int = 0):
    """Cached synthetic IN64-format dataset for the e2e bench: the REAL
    on-disk formats — the `in64pickle.h5` pack (`data_train`/`labels_train`,
    ref: dataset/imagenet_pickle.py:96-110) + a v4-style cluster h5
    (`train` assignments, `all_attributes.attrs['cluster_k']`, sibling
    name2id json; SURVEY.md §2.7) — so the bench exercises the h5 bulk
    read, the per-sample cluster lookups and the native batchgather
    exactly like a real IN64 cluster-conditioned run."""
    import json as _json
    from pathlib import Path

    import h5py
    import numpy as np

    base = Path(os.path.expanduser("~/.cache/sgdm/bench_e2e"))
    sized = base / f"size{image_size}"
    pack = sized / "in64pickle.h5"
    cl = base / f"v4_bench_cluster{k}_{image_size}px.h5"
    cl_json = Path(str(cl).replace(".h5", ".json"))
    marker = base / f"ok_n{n}_s{image_size}_k{k}"
    if not marker.exists():
        sized.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(seed)
        data = rng.integers(0, 256, (n, 3 * image_size * image_size),
                            dtype=np.uint8)
        labels = rng.integers(0, 1000, n)  # packs are 0-based
        with h5py.File(pack, "w") as f:
            f.create_dataset("data_train", data=data)
            f.create_dataset("labels_train", data=labels)
            f.create_dataset("data_val", data=data[:256])
            f.create_dataset("labels_val", data=labels[:256])
        with h5py.File(cl, "w") as f:
            f.create_dataset("train",
                             data=rng.integers(0, k, n).astype(np.int64))
            f.create_dataset("val",
                             data=rng.integers(0, k, 256).astype(np.int64))
            f.create_dataset(
                "centroids",
                data=rng.standard_normal((k, 768)).astype(np.float32))
            d = f.create_dataset("all_attributes", data=np.zeros(1))
            d.attrs["cluster_k"] = k
        cl_json.write_text(_json.dumps({
            "name2id": {f"{i}.jpg": i for i in range(n)},
            "id2name": {str(i): f"{i}.jpg" for i in range(n)},
        }))
        marker.touch()
    return str(base), str(cl)


def bench_e2e(batch_size=192, image_size=64, channels=128, iters=120,
              log_every=50, num_workers=8, prefetch_batches=4,
              use_pallas=False):
    """Loader-fed END-TO-END training rate through the REAL trainer loop:
    threaded DataLoader + h5 bulk reads + per-sample h5cond cluster
    lookups + native batchgather + `_device_batch` conditioning/transfer +
    the trainer's own step/logging cadence — the number a real IN64
    cluster run delivers, vs the device-resident bare-step metric.

    Rate = samples / wall-clock of epoch 1 (epoch 0 absorbs compile), as
    reported by the trainer's own `epoch_time_sec` — which ends at the
    epoch-boundary device drain, so the number cannot be inflated by the
    async dispatch queue racing ahead of the device (the per-window
    `train/iters_per_sec` values are host-side dispatch timings under the
    deferred-log pipeline and are reported for color only).  The per-epoch
    checkpoint save is stubbed out: it is an epoch-BOUNDARY cost outside
    the steady-state rate both here and in the reference's
    iters_per_sec."""
    import tempfile

    import numpy as np

    from sgdm_tpu.data.imagenet_pickle import ImageNetPickle
    from sgdm_tpu.data.loader import DataLoader
    from sgdm_tpu.training.trainer import SelfGuidedDiffusionTrainer

    k = 1000  # cluster_k == cond_dim of the flagship record config
    root, h5file = _ensure_e2e_dataset(n=batch_size * iters,
                                       image_size=image_size, k=k)
    ds = ImageNetPickle(root=root, train=True, image_size=image_size,
                        num_classes=1000, condition_method="cluster",
                        h5_file=h5file)
    dl = DataLoader(ds, batch_size, shuffle=True, num_workers=num_workers,
                    prefetch_batches=prefetch_batches)

    trainer = SelfGuidedDiffusionTrainer(
        condition_method="cluster", cond_dim=k, cond_scale=2.0,
        cond_drop_prob=0.1,
        dynamic={
            "target": "sgdm_tpu.models.UNetModel",
            "params": dict(
                model_channels=channels, out_channels=3, num_res_blocks=2,
                channel_mult=[1, 2, 4], attention_resolutions=[4],
                num_heads=8, use_scale_shift_norm=True, resblock_updown=True,
                dropout=0.1, cond_dim=k, use_pallas=use_pallas,
            ),
        },
        diffusion_model={
            "target": "sgdm_tpu.diffusion.GaussianDiffusion",
            "params": {"num_timesteps": 1000},
        },
        optim={"name": "adamw", "params": {"lr": 1e-4, "wd": 0.01},
               "scheduler_config": "default"},
        pl={"trainer": {"strategy": None}},  # single chip, like bench_train
        compute_dtype="bfloat16",
        log_dir=tempfile.mkdtemp(prefix="sgdm_e2e_"),
    )

    it_logs: list[float] = []
    epoch_times: list[float] = []
    trainer.tracker = _CaptureTracker(it_logs, epoch_times)
    trainer.ckpt = _NoCkpt()
    trainer.fit(_SingleLoaderDM(dl), max_epochs=2,
                limit_train_batches=int(iters),
                log_every_n_steps=int(log_every),
                fid_every_n_epoch=10 ** 9, vis_every_iter=10 ** 9)
    assert len(epoch_times) == 2, epoch_times
    return batch_size * iters / epoch_times[-1], it_logs


def bench_e2e_seg(batch_size=128, image_size=64, channels=128, iters=60,
                  log_every=50, num_workers=8, prefetch_batches=4,
                  layout_dim=21, onehot_on_device=True):
    """Loader-fed END-TO-END training rate for the LAYOUT pipeline —
    the VOC64-equivalent unetca_fast + stegoclusterlayout config (ref:
    README.md:29-81).  The complex datasets build up to three per-sample
    one-hot mask tensors in host Python (`data/transforms.py`
    np.eye(...)[segmask], `complex_base.py`) outside the native
    batchgather — this leg measures whether that host work starves the
    chip (VERDICT round-4 #2).  Methodology identical to bench_e2e:
    rate = samples / drained epoch-1 wall-clock."""
    import tempfile

    import numpy as np

    from sgdm_tpu.data.loader import DataLoader
    from sgdm_tpu.data.synthetic import SyntheticSegImages
    from sgdm_tpu.training.trainer import SelfGuidedDiffusionTrainer

    # onehot_on_device=True is the TPU-native wire format: uint8 id masks
    # (4 KB/sample) expanded to one-hot in one fused device op, vs the
    # reference-parity host one-hot build (344 KB/sample at K=21/64px →
    # 102 MB per bs128 batch, measured 139 samples/s = 26 % of bare-step)
    ds = SyntheticSegImages(size=image_size, num_classes=10,
                            length=batch_size * iters, seed=0,
                            stego_k=layout_dim,
                            onehot_on_device=onehot_on_device)
    dl = DataLoader(ds, batch_size, shuffle=True, num_workers=num_workers,
                    prefetch_batches=prefetch_batches)
    trainer = SelfGuidedDiffusionTrainer(
        condition_method="stegoclusterlayout", cond_dim=layout_dim,
        cond_scale=2.0, cond_drop_prob=0.1,
        condition={"stegoclusterlayout": {"layout_dim": layout_dim}},
        dynamic={
            "target": "sgdm_tpu.models.factory.create_denoiser",
            "params": dict(
                model_channels=channels, out_channels=3, num_res_blocks=2,
                channel_mult=[1, 2, 4], attention_resolutions=[4],
                num_heads=8, use_scale_shift_norm=True, dropout=0.0,
                use_ca_block=True, cond_token_num=1, context_dim=32,
                cond_dim=layout_dim, condition_method="stegoclusterlayout",
            ),
        },
        diffusion_model={
            "target": "sgdm_tpu.diffusion.GaussianDiffusion",
            "params": {"num_timesteps": 1000},
        },
        optim={"name": "adamw", "params": {"lr": 1e-4, "wd": 0.01},
               "scheduler_config": "default"},
        pl={"trainer": {"strategy": None}},
        compute_dtype="bfloat16",
        log_dir=tempfile.mkdtemp(prefix="sgdm_e2e_seg_"),
    )

    it_logs: list[float] = []
    epoch_times: list[float] = []
    trainer.tracker = _CaptureTracker(it_logs, epoch_times)
    trainer.ckpt = _NoCkpt()
    trainer.fit(_SingleLoaderDM(dl), max_epochs=2,
                limit_train_batches=int(iters),
                log_every_n_steps=int(log_every),
                fid_every_n_epoch=10 ** 9, vis_every_iter=10 ** 9)
    assert len(epoch_times) == 2, epoch_times
    return batch_size * iters / epoch_times[-1], it_logs


class _CaptureTracker:
    """Tracker shim capturing iters/sec windows + epoch times (bench only)."""

    def __init__(self, it_logs, epoch_times):
        self._it, self._et = it_logs, epoch_times

    def log(self, d, step=None):
        if "train/iters_per_sec" in d:
            self._it.append(float(d["train/iters_per_sec"]))
        if "epoch_time_sec" in d:
            self._et.append(float(d["epoch_time_sec"]))

    def log_images(self, *a, **kw):
        pass

    def finish(self):
        pass


class _NoCkpt:
    def save_last(self, *a, **kw):
        return None

    def wait_until_finished(self):
        pass

    def restore(self, *a, **kw):
        raise RuntimeError("bench never restores")


class _SingleLoaderDM:
    """Minimal datamodule shim for bench_e2e (train loader only)."""

    def __init__(self, dl):
        self._dl = dl

    def train_dataloader(self):
        return self._dl

    def val_dataloader(self):
        raise KeyError("bench_e2e has no val loader")


def _isolated(flag: str, metric: str, quick: bool,
              extra: list[str] | None = None) -> dict | None:
    """Run one bench leg in a FRESH process and return its parsed JSON line.

    Run-position effects are real on this chip: measured in-process after
    the train/DDIM programs, feat extraction loses ~11 % (752 vs 842
    imgs/s) and the e2e loop ~10 % (390 vs 434 samples/s — the round-4
    driver capture vs the committed record; VERDICT round-4 #1/#3).  Each
    of these metrics models a job that owns its process, so the isolated
    number is the honest AND reproducible one.  Returns None on any
    subprocess failure (caller falls back to in-process)."""
    import subprocess
    import sys

    cmd = [sys.executable, os.path.abspath(__file__), flag] + (extra or [])
    if quick:
        cmd.append("--quick")
    env = dict(os.environ, SGDM_BENCH_NO_PREFLIGHT="1")  # parent probed
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=2400, env=env)
    except Exception:
        return None
    # per-line parse: a stray '{'-prefixed log line (or a malformed one)
    # must not abandon a later valid metric line
    for line in out.stdout.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if rec.get("metric") == metric and rec.get("value") is not None:
            return rec
    return None


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="tiny shapes for CPU smoke-testing the bench itself")
    p.add_argument("--train-only", action="store_true",
                   help="primary train metric only (skip DDIM/feat lines)")
    p.add_argument("--feat-only", action="store_true",
                   help="feat-extraction metric only (used by the main run "
                        "to measure it in a fresh process)")
    p.add_argument("--e2e-only", action="store_true",
                   help="loader-fed END-TO-END training rate only: real "
                        "DataLoader + h5cond lookups + native batchgather + "
                        "trainer loop (vs the device-resident bare step)")
    p.add_argument("--e2e-seg-only", action="store_true",
                   help="loader-fed e2e rate for the LAYOUT pipeline: "
                        "VOC64-equivalent unetca_fast + stegoclusterlayout "
                        "over a seg dataset incl. the host-side per-sample "
                        "one-hot mask assembly")
    p.add_argument("--ca-only", action="store_true",
                   help="cross-attention (unetca_fast) bare-step train + "
                        "DDIM metrics only, at the VOC64-equivalent config")
    p.add_argument("--e2e-workers", type=int, default=8)
    p.add_argument("--e2e-prefetch", type=int, default=4)
    p.add_argument("--seg-host-onehot", action="store_true",
                   help="e2e-seg leg: build f32 one-hot masks on the host "
                        "(reference batch contract) instead of shipping "
                        "uint8 id masks + device one-hot (the TPU-native "
                        "default; measured 139 vs bare-step 539 samples/s "
                        "host-side)")
    p.add_argument("--all", action="store_true", help=argparse.SUPPRESS)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--pallas", action="store_true",
                   help="use the round-1 Pallas kernels in the TRAIN step "
                        "(measured slower: recompute-VJP blocks backward "
                        "fusion)")
    p.add_argument("--fused", dest="fused", action="store_true", default=None,
                   help="opt the TRAIN step into the fused-ResBlock Pallas "
                        "kernels (fwd + Pallas backward) [default OFF: the "
                        "XLA path measures faster in-program, BASELINE.md "
                        "round 3; sampling always uses the fused forward]")
    p.add_argument("--no-fused", dest="fused", action="store_false",
                   help="explicit XLA train path (the default)")
    p.add_argument("--no-pallas", action="store_true", help=argparse.SUPPRESS)
    p.add_argument("--fused-optim", action="store_true",
                   help="one-pass Pallas AdamW+EMA parameter update "
                        "(ops/pallas/fused_optim.py; exact optax math)")
    p.add_argument("--xla-opt", action="append", default=[],
                   metavar="KEY=VAL",
                   help="extra XLA compiler option(s) shipped with the "
                        "program (reaches the remote axon compiler, unlike "
                        "XLA_FLAGS)")
    p.add_argument("--mu-dtype", default=None, metavar="DTYPE",
                   help="dtype for the first Adam moment (optax mu_dtype "
                        "semantics; e.g. bfloat16 halves the mu stream of "
                        "the weight-update fusions and 4 B/param of state; "
                        "default f32 = reference parity)")
    p.add_argument("--remat", choices=["none", "conv", "full"], default=None,
                   help="activation checkpointing: 'conv' saves conv outputs "
                        "and recomputes the cheap GN/SiLU chains (keeps the "
                        "flagship bs=256 step inside 16 GB HBM — no host "
                        "offload); 'full' remats whole ResBlocks")
    args = p.parse_args()

    # Pre-flight: the axon tunnel can wedge in a way that makes the first
    # jax device call block forever (observed: backend init hangs, no
    # error).  Probe it in a subprocess with a hard timeout so a dead
    # tunnel yields an explicit one-line JSON error instead of a silent
    # hang of the whole bench run.
    if not os.environ.get("SGDM_BENCH_NO_PREFLIGHT"):
        import subprocess
        import sys

        t_limit = int(os.environ.get("SGDM_BENCH_PREFLIGHT_SEC", "300"))
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices()[0]; print(d.platform)"],
                timeout=t_limit, capture_output=True, text=True,
            )
            ok = probe.returncode == 0
            detail = (probe.stdout + probe.stderr).strip()[-200:]
        except subprocess.TimeoutExpired:
            ok, detail = False, f"device init exceeded {t_limit}s (tunnel down?)"
        if not ok:
            print(json.dumps({
                "metric": "train_samples_per_sec_per_chip_in64",
                "value": None, "unit": "samples/sec/chip",
                "vs_baseline": None,
                "error": f"device backend unavailable: {detail}",
            }))
            sys.exit(1)

    if args.feat_only:
        fkw = dict(batch_size=8, reps=1) if args.quick else {}
        print(json.dumps({
            "metric": "feat_extract_imgs_per_sec",
            "value": round(bench_feat(**fkw), 2),
            "unit": "imgs/sec",
            "vs_baseline": None,
            "isolated": True,  # own process = the offline-batch-job model
        }))
        return

    if args.e2e_only:
        ekw = dict(num_workers=args.e2e_workers,
                   prefetch_batches=args.e2e_prefetch)
        if args.quick:
            # 64 px even in quick mode: the in64pickle.h5 pack path (the
            # format the flagship uses) only exists at size 64
            ekw.update(batch_size=args.batch_size or 8, image_size=64,
                       channels=32, iters=8, log_every=2)
        elif args.batch_size:
            ekw["batch_size"] = args.batch_size
        sps_e2e, it_logs = bench_e2e(**ekw)
        print(json.dumps({
            "metric": "train_samples_per_sec_e2e_in64",
            "value": round(sps_e2e, 2),
            "unit": "samples/sec/chip",
            "vs_baseline": round(sps_e2e / BASELINE_SAMPLES_PER_SEC, 3),
            "isolated": True,  # own process = reproducible run position
            "iters_per_sec_windows": [round(v, 3) for v in it_logs],
        }))
        return

    if args.e2e_seg_only:
        ekw = dict(num_workers=args.e2e_workers,
                   prefetch_batches=args.e2e_prefetch)
        if args.quick:
            ekw.update(batch_size=args.batch_size or 8, image_size=32,
                       channels=32, iters=8, log_every=2, layout_dim=11)
        elif args.batch_size:
            ekw["batch_size"] = args.batch_size
        ekw["onehot_on_device"] = not args.seg_host_onehot
        sps_seg, it_logs = bench_e2e_seg(**ekw)
        print(json.dumps({
            "metric": "train_samples_per_sec_e2e_seg_voc64",
            "value": round(sps_seg, 2),
            "unit": "samples/sec/chip",
            "vs_baseline": None,
            "isolated": True,
            "onehot_on_device": not args.seg_host_onehot,
            "iters_per_sec_windows": [round(v, 3) for v in it_logs],
        }))
        return

    if args.ca_only:
        if args.quick:
            tkw = dict(batch_size=args.batch_size or 8, image_size=16,
                       cond_dim=5, layout_dim=5, channels=32, iters=4,
                       warmup=1, family="unetca")
            skw = dict(batch_size=8, image_size=16, cond_dim=5, layout_dim=5,
                       channels=32, num_steps=10, reps=1, family="unetca")
        else:
            tkw = dict(batch_size=args.batch_size or 128, cond_dim=21,
                       layout_dim=21, family="unetca")
            skw = dict(cond_dim=21, layout_dim=21, family="unetca")
        if not args.quick:
            from sgdm_tpu.utils.tpu import default_compiler_options

            opts = default_compiler_options()
            if opts:
                tkw["compiler_options"] = opts
        sps_ca, _ = bench_train(**tkw)
        steps_ca, imgs_ca = bench_ddim(**skw)
        print(json.dumps({
            "metric": "train_samples_per_sec_per_chip_voc64_unetca",
            "value": round(sps_ca, 2),
            "unit": "samples/sec/chip",
            "vs_baseline": None,
            "ddim_steps_per_sec_unetca": round(steps_ca, 2),
            "ddim_imgs_per_sec_unetca": round(imgs_ca, 2),
            "isolated": True,
        }))
        return

    if args.quick:
        kw = dict(batch_size=args.batch_size or 8, image_size=16, cond_dim=10,
                  channels=32, iters=4, warmup=1)
    else:
        # bs=192 measured fastest per-chip (454 samples/s vs 392 at bs=256):
        # below the HBM-pressure point where XLA starts internally
        # rematerializing fusions (BASELINE.md round 2 sweep)
        kw = dict(batch_size=args.batch_size or 192)
    # training default = XLA path: measured fastest (457 vs 414 samples/s
    # for the fused-ResBlock kernels at their best batch size — in-program
    # XLA fuses resblock chains to parity with the kernels and the saved
    # residuals cost HBM headroom; full analysis in BASELINE.md round 3).
    # --fused opts the TRAIN step into the Pallas fwd+bwd kernels; sampling
    # always uses the fused forward kernels (measured fastest there).
    if args.pallas:
        kw["use_pallas"] = True
    else:
        kw["use_pallas"] = "fused" if args.fused else False
    # default: no remat — fastest measured (BASELINE.md round-2: every remat
    # variant is ≤ baseline at bs=256; XLA schedules near the HBM cap either
    # way, and 'S(1)' buffers are VMEM prefetch, not host offload).  'conv'
    # remains available for large-batch headroom.
    remat = args.remat if args.remat is not None else "none"
    kw["use_checkpoint"] = {"none": False, "conv": "conv", "full": True}[remat]
    kw["fused_optim"] = args.fused_optim
    kw["mu_dtype"] = args.mu_dtype
    if args.xla_opt:
        if "none" in args.xla_opt and len(args.xla_opt) > 1:
            p.error("--xla-opt none cannot be combined with other --xla-opt "
                    "values")
        if args.xla_opt != ["none"]:  # --xla-opt none → no overrides at all
            kw["compiler_options"] = dict(o.split("=", 1) for o in args.xla_opt)
    else:
        # measured-best per-generation options (BASELINE.md round-2 sweep),
        # gated on the actual device kind — shared with training/trainer.py
        from sgdm_tpu.utils.tpu import default_compiler_options

        opts = default_compiler_options()
        if opts:
            kw["compiler_options"] = opts

    sps, loss = bench_train(**kw)
    result = {
        "metric": "train_samples_per_sec_per_chip_in64",
        "value": round(sps, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(sps / BASELINE_SAMPLES_PER_SEC, 3),
    }

    # on-TPU: re-prove the flash-attention fwd+grad parity claim on every
    # bench run (sub-second; round-2 VERDICT #6) — a kernel regression
    # fails the bench instead of shipping silently
    from sgdm_tpu.utils.tpu import on_tpu_target

    if on_tpu_target():
        from sgdm_tpu.ops.pallas.attention import flash_attention_parity_check

        parity = flash_attention_parity_check()
        result["flash_attention_parity"] = {
            k: round(v, 5) for k, v in parity.items()
        }

    if args.train_only:
        print(json.dumps(result))
        return

    # all driver metrics by default (round-2 VERDICT #4): secondary metrics
    # print as their own JSON lines FIRST and fold into the primary line,
    # which prints LAST — the driver parses the final JSON line of the run
    # as the headline (BENCH_r03/r04 'parsed' field), so the primary train
    # metric must close the output (VERDICT round-4 weak #1).
    skw = (dict(batch_size=8, image_size=16, cond_dim=10, channels=32,
                num_steps=10, reps=1) if args.quick else {})
    steps_ps, imgs_ps = bench_ddim(**skw)
    result["ddim_steps_per_sec"] = round(steps_ps, 2)
    result["ddim_imgs_per_sec"] = round(imgs_ps, 2)
    print(json.dumps({
        "metric": "ddim_steps_per_sec",
        "value": round(steps_ps, 2),
        "unit": "steps/sec",
        "vs_baseline": None,
        "ddim_imgs_per_sec": round(imgs_ps, 2),
    }))

    feat_rec = _isolated("--feat-only", "feat_extract_imgs_per_sec",
                         args.quick)
    feat_isolated = feat_rec is not None
    if feat_rec is None:  # subprocess failed — measure in-process instead
        fkw = dict(batch_size=8, reps=1) if args.quick else {}
        feat_ps = bench_feat(**fkw)
    else:
        feat_ps = float(feat_rec["value"])
    result["feat_extract_imgs_per_sec"] = round(feat_ps, 2)
    # methodology tag (round-3 change): True = fresh-process measurement
    # (~8-11 % higher than in-process after the train/DDIM programs) —
    # keeps cross-round records distinguishable
    result["feat_extract_isolated"] = feat_isolated
    print(json.dumps({
        "metric": "feat_extract_imgs_per_sec",
        "value": round(feat_ps, 2),
        "unit": "imgs/sec",
        "vs_baseline": None,
        "isolated": feat_isolated,
    }))

    if on_tpu_target() and not args.quick:
        # loader-fed end-to-end rate (round-4 honesty metric), measured in
        # a FRESH process: in-process after the train/DDIM programs it
        # loses ~10 % to run-position effects (390 vs 434 — VERDICT
        # round-4 #1/#3).  Guarded: a leg failure must not void the
        # records that already printed.
        e2e_rec = _isolated("--e2e-only", "train_samples_per_sec_e2e_in64",
                            False,
                            extra=(["--batch-size", str(args.batch_size)]
                                   if args.batch_size else None))
        if e2e_rec is not None:
            result["train_samples_per_sec_e2e_in64"] = e2e_rec["value"]
            result["e2e_isolated"] = True
            print(json.dumps({k: e2e_rec[k] for k in
                              ("metric", "value", "unit", "vs_baseline",
                               "isolated") if k in e2e_rec}))
        else:
            print(json.dumps({"metric": "train_samples_per_sec_e2e_in64",
                              "error": "isolated subprocess failed"}))

        # cross-attention family (VOC64-equivalent unetca_fast) bare-step
        # train + DDIM — the paper's VOC/COCO flagship (VERDICT round-4 #1)
        ca_rec = _isolated("--ca-only",
                           "train_samples_per_sec_per_chip_voc64_unetca",
                           False)
        if ca_rec is not None:
            result["train_samples_per_sec_unetca_voc64"] = ca_rec["value"]
            result["ddim_steps_per_sec_unetca"] = \
                ca_rec.get("ddim_steps_per_sec_unetca")
            print(json.dumps(ca_rec))
        else:
            print(json.dumps({
                "metric": "train_samples_per_sec_per_chip_voc64_unetca",
                "error": "isolated subprocess failed"}))

        # layout-pipeline loader-fed e2e (host one-hot mask assembly cost,
        # VERDICT round-4 #2)
        seg_rec = _isolated("--e2e-seg-only",
                            "train_samples_per_sec_e2e_seg_voc64", False)
        if seg_rec is not None:
            result["train_samples_per_sec_e2e_seg_voc64"] = seg_rec["value"]
            print(json.dumps({k: seg_rec[k] for k in
                              ("metric", "value", "unit", "vs_baseline",
                               "isolated") if k in seg_rec}))
        else:
            print(json.dumps({"metric": "train_samples_per_sec_e2e_seg_voc64",
                              "error": "isolated subprocess failed"}))

    # the primary line prints LAST: the driver records the final JSON line
    print(json.dumps(result))


if __name__ == "__main__":
    main()
