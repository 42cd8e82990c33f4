"""The orchestration layer: SelfGuidedDiffusionTrainer.

TPU-native replacement for `lightning_module.py:56-323 TaoDiffusion` +
`main.py:99-139` (Lightning Trainer construction, fit, test):

  * owns denoiser + EMA + diffusion process + optimizer (built from the same
    Hydra-shaped sub-configs the reference threads into the LightningModule,
    `config/sg/default.yaml:1-10`),
  * epoch loop over the threaded loader with the fused jitted train step;
    data parallelism over a `Mesh(('data',))` replaces `strategy=ddp`,
  * per-step metric logging incl. `iters_per_sec` (lightning_module.py:
    217-220) and the per-timestep loss scatter (epoch_stats_x/y, :227-229),
  * validation: EMA + non-EMA val loss (:291-303) and guided sample grids at
    cond_scale ∈ {0, s} (callbacks/my_callbacks.py ImageLogger); val FID via
    the eval harness when FID dirs are configured, logged as
    `val/fid_for_ckpt` to drive best-checkpoint selection,
  * checkpoint best+last (orbax) and resume (`main.py:126-133`).
"""

from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..conditioning.condition import (
    layout_dim_of,
    layout_to_device,
    prepare_condition_kwargs,
)
from ..config.engine import instantiate_from_config, to_container
from ..diffusion import GaussianDiffusion
from ..parallel.mesh import create_mesh, shard_batch
from ..utils.logging import Tracker, get_tracker, logger, make_grid
from .checkpoints import CheckpointManager
from .optim import create_optimizer
from .state import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_sample_fn,
    make_train_step,
)

__all__ = ["SelfGuidedDiffusionTrainer"]


class SelfGuidedDiffusionTrainer:
    def __init__(self, **hparams: Any):
        self.hparams = hparams
        self.condition_method = hparams.get("condition_method")
        self.cond_dim = hparams.get("cond_dim") or 0
        self.cond_drop_prob = hparams.get("cond_drop_prob") or 0.0
        self.cond_scale = hparams.get("cond_scale")
        self.use_ema = hparams.get("use_ema", True)
        self.ema_decay = hparams.get("ema_decay", 0.9999)
        self.seed = hparams.get("seed", 23)
        self.debug = bool(hparams.get("debug", False))
        self.log_dir = Path(hparams.get("log_dir", "./outputs/run"))
        self.condition_cfg = to_container(hparams.get("condition") or {})
        self.scale_type = self.condition_cfg.get("scale_type", "imagen")
        self.dtp = float(hparams.get("dtp", 1.0))
        self.ddim_eta = float(hparams.get("ddim_eta", 0.0))
        self.log_num_per_prog = int(hparams.get("log_num_per_prog", 10))

        # compute dtype: explicit compute_dtype wins; else pl.trainer
        # .precision ("32"/"bf16", the Lightning-named knob the configs
        # document) decides; default bf16
        _pl_prec = ((to_container(hparams.get("pl") or {}).get("trainer")
                     or {}).get("precision"))
        compute_dtype = hparams.get("compute_dtype")
        if compute_dtype is None:
            compute_dtype = {"32": "float32", 32: "float32", "fp32": "float32",
                             "16": "bfloat16", 16: "bfloat16",
                             "bf16": "bfloat16",
                             None: "bfloat16"}.get(_pl_prec, str(_pl_prec))
        self._dtype = jnp.bfloat16 if str(compute_dtype) in ("bf16", "bfloat16") else jnp.float32

        # --- model (dynamic group) -----------------------------------
        dyn = to_container(hparams["dynamic"])
        self.model = instantiate_from_config(dyn, dtype=self._dtype)

        # --- diffusion process (model group) -------------------------
        diff_cfg = to_container(hparams["diffusion_model"])
        self.diff_params = diff_cfg["params"]
        self.diffusion: GaussianDiffusion = instantiate_from_config(diff_cfg)
        self.clip_denoised = bool(self.diff_params.get("clip_denoised", True))

        # --- optimizer (optim group) ---------------------------------
        optim = to_container(hparams["optim"])
        self.tx = create_optimizer(
            name=optim["name"],
            scheduler=optim.get("scheduler_config"),
            **{k: v for k, v in optim["params"].items()},
        )

        # --- runtime -------------------------------------------------
        pl_cfg = to_container(hparams.get("pl") or {})
        trainer_cfg = pl_cfg.get("trainer") or {}
        strategy = trainer_cfg.get("strategy", "data_parallel")
        # tensor_parallel=N splits the 'model' axis off the device list —
        # the scaling extension beyond the reference's DDP (parallel/tp.py);
        # N must divide the device count, model_channels, and (for
        # collective-free GroupNorm) the 32 GN groups
        self.tensor_parallel = int(trainer_cfg.get("tensor_parallel", 1))
        # fsdp=true shards params + Adam moments + EMA over the 'data'
        # axis (ZeRO-3; parallel/fsdp.py) — composes with tensor_parallel
        self.fsdp = bool(trainer_cfg.get("fsdp", False))
        if strategy == "data_parallel":
            devices = (
                jax.devices("cpu") if os.environ.get("SGDM_FORCE_CPU") else None
            )
            # pl.trainer.devices (Lightning GPU-count knob): an explicit
            # int > 1 caps the mesh to the first N devices; the config
            # default (1 / null) means "all visible devices" — on TPU the
            # mesh IS the scaling unit and silently training on one chip
            # of a pod would be the surprising behavior
            n_dev = trainer_cfg.get("devices")
            if isinstance(n_dev, int) and n_dev > 1:
                all_devs = list(devices if devices is not None
                                else jax.devices())
                assert n_dev <= len(all_devs), (
                    f"pl.trainer.devices={n_dev} but only {len(all_devs)} "
                    f"devices visible")
                devices = all_devs[:n_dev]
            if self.tensor_parallel > 1:
                devs = list(devices if devices is not None else jax.devices())
                tp = self.tensor_parallel
                assert len(devs) % tp == 0, (len(devs), tp)
                self.mesh = create_mesh(
                    devs, axis_names=("data", "model"),
                    shape=(len(devs) // tp, tp),
                )
                if getattr(self.model, "use_pallas", False):
                    logger.warning(
                        "tensor_parallel>1 requires the XLA conv path — "
                        "Pallas kernels are per-device programs GSPMD "
                        "cannot partition; set dynamic.params.use_pallas="
                        "false"
                    )
            else:
                self.mesh = create_mesh(devices)
            if self.fsdp and getattr(self.model, "use_pallas", False):
                logger.warning(
                    "fsdp=true requires the XLA conv path — Pallas kernels "
                    "are per-device programs GSPMD cannot partition over "
                    "sharded params; set dynamic.params.use_pallas=false"
                )
            if (self.fsdp or self.tensor_parallel > 1) and \
                    getattr(self.model, "flash_attention", None) is not False:
                # pallas_calls (flash attention auto-enables on TPU even
                # with use_pallas=false) cannot be GSPMD-partitioned over
                # 'model'/'data'-sharded operands — force the XLA einsum
                # attention for sharded-state training AND sampling
                self.model = self.model.clone(flash_attention=False)
                logger.info(
                    "sharded state (tp/fsdp): flash attention disabled — "
                    "XLA einsum attention partitions under GSPMD"
                )
        else:
            self.mesh = None
            if self.fsdp:
                logger.warning(
                    "pl.trainer.fsdp=true is IGNORED without a device mesh "
                    "(strategy=%s) — state stays fully replicated; set "
                    "pl.trainer.strategy=data_parallel", strategy,
                )
        self.state: TrainState | None = None
        self._state_shardings = None
        self.tracker: Tracker | None = None
        self.ckpt: CheckpointManager | None = None
        self.global_step = 0
        self._train_step = None
        self._eval_step = None
        self._data_cfg = to_container(hparams.get("data") or {})
        self.fid_fn = None  # injected by the eval harness (set_fid_fn)

    # ------------------------------------------------------------------
    def set_fid_fn(self, fn) -> None:
        """Inject the FID evaluator (eval harness), keeping training free of
        eval-stack imports."""
        self.fid_fn = fn

    # ------------------------------------------------------------------
    def _cond_kwargs(self, batch: Mapping[str, np.ndarray], training: bool) -> dict:
        kw = prepare_condition_kwargs(
            self.condition_method, batch,
            cond_drop_prob=self.cond_drop_prob if self.condition_method else None,
            training=training,
            condition_cfg=self.condition_cfg,
        )
        return kw

    def _layout_dim(self) -> int:
        return layout_dim_of(self.condition_method, self.condition_cfg)

    def _device_batch(self, batch: Mapping[str, np.ndarray], training: bool = True) -> dict:
        kw = self._cond_kwargs(batch, training)
        out = {"image": jnp.asarray(batch["image"], dtype=jnp.float32)}
        if kw.get("cond") is not None:
            out["cond"] = jnp.asarray(kw["cond"], dtype=jnp.float32)
        if kw.get("layout") is not None:
            # `onehot_on_device=True` datasets ship uint8 ID masks [B,H,W]
            # (4 KB/sample) instead of f32 one-hots [B,H,W,K] (344 KB/sample
            # at K=21/64px — measured 102 MB per bs128 batch, starving the
            # chip at 26 % of bare-step); layout_to_device transfers the
            # uint8 wire bytes and expands in one fused device op
            out["layout"] = layout_to_device(kw["layout"], self._layout_dim())
        if kw.get("image_batch_ids") is not None:
            out["image_batch_ids"] = jnp.asarray(kw["image_batch_ids"], dtype=jnp.int32)
        if self.mesh is not None:
            out = shard_batch(out, self.mesh)
        return out

    def _emit_pending_train_log(self) -> None:
        """Emit the deferred train-log record from the previous log point
        (its async device→host copies have completed by now, so the
        float() calls below do not block the dispatch pipeline)."""
        pending = getattr(self, "_pending_log", None)
        if pending is None:
            return
        step, ep, metrics, iters_per_sec, img_million = pending
        self._pending_log = None
        loss = float(metrics["loss"])
        self.tracker.log(
            {
                "train/loss": loss,
                "train/ddpm_loss": float(metrics["ddpm_loss"]),
                "train/grad_norm": float(metrics["grad_norm"]),
                "train/iters_per_sec": iters_per_sec,
                "train/img_million": img_million,
                "epoch": ep,
            },
            step=step,
        )
        logger.info(
            f"epoch {ep} step {step} loss {loss:.4f} it/s {iters_per_sec:.2f}"
        )

    def _init_state(self, example_batch: dict) -> None:
        rng = jax.random.PRNGKey(self.seed)
        cond_kwargs = {k: example_batch.get(k)
                       for k in ("cond", "layout", "image_batch_ids")}
        self.state = create_train_state(
            self.model, self.tx, rng, example_batch,
            {k: v for k, v in cond_kwargs.items() if v is not None},
        )
        if self.mesh is not None:
            if self.fsdp:
                # ZeRO-3: params/moments/EMA sharded over 'data' (and
                # composed with the TP specs when the mesh is 2-D)
                from ..parallel.fsdp import state_sharding
            else:
                # 1-D mesh → fully replicated (DDP semantics); 2-D mesh →
                # tensor-parallel param/opt-state shardings over 'model'
                from ..parallel.tp import state_sharding
            self._state_shardings = state_sharding(self.state, self.mesh)
            self.state = jax.device_put(self.state, self._state_shardings)
        n_params = sum(p.size for p in jax.tree.leaves(self.state.params))
        logger.info(f"model params: {n_params/1e6:.2f}M")

    # ------------------------------------------------------------------
    def fit(
        self,
        datamodule,
        max_epochs: int = 1,
        limit_train_batches: float | int = 1.0,
        log_every_n_steps: int = 50,
        resume_from: str | None = None,
        fid_every_n_epoch: int | None = None,
        vis_every_iter: int | None = None,
    ) -> TrainState:
        self.tracker = self.tracker or get_tracker(
            self.log_dir, config=self.hparams,
            use_wandb=bool((self.hparams.get("wandb") or {}).get("enable")),
        )
        self.ckpt = self.ckpt or CheckpointManager(self.log_dir / "ckpts")
        data_cfg = self._data_cfg
        fid_every_n_epoch = fid_every_n_epoch or data_cfg.get("fid_every_n_epoch", 10 ** 9)
        vis_every_iter = vis_every_iter or data_cfg.get("vis_every_iter", 10 ** 9)

        self.datamodule = datamodule  # exposed for the eval harness
        train_dl = datamodule.train_dataloader()
        if self.mesh is not None:
            n_data = dict(zip(self.mesh.axis_names,
                              self.mesh.devices.shape)).get(
                "data", self.mesh.devices.size)
            assert train_dl.batch_size % n_data == 0, (
                f"batch_size {train_dl.batch_size} must be divisible by the "
                f"data-parallel mesh size {n_data} (set data.params."
                f"batch_size or pl.trainer.strategy=null)"
            )
        first = next(iter(train_dl))
        example = self._device_batch(first, training=True)
        if self.state is None:
            self._init_state(example)
        resumed = False
        resume_epoch = None
        if resume_from:
            self.state = self.ckpt.restore(self.state, resume_from)
            self.global_step = int(self.state.step)
            resume_epoch = self.ckpt.epoch_of(resume_from)
            resumed = True
            logger.warning(f"resumed from {resume_from} at step {self.global_step}")

        pl_trainer = (to_container(self.hparams.get("pl") or {}).get("trainer") or {})
        # per-program XLA options (pl.trainer.xla_options: {flag: value});
        # defaults to the measured-best scoped-VMEM split on TPU
        # (BASELINE.md round-2 sweep)
        xla_options = pl_trainer.get("xla_options")
        if xla_options is None:
            from ..utils.tpu import default_compiler_options

            xla_options = default_compiler_options(self.mesh)
        self._train_step = self._train_step or make_train_step(
            self.model, self.diffusion, self.tx,
            cond_drop_prob=self.cond_drop_prob if self.condition_method else 0.0,
            ema_decay=self.ema_decay, use_ema=self.use_ema,
            accumulate_grad_batches=int(pl_trainer.get("accumulate_grad_batches", 1)),
            compiler_options=xla_options or None,
            mesh=self.mesh,
            state_shardings=self._state_shardings,
        )
        rng = jax.random.PRNGKey(self.seed + 1)

        limit = limit_train_batches
        n_batches = len(train_dl)
        max_batches = (
            int(n_batches * limit) if isinstance(limit, float) else int(limit)
        )

        profile = bool(self.hparams.get("profile"))
        # resume-continuous: one optimizer step consumes one global batch,
        # so the train/img_million curve continues instead of dropping to 0
        samples_seen = self.global_step * train_dl.batch_size
        # Lightning-parity resume: continue from the checkpointed epoch
        # toward max_epochs TOTAL, instead of re-running max_epochs more;
        # keeps the per-epoch shuffle order, FID cadence and epoch-named
        # best checkpoints aligned with an uninterrupted run (ref resume:
        # main.py:126-133 → pl Trainer(ckpt_path=...) restoring the epoch
        # counter).  The epoch comes from the checkpoint's own persisted
        # metadata (meta.json / best filename); the step//steps_per_epoch
        # fallback only applies to bare checkpoints and is wrong if the
        # resuming run uses a different limit_train_batches.
        steps_per_epoch = max(1, min(n_batches, max_batches))
        if not resumed:
            start_epoch = 0
        elif resume_epoch is not None:
            start_epoch = resume_epoch + 1
        else:
            start_epoch = self.global_step // steps_per_epoch
        if resumed and start_epoch:
            logger.info(f"resuming at epoch {start_epoch}/{max_epochs}")
        from collections import deque

        inflight: deque = deque()
        inflight_depth = int(os.environ.get("SGDM_INFLIGHT_DEPTH", "8"))
        for epoch in range(start_epoch, max_epochs):
            train_dl.set_epoch(epoch)
            t_epoch = time.perf_counter()
            t_last = t_epoch
            stats_x: list[np.ndarray] = []
            stats_y: list[np.ndarray] = []
            for i, raw in enumerate(train_dl):
                if i >= max_batches:
                    break
                # profile=1: trace steps 2-12 of epoch 1 (epoch 0 compiles)
                if profile and epoch == 1 and i == 2:
                    jax.profiler.start_trace(str(self.log_dir / "profile"))
                batch = self._device_batch(raw, training=True)
                self.state, metrics = self._train_step(self.state, batch, rng)
                # Bounded dispatch pipeline: without this the host can race
                # arbitrarily far ahead of the device (each queued step
                # pins its host→device batch in HBM) and any later metric
                # fetch blocks for the whole backlog.  Waiting on the step
                # K-behind costs nothing when the device is the bottleneck
                # — the queue never empties, so the device never idles.
                inflight.append(metrics["loss"])
                if len(inflight) > inflight_depth:
                    oldest = inflight.popleft()
                    if hasattr(oldest, "block_until_ready"):
                        oldest.block_until_ready()
                if profile and epoch == 1 and i == 12:
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()
                    logger.warning(f"profiler trace → {self.log_dir}/profile")
                self.global_step += 1
                samples_seen += raw["image"].shape[0]

                if self.global_step % log_every_n_steps == 0:
                    now = time.perf_counter()
                    iters_per_sec = log_every_n_steps / max(now - t_last, 1e-9)
                    t_last = now
                    # DEFERRED metric fetch: float(loss) here would block on
                    # the in-flight step and drain the async dispatch
                    # pipeline (measured −14 % end-to-end at tight log
                    # cadences on the remote chip).  Instead start an async
                    # device→host copy now and EMIT it at the next log
                    # point, when the copy has long completed — values lag
                    # one window but carry their true step label.
                    self._emit_pending_train_log()
                    for a in (metrics["loss"], metrics["ddpm_loss"],
                              metrics["grad_norm"]):
                        try:
                            a.copy_to_host_async()
                        except AttributeError:
                            pass  # non-jax scalar (CPU tests)
                    self._pending_log = (self.global_step, epoch, metrics,
                                         iters_per_sec, samples_seen / 1e6)
                # keep DEVICE arrays here — np.asarray would force a host
                # sync every step and break the async-dispatch pipeline
                # (the conversion happens once at epoch end)
                stats_x.append(metrics["epoch_stats_x"])
                stats_y.append(metrics["epoch_stats_y"])

                if vis_every_iter and self.global_step % vis_every_iter == 0:
                    self._log_images(raw, epoch)

            # epoch boundary: flush the deferred train-log record (the
            # np.concatenate below syncs the device anyway)
            self._emit_pending_train_log()
            # Finalize the previous epoch's async 'last' save NOW (it had
            # the whole epoch to commit, so this is ~free) instead of at
            # the next save_last: validation/FID below can take minutes,
            # and a crash there would otherwise resume one epoch earlier
            # than necessary (meta.last would still name epoch N-2).
            self.ckpt.wait_until_finished()
            # loss-vs-t scatter, binned (wandb_utils.vis_timestep_loss parity)
            if stats_x:
                x = np.concatenate([np.asarray(s) for s in stats_x])
                y = np.concatenate([np.asarray(s) for s in stats_y])
                bins = np.linspace(0, self.diffusion.num_timesteps, 21)
                idx = np.digitize(x, bins) - 1
                per_bin = {
                    f"loss_vs_t/bin{j:02d}": float(y[idx == j].mean())
                    for j in range(20)
                    if np.any(idx == j)
                }
                self.tracker.log(per_bin, step=self.global_step)
            epoch_time = time.perf_counter() - t_epoch
            self.tracker.log(
                {"epoch_time_sec": epoch_time, "epoch": epoch,
                 **self._device_stats()},
                step=self.global_step,
            )

            # Lightning check_val_every_n_epoch cadence (pl/default.yaml:14
            # ← data.trainer); forced-on-resume keeps the resume-FID rule
            check_val_n = int(pl_trainer.get("check_val_every_n_epoch")
                              or 1)
            if resumed or (epoch + 1) % check_val_n == 0:
                self._run_validation(datamodule, epoch, fid_every_n_epoch,
                                     resumed)
            resumed = False
            # async: the write commits in the background under the next
            # epoch's training; drained at fit end below
            self.ckpt.save_last(self.state, epoch)
        self.ckpt.wait_until_finished()
        return self.state

    # ------------------------------------------------------------------
    def _run_validation(self, datamodule, epoch: int, fid_every_n_epoch: int,
                        force_fid: bool) -> None:
        try:
            val_dl = datamodule.val_dataloader()
        except KeyError:
            return
        self._eval_step = self._eval_step or make_eval_step(
            self.model, self.diffusion, mesh=self.mesh,
            params_sharding=(self._state_shardings.params
                             if self._state_shardings is not None else None),
        )
        pl_trainer = (to_container(self.hparams.get("pl") or {}).get("trainer") or {})
        limit_val = pl_trainer.get("limit_val_batches", 8)
        limit_val = (
            int(len(val_dl) * limit_val) if isinstance(limit_val, float)
            else int(limit_val)
        )
        rng = jax.random.PRNGKey(self.seed + 2 + epoch)
        losses, losses_ema = [], []
        for i, raw in enumerate(val_dl):
            if i >= limit_val:
                break
            # NOTE: training=False forces cond_drop_prob=1.0 in the
            # conditioning glue, so val loss is the UNCONDITIONAL loss even
            # for conditional models — faithful to the reference
            # (dynamic_input/condition.py:13 `... if pl_module.training else
            # 1.0` flows into shared_step's loss pass at val time).
            batch = self._device_batch(raw, training=False)
            losses.append(float(self._eval_step(self.state.params, batch, rng)["loss"]))
            losses_ema.append(
                float(self._eval_step(self.state.ema_params, batch, rng)["loss"])
            )
        if losses:
            self.tracker.log(
                {"val/loss": float(np.mean(losses)),
                 "val/loss_ema": float(np.mean(losses_ema)),
                 "epoch": epoch},
                step=self.global_step,
            )

        # FID-driven checkpoint selection (run_exp.py:197-204 parity):
        # epoch 0 runs a 10%-sized FID; resume forces FID on first epoch
        run_fid = (
            self.fid_fn is not None
            and ((epoch + 1) % fid_every_n_epoch == 0 or epoch == 0 or force_fid)
        )
        if run_fid:
            frac = 0.1 if epoch == 0 else 1.0  # lightning_module.py:266-269
            fid = float(self.fid_fn(self, epoch=epoch, fid_num_fraction=frac))
            self.tracker.log({"val/fid_for_ckpt": fid, "epoch": epoch},
                             step=self.global_step)
            self.ckpt.save_best_if_improved(self.state, epoch, fid)

    # ------------------------------------------------------------------
    def _log_images(self, raw_batch: Mapping[str, np.ndarray], epoch: int,
                    max_images: int = 8) -> None:
        """ImageLogger parity (callbacks/my_callbacks.py:45-343): EMA-scope
        guided grids at cond_scale ∈ {0, s}, a same-condition batch, and a
        condition-interpolation (slerp) chain; plus progressive-denoising
        chains."""
        from ..utils.batch_ops import batch_interp_condition, batch_to_samecondition

        vis_cfg = to_container(self.hparams.get("vis") or {})
        sampler_kw = dict(
            sampling_method=self.diff_params.get("sampling_imagelogger", "ddim"),
            num_steps=int(self.diff_params.get("num_timesteps_imagelogger", 250)),
        )
        kw = self._cond_kwargs(raw_batch, training=False)
        cond = kw.get("cond")
        layout = kw.get("layout")
        ids = kw.get("image_batch_ids")  # cluster_lookup learned table
        n = min(max_images, raw_batch["image"].shape[0])
        img_size = raw_batch["image"].shape[1]
        channels = raw_batch["image"].shape[-1]

        def run(tag, s, cond_arr, layout_arr, log_chain=False):
            sample = self._make_sampler(cond_scale=float(s), **sampler_kw)
            b = len(cond_arr) if cond_arr is not None else n
            extra = {}
            if ids is not None:
                extra["image_batch_ids"] = jnp.asarray(ids[:b], jnp.int32)
            imgs, inter = sample(
                self.state.ema_params,
                jax.random.PRNGKey(self.global_step),
                b,
                img_size, channels,
                cond=None if cond_arr is None else jnp.asarray(cond_arr, jnp.float32),
                layout=layout_to_device(layout_arr, self._layout_dim()),
                **extra,
            )
            log = {f"images/{tag}": make_grid(np.asarray(imgs))}
            if log_chain:
                chain = np.asarray(inter["pred_x0"])  # [K,B,H,W,C]
                k, b = chain.shape[:2]
                rows = chain.transpose(1, 0, 2, 3, 4).reshape(k * b, *chain.shape[2:])
                log[f"images/{tag}_chain"] = make_grid(rows, ncol=k)
            self.tracker.log(log, step=self.global_step)

        scales = [self.cond_scale or 0.0]
        if self.condition_method and self.cond_scale:
            scales.append(0.0)
        c_n = None if cond is None else np.asarray(cond[:n])
        l_n = None if layout is None else np.asarray(layout[:n])
        for s in scales:
            run(f"sample_scale{s}", s, c_n, l_n, log_chain=bool(vis_cfg.get("chainvis")))

        if self.condition_method and cond is not None:
            if vis_cfg.get("samecondition", vis_cfg.get("samecond", True)):
                same = batch_to_samecondition({"c": np.asarray(cond[:n])}, 4)["c"]
                same_l = (
                    batch_to_samecondition({"l": np.asarray(layout[:n])}, 4)["l"]
                    if layout is not None else None
                )
                run("samecondition", self.cond_scale or 1.0, same, same_l)
            if vis_cfg.get("interp") and np.asarray(cond).ndim == 2 and n >= 2:
                mixed = batch_interp_condition(np.asarray(cond[:3]), interp_num=4)
                run("cond_interp", self.cond_scale or 1.0, mixed,
                    None if layout is None
                    else np.repeat(np.asarray(layout[:1]), len(mixed), axis=0))

    def _device_stats(self) -> dict[str, float]:
        """Epoch wall-time companion: peak device memory (CUDACallback
        parity, callbacks/callback_common.py:10-30)."""
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            return {
                "peak_hbm_mib": stats.get("peak_bytes_in_use", 0) / 2**20,
                "hbm_in_use_mib": stats.get("bytes_in_use", 0) / 2**20,
            }
        except Exception:
            return {}

    def _make_sampler(self, sampling_method: str, num_steps: int, cond_scale):
        # cache jitted samplers: the FID loop calls sampling_progressive per
        # batch, and rebuilding the jit wrapper would re-trace the whole
        # 250-step scan every batch
        scale_key = tuple(np.ravel(np.asarray(cond_scale)).tolist())
        key = (sampling_method, num_steps, scale_key)
        cache = getattr(self, "_sampler_cache", None)
        if cache is None:
            cache = self._sampler_cache = {}
        if key not in cache:
            # sharded params (tp/fsdp): the fused Pallas sampling kernels
            # cannot be GSPMD-partitioned — keep the XLA path end to end
            sharded = self.fsdp or self.tensor_parallel > 1
            cache[key] = make_sample_fn(
                self.model, self.diffusion,
                sampling_method=sampling_method, num_steps=num_steps,
                cond_scale=cond_scale, scale_type=self.scale_type,
                ddim_eta=self.ddim_eta, clip_denoised=self.clip_denoised,
                dtp=self.dtp, log_num_per_prog=self.log_num_per_prog,
                mesh=self.mesh, pallas_inference=not sharded,
            )
        return cache[key]

    # ------------------------------------------------------------------
    def sampling_progressive(
        self,
        batch_size: int,
        image_size: int,
        channels: int,
        rng: jax.Array,
        cond=None,
        layout=None,
        cond_scale: float | None = None,
        sampling_method: str | None = None,
        num_steps: int | None = None,
        use_ema: bool = True,
        image_batch_ids=None,
    ):
        """Public sampling API (parity: lightning_module.py:136-203)."""
        sample = self._make_sampler(
            sampling_method or self.diff_params.get("sampling_test", "ddim"),
            num_steps or int(self.diff_params.get("num_timesteps_test", 250)),
            self.cond_scale if cond_scale is None else cond_scale,
        )
        params = self.state.ema_params if use_ema else self.state.params
        extra = {}
        if image_batch_ids is not None:  # cluster_lookup learned-table cond
            extra["image_batch_ids"] = jnp.asarray(image_batch_ids, jnp.int32)
        return sample(params, rng, batch_size, image_size, channels,
                      cond=cond, layout=layout, **extra)
