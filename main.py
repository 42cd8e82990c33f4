"""CLI entry point — same override grammar as the reference.

TPU-native rewrite of `main.py:21-143`:

  python main.py data=in64_pickle dynamic=unet_fast \
      sg.params.condition_method=cluster sg.params.cond_dim=5000 \
      sg.params.cond_drop_prob=0.1 sg.params.cond_scale=2 \
      data.params.batch_size=256 name=in64_cluster devices=4

Behavioral parity:
  * `debug=1` shrinkage (main.py:67-76): 3 epochs, bs=4, tiny FID,
  * `run_unittest` shrinkage (main.py:50-66): 5 epochs, bs=16,
    limit_train_batches=32, val_fid_num=5, fid_every_n_epoch=1,
  * `max_epochs += 1` quirk kept (main.py:46-48),
  * seed everything (seed=23 default), resume via `resume_from=`,
  * `train=0` → skip fit, test only.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

from sgdm_tpu.config.engine import Config, compose, instantiate_from_config, to_container
from sgdm_tpu.utils.logging import logger

CONFIG_DIR = Path(__file__).parent / "configs"


def apply_debug_overrides(cfg: Config, run_unittest: bool = False) -> Config:
    """Parity: main.py:50-76."""
    if run_unittest:
        cfg.set_path("data.val_fid_num", 5)
        cfg.set_path("data.test_fid_num", 5)
        cfg.set_path("pl.trainer.max_epochs", 5)
        cfg.set_path("data.trainer.max_epochs", 5)
        cfg.set_path("pl.trainer.limit_train_batches", 32)
        cfg.set_path("pl.trainer.limit_val_batches", 30)
        cfg.set_path("data.params.batch_size", 16)
        cfg.set_path("data.fid_every_n_epoch", 1)
    elif cfg.select("debug"):
        cfg.set_path("data.val_fid_num", 5)
        cfg.set_path("data.test_fid_num", 5)
        cfg.set_path("pl.trainer.max_epochs", 3)
        cfg.set_path("data.trainer.max_epochs", 3)
        cfg.set_path("pl.trainer.limit_train_batches", 32)
        cfg.set_path("pl.trainer.limit_val_batches", 30)
        cfg.set_path("data.params.batch_size", 4)
        cfg.set_path("data.fid_every_n_epoch", 1)
        cfg.set_path("data.vis_every_iter", 10 ** 9)
    return cfg


def run_without_decorator(cfg: Config, run_unittest: bool = False):
    """Parity: main.py:27-143 run_without_decorator."""
    # order matters (main.py:46-76): the +1 rounding-error epoch is added
    # FIRST, then debug/unittest OVERWRITE max_epochs to exactly 5/3 —
    # applying +1 after the overrides trained one extra epoch
    shrunk = bool(run_unittest or cfg.select("debug"))
    cfg = apply_debug_overrides(cfg, run_unittest)

    import jax

    if os.environ.get("SGDM_MULTIHOST"):
        # multi-host SPMD: one process per host, ICI intra-slice, DCN across
        # (SURVEY.md §5.8); coordinator/num_processes come from the standard
        # JAX_COORDINATOR_ADDRESS / cluster env
        jax.distributed.initialize()
        logger.info(
            f"jax.distributed: process {jax.process_index()}/{jax.process_count()}"
        )

    if os.environ.get("SGDM_FORCE_CPU"):  # debug/smoke runs without the chip
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    seed = int(cfg.select("seed", 23))
    logger.info(f"seed={seed}; devices={jax.devices()}")

    # max_epochs += 1 "for rounding error in evaluation of FID"
    # (main.py:46-48); debug/unittest already hold their exact final values
    max_epochs = int(cfg.select("pl.trainer.max_epochs", 1)) + (0 if shrunk else 1)

    # --- build the trainer (sg group) --------------------------------
    sg_params = to_container(cfg.sg.params)
    sg_params["pl"] = to_container(cfg.pl)
    # explicit re-injection of the (possibly debug-mutated) data group —
    # sg.params.data = ${data} happens to resolve by reference in this
    # engine so mutations already propagate, but the trainer's view of the
    # data config should not depend on that interpolation subtlety
    sg_params["data"] = to_container(cfg.data)
    sg_params["wandb"] = to_container(cfg.select("wandb", {}))
    sg_params["seed"] = seed
    trainer = instantiate_from_config({"target": cfg.sg.target, "params": sg_params})

    # --- FID evaluator (only if FID image dirs are configured) -------
    fid_dir = cfg.select("data.fid_train_image_dir")
    if fid_dir:
        try:
            from sgdm_tpu.eval.harness import make_val_fid_fn

            trainer.set_fid_fn(make_val_fid_fn(to_container(cfg.data)))
        except Exception as e:  # FID stack optional at train time
            logger.warning(f"FID evaluator unavailable: {e}")

    # --- data --------------------------------------------------------
    data = instantiate_from_config(to_container(cfg.data))
    data.setup()
    for split, ds in data.datasets.items():
        logger.info(f"dataset[{split}]: {len(ds)} samples")

    # --- fit / test --------------------------------------------------
    if cfg.select("train", True):
        trainer.fit(
            data,
            max_epochs=max_epochs,
            limit_train_batches=cfg.select("pl.trainer.limit_train_batches", 1.0),
            log_every_n_steps=int(cfg.select("pl.trainer.log_every_n_steps", 50)),
            resume_from=cfg.select("resume_from"),
        )
    elif cfg.select("resume_from"):
        # test-only (`train=0 resume_from=...`): restore before evaluating
        from sgdm_tpu.training.checkpoints import CheckpointManager
        from sgdm_tpu.utils.logging import get_tracker

        trainer.ckpt = CheckpointManager(
            Path(str(cfg.select("log_dir"))) / "ckpts"
        )
        trainer.tracker = get_tracker(
            str(cfg.select("log_dir")), use_wandb=False
        )
        trainer.datamodule = data
        first = next(iter(data.train_dataloader()))
        example = trainer._device_batch(first, training=True)
        trainer._init_state(example)
        trainer.state = trainer.ckpt.restore(trainer.state, cfg.select("resume_from"))

    if cfg.select("profile"):
        logger.warning("profile=1: skipping test-time eval (parity lightning_module.py:319)")
        return trainer

    try:
        from sgdm_tpu.eval.harness import run_test_and_all_exploration

        run_test_and_all_exploration(trainer, to_container(cfg))
    except ImportError:
        logger.warning("eval harness not available; skipping test phase")
    return trainer


def main() -> None:
    overrides = [a for a in sys.argv[1:] if a not in ("--help", "-h")]
    if len(overrides) != len(sys.argv) - 1:
        print(__doc__)
        return
    cfg = compose(CONFIG_DIR, "config_base", overrides)
    name = cfg.select("name", "default")
    log_dir = str(cfg.select("log_dir", f"./outputs/{name}"))
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    run_without_decorator(cfg)


if __name__ == "__main__":
    main()
