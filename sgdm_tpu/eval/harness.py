"""Evaluation orchestration: validation FID + test experiment suite.

TPU-native rewrite of `eval/run_exp.py` + `eval/test_exps/`:

  * `make_val_fid_fn` — validation FID used for best-checkpoint selection
    (`run_exp.py:153-206 run_validation`): sample `val_fid_num` images at
    the configured cond_scale (epoch 0 at 10% size, lightning_module.py:
    266-269) into a per-process dir (`_rank{i}` suffix parity,
    common_stuff.py:127-128), compute FID vs the train image dir,
  * `run_test_and_all_exploration` (`run_exp.py:73-149`): the cond-scale
    list `[s, 0]` (common_stuff.py:43-48), plus oracle (directimage,
    `oracle_related.py:8-44`), randomsample (random-condition FID control,
    `sampling_related.py:9-49`) and the ablate_scale sweep,
  * `generate_fid_reference_dir` — dump N real train/val images as PNGs
    (`dataset/ds_utils/main_generate_images_for_fid.py` parity).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Mapping

import numpy as np

from ..conditioning.condition import prepare_sampling_kwargs
from ..utils.logging import logger
from .fid_engine import InceptionExtractor, get_fid_dict, sample_to_dir

__all__ = [
    "make_val_fid_fn",
    "run_test_and_all_exploration",
    "generate_fid_reference_dir",
    "get_condition_scale_list",
]

_EXTRACTOR: InceptionExtractor | None = None


def _extractor() -> InceptionExtractor:
    global _EXTRACTOR
    if _EXTRACTOR is None:
        _EXTRACTOR = InceptionExtractor()
    return _EXTRACTOR


def get_condition_scale_list(cond_scale: float | None) -> list[float]:
    """Parity: common_stuff.py:43-48."""
    if not cond_scale:
        return [0]
    return [cond_scale, 0]


def _process_suffix() -> str:
    import jax

    return f"_rank{jax.process_index()}"


def _make_batch_sample_fn(trainer, cond_scale: float,
                          sampling_method: str | None = None,
                          num_steps: int | None = None,
                          random_sample_condition: bool = False):
    """raw batch dict → uint8 samples, via the trainer's jitted sampler."""
    import jax
    import jax.numpy as jnp

    if sampling_method == "directimage":
        # oracle: pass-through of real images (oracle_related.py:23-25 via
        # common_stuff.py get_sample_fn directimage branch)
        def direct(batch, seed):
            img = np.asarray(batch["image"])
            return np.clip((img + 1) * 127.5, 0, 255).astype(np.uint8)

        return direct

    def sample_fn(batch, seed):
        kw = prepare_sampling_kwargs(
            trainer.condition_method, dict(batch), cond_scale,
            random_sample_condition=random_sample_condition,
            condition_cfg=trainer.condition_cfg,
            cond_drop_prob=trainer.cond_drop_prob or 0.1,
        )
        cond = kw.get("cond")
        layout = kw.get("layout")
        b, h, w, c = batch["image"].shape
        imgs, _ = trainer.sampling_progressive(
            b, h, c,
            jax.random.PRNGKey(seed),
            cond=None if cond is None else jnp.asarray(cond, dtype=jnp.float32),
            layout=None if layout is None else jnp.asarray(layout, dtype=jnp.float32),
            cond_scale=cond_scale,
            sampling_method=sampling_method,
            num_steps=num_steps,
        )
        return np.asarray(imgs)

    return sample_fn


def _resolve_gt_dir(data_cfg: Mapping[str, Any]) -> Path:
    gt = Path(str(data_cfg["fid_train_image_dir"])).expanduser()
    if not gt.exists():
        raise FileNotFoundError(
            f"FID reference dir {gt} missing — generate it with "
            f"`python -m sgdm_tpu.eval.harness <data>` "
            f"(main_generate_images_for_fid parity)"
        )
    return gt


def make_val_fid_fn(data_cfg: Mapping[str, Any]):
    """Build the trainer-injectable validation-FID hook."""

    def val_fid(trainer, epoch: int, fid_num_fraction: float = 1.0) -> float:
        gt_dir = _resolve_gt_dir(data_cfg)
        fid_num = max(int(data_cfg["val_fid_num"] * fid_num_fraction), 16)

        if epoch == 0:
            # epoch-0 oracle: FID of REAL images vs the reference dir
            # (run_exp.py:193-195 test_oracle directimage; sized to the val
            # budget here rather than the reference's fixed 50k)
            oracle_dir = Path(trainer.log_dir) / f"oracle{_process_suffix()}"
            sample_to_dir(
                _make_batch_sample_fn(trainer, 0.0, "directimage"),
                trainer.datamodule.train_dataloader(), fid_num, oracle_dir,
            )
            d, oracle = get_fid_dict(
                oracle_dir, gt_dir, _extractor(), debug=trainer.debug
            )
            trainer.tracker.log(
                {"val/oracle_fid": oracle, "epoch": epoch},
                step=trainer.global_step,
            )
            logger.warning(f"oracle fid = {oracle}")
        sample_dir = (
            Path(trainer.log_dir)
            / f"val_samples_ep{epoch}{_process_suffix()}"
        )
        sampling_method = trainer.diff_params.get("sampling_val", "ddim")
        num_steps = int(trainer.diff_params.get("num_timesteps_val", 50))
        sample_fn = _make_batch_sample_fn(
            trainer, trainer.cond_scale or 0.0, sampling_method, num_steps
        )
        # FID always samples from the TRAIN loader (main_exp.py:31-35)
        loader = trainer.datamodule.train_dataloader()
        sample_to_dir(sample_fn, loader, fid_num, sample_dir)
        fid_dict, fid = get_fid_dict(
            sample_dir, gt_dir, _extractor(), debug=trainer.debug
        )
        trainer.tracker.log(
            {f"val/{k}": v for k, v in fid_dict.items()},
            step=trainer.global_step,
        )
        return fid

    return val_fid


def run_test_and_all_exploration(trainer, cfg: Mapping[str, Any]) -> dict:
    """Parity: run_exp.py:73-149.  Requires a fitted/restored trainer."""
    data_cfg = cfg["data"]
    exp = cfg.get("exp") or {}
    debug = bool(cfg.get("debug"))
    results: dict[str, Any] = {}
    try:
        # exp.dir4fid overrides the GT folder (run_exp.py:90-99); the test
        # phase otherwise compares against the val image dir like the
        # reference (run_exp.py:89)
        if exp.get("dir4fid"):
            gt_dir = Path(str(exp["dir4fid"])).expanduser()
            assert gt_dir.exists(), f"exp.dir4fid={gt_dir} not found"
        else:
            gt_dir = Path(
                str(data_cfg.get("fid_val_image_dir")
                    or data_cfg["fid_train_image_dir"])
            ).expanduser()
            if not gt_dir.exists():
                gt_dir = _resolve_gt_dir(data_cfg)
    except (FileNotFoundError, KeyError, TypeError) as e:
        logger.warning(f"test phase skipped: {e}")
        return results

    import sgdm_tpu.config.engine as _eng  # lazy, for datamodule rebuild

    data = _eng.instantiate_from_config(_eng.to_container(cfg["data"]))
    data.setup()
    train_dl = data.train_dataloader()  # FID always samples train loader
    fid_num = int(data_cfg["test_fid_num"]) if not debug else 16
    sampling_method = trainer.diff_params.get("sampling_test", "ddim")
    num_steps = int(trainer.diff_params.get("num_timesteps_test", 250))
    log_dir = Path(trainer.log_dir)

    def one_run(tag: str, cond_scale: float, *, method=None, steps=None,
                random_cond=False, num=None):
        sample_dir = log_dir / f"test_{tag}{_process_suffix()}"
        fn = _make_batch_sample_fn(
            trainer, cond_scale, method or sampling_method, steps or num_steps,
            random_sample_condition=random_cond,
        )
        sample_to_dir(fn, train_dl, num or fid_num, sample_dir)
        d, fid = get_fid_dict(sample_dir, gt_dir, _extractor(), debug=debug)
        results.update({f"test/{tag}/{k}": v for k, v in d.items()})
        if trainer.tracker:
            trainer.tracker.log(
                {f"test/{tag}/{k}": v for k, v in d.items()},
                step=trainer.global_step,
            )
        logger.warning(f"test[{tag}] fid={fid}")
        return fid

    # cond-scale list [s, 0] (exp.cond_scale toggle)
    if exp.get("cond_scale", True):
        for s in get_condition_scale_list(trainer.cond_scale):
            one_run(f"{sampling_method}{num_steps}_s{s}", float(s))

    if exp.get("test_oracle"):
        one_run("oracle", 0.0, method="directimage",
                num=500 if debug else 50_000)

    if exp.get("randomsample"):
        one_run(f"randomsample_s{trainer.cond_scale}",
                float(trainer.cond_scale or 0), random_cond=True)

    if exp.get("ablate_scale"):
        for s in exp.get("ablate_scale_list", [6]):
            one_run(f"ablate_s{s}", float(s))

    if exp.get("condmix"):
        # condition-mixing FID: interpolate consecutive conditions
        # (run_exp.py → sampling_related.py condmix_4test; the mixing itself
        # uses slerp chains, utils.batch_ops.batch_interp_condition)
        from ..utils.batch_ops import batch_interp_condition

        interp = int((exp.get("condmix_c") or {}).get("interp", 3))

        base_fn = _make_batch_sample_fn(
            trainer, float(trainer.cond_scale or 0), sampling_method, num_steps
        )

        def condmix_fn(batch, seed):
            batch = dict(batch)
            m = trainer.condition_method
            if m in batch and np.asarray(batch[m]).ndim == 2:
                cond = np.asarray(batch[m])
                mixed = batch_interp_condition(cond, interp)[: len(cond)]
                if len(mixed) < len(cond):
                    mixed = np.concatenate([mixed, cond[len(mixed):]])
                batch[m] = mixed
            return base_fn(batch, seed)

        sample_dir = log_dir / f"test_condmix{_process_suffix()}"
        sample_to_dir(condmix_fn, train_dl, fid_num, sample_dir)
        d, fid = get_fid_dict(sample_dir, gt_dir, _extractor(), debug=debug)
        results.update({f"test/condmix/{k}": v for k, v in d.items()})
        logger.warning(f"test[condmix] fid={fid}")

    # vis toggles (run_exp.py:26-71 run_test_vis)
    vis = cfg.get("vis") or {}
    papervis_dir = log_dir / "papervis"
    if vis.get("condscale"):
        from .papervis import condscale_sweep_images, draw_grid

        raw = next(iter(train_dl))
        kw = prepare_sampling_kwargs(
            trainer.condition_method, dict(raw), trainer.cond_scale,
            condition_cfg=trainer.condition_cfg,
            cond_drop_prob=trainer.cond_drop_prob or 0.1,
        )
        if kw.get("cond") is not None:
            b, h, w, c = raw["image"].shape
            imgs = condscale_sweep_images(
                trainer, np.asarray(kw["cond"][0]),
                scales=[0.0, 1.0, 2.0, 4.0, 6.0], image_size=h, channels=c,
                layout=None if kw.get("layout") is None
                else np.asarray(kw["layout"][0]),
                sampling_method=sampling_method, num_steps=num_steps,
            )
            draw_grid(imgs, papervis_dir / "condscale_sweep.png", ncol=5)
    if vis.get("knn"):
        from .knn_eval import get_knn_eval_dict

        sample_dir = log_dir / f"test_{sampling_method}{num_steps}_s{trainer.cond_scale}{_process_suffix()}"
        if sample_dir.exists():
            results.update(get_knn_eval_dict(
                sample_dir, gt_dir, papervis_dir=papervis_dir
            ))
    if vis.get("tsne"):
        from .tsne import kluster_tsne_vis

        sample_dir = log_dir / f"test_{sampling_method}{num_steps}_s{trainer.cond_scale}{_process_suffix()}"
        if sample_dir.exists():
            kluster_tsne_vis(sample_dir, gt_dir,
                             save_path=papervis_dir / "tsne.png")

    (log_dir / "test_results.json").write_text(json.dumps(results, indent=2))
    return results


# ----------------------------------------------------------------------

def generate_fid_reference_dir(
    dataset, out_dir: str | Path, num: int = 50_000
) -> Path:
    """Dump real images as img{i}.png (main_generate_images_for_fid parity)."""
    from PIL import Image

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n = min(num, len(dataset))
    for i in range(n):
        img = dataset[i]["image"]
        arr = np.clip((np.asarray(img) + 1) * 127.5, 0, 255).astype(np.uint8)
        Image.fromarray(arr if arr.shape[-1] > 1 else arr[..., 0]).save(
            out / f"img{i}.png"
        )
    logger.info(f"wrote {n} reference images to {out}")
    return out
