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

from ..conditioning.condition import (
    layout_dim_of,
    layout_to_device,
    prepare_sampling_kwargs,
)
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
                          random_sample_condition: bool = False,
                          want_chain: bool = False):
    """raw batch dict → uint8 samples, via the trainer's jitted sampler.
    With ``want_chain`` the fn returns (samples, pred_x0 chain [K,B,H,W,C])
    for the chainvis figure modes."""
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
        extra = {}
        if kw.get("image_batch_ids") is not None:  # cluster_lookup table
            extra["image_batch_ids"] = kw["image_batch_ids"]
        imgs, inter = trainer.sampling_progressive(
            b, h, c,
            jax.random.PRNGKey(seed),
            cond=None if cond is None else jnp.asarray(cond, dtype=jnp.float32),
            layout=layout_to_device(
                layout,
                layout_dim_of(trainer.condition_method, trainer.condition_cfg),
            ),
            cond_scale=cond_scale,
            sampling_method=sampling_method,
            num_steps=num_steps,
            **extra,
        )
        if want_chain:
            # pred_x0 is already uint8 [0,255] when the sampler ran with
            # return_uint8 (diffusion/core.py:151-154) — _unnormalize is a
            # no-op for uint8 and only rescales float [-1,1] chains
            from .papervis import _unnormalize

            return np.asarray(imgs), _unnormalize(inter["pred_x0"])
        return np.asarray(imgs)

    return sample_fn


def _ds_vis_params(image_size: int, dataset_name: str = "") -> tuple[int, int]:
    """(samecondition_num, grid padding) — parity with
    eval_fid.py:194-213 `get_samecondition_num`/`get_makegrid_padding`,
    keyed by dataset name (in32→18/1, in64→9/2, cocostuff64/coco64/voc64
    →11/5) with an image-size fallback for unknown datasets."""
    name = (dataset_name or "").lower()
    if name.startswith("in32"):
        return 18, 1
    if name.startswith("in64"):
        return 9, 2
    if name.startswith(("cocostuff64", "coco64", "voc64")):
        return 11, 5
    if image_size <= 32:
        return 18, 1
    if image_size <= 64:
        return 9, 2
    return 11, 5


def _make_vis_hooks(trainer, vis: Mapping[str, Any], papervis_dir: Path,
                    image_size: int, dataset_name: str = ""):
    """Build (batch_transform, vis_callback) for the FID sampling loop.

    Parity: eval_fid.py:216-280 `eval_fid_callback_before` (batch rewrites)
    + :283-474 `eval_fid_callback_after` (papervis grids).  Returns
    (None, None) when no in-loop vis toggle is on.
    """
    from ..utils.batch_ops import (
        batch_interp_condition,
        batch_to_samecondition,
        batch_to_samecondition_v2,
    )
    from . import papervis as pv

    same_n, pad = _ds_vis_params(image_size, dataset_name)
    m = trainer.condition_method
    prefix = f"{m or 'uncond'}"

    v2_modes = {  # toggle → key that keeps its own rows (eval_fid.py:241-280)
        "same_cluster_diff_lost": "lostbboxmask",
        "diff_cluster_same_lost": "cluster",
        "same_stego_diff_cluster": "cluster",
        "diff_z_same_stego": "cluster",
    }
    before_on = [k for k in ("samecondition", "interp",
                             "same_cluster_same_lost", *v2_modes)
                 if vis.get(k)]
    after_on = [k for k in (
        "random", "random_stego_with_mask", "random_lost_with_box",
        "samecondition", "interp", "same_cluster_same_lost", *v2_modes,
    ) if vis.get(k)]
    if not (before_on or after_on):
        return None, None

    def batch_transform(batch: dict) -> dict:
        if vis.get("samecondition") or vis.get("same_cluster_same_lost"):
            batch = batch_to_samecondition(batch, same_n)
        for mode, diff_key in v2_modes.items():
            if vis.get(mode):
                n = 8 if mode == "diff_z_same_stego" else same_n
                batch = batch_to_samecondition_v2(batch, diff_key, n)
        if vis.get("interp") and m and m in batch and \
                np.asarray(batch[m]).ndim == 2:
            c = np.asarray(batch[m])
            n_pts = int((vis.get("interp_c") or {}).get("n", 9))
            mixed = batch_interp_condition(c, n_pts)[: len(c)]
            if len(mixed) < len(c):
                mixed = np.concatenate([mixed, c[len(mixed):]])
            batch[m] = mixed
        return batch

    def vis_callback(bi: int, batch: dict, samples: np.ndarray) -> None:
        p = papervis_dir
        stego = batch.get("stegomask")
        lost = batch.get("lostbboxmask")
        img = batch.get("image")
        if vis.get("random"):
            ncol = 16 if image_size <= 32 else 9
            pv.draw_grid_img(samples[: ncol * ncol],
                             p / f"{prefix}_random_uncurated_{bi}.png",
                             ncol=ncol, padding=pad)
        if vis.get("random_stego_with_mask") and stego is not None:
            pv.draw_grid_random_stego_with_mask(
                samples[:32], stego[:32], img[:32],
                p / f"{prefix}_random_stego_with_mask_{bi}.png",
                ncol=4, padding=pad)
        if vis.get("random_lost_with_box") and lost is not None:
            pv.draw_grid_random_lost_with_box(
                samples[:64], lost[:64],
                p / f"{prefix}_random_lost_with_box_{bi}.png",
                ncol=8, padding=pad)
        if vis.get("samecondition"):
            pv.draw_grid_img(samples, p / f"{prefix}_samecondition_{bi}.png",
                             ncol=same_n, padding=pad)
        if vis.get("interp"):
            ic = vis.get("interp_c") or {}
            n_pts = int(ic.get("n", 9))
            n_smp = int(ic.get("samples", 16))
            pv.draw_grid_interp(samples[: n_pts * n_smp],
                                p / f"{prefix}_interp_{bi}.png",
                                ncol=n_pts, padding=pad)
        for mode in ("same_cluster_same_lost", "same_cluster_diff_lost",
                     "diff_cluster_same_lost"):
            if vis.get(mode) and lost is not None:
                for gi, s0 in enumerate(range(0, len(samples) - same_n + 1, same_n)):
                    pv.draw_grid_lost_bbox(
                        samples[s0:s0 + same_n], lost[s0:s0 + same_n],
                        img[s0:s0 + same_n],
                        p / f"{prefix}_{mode}_{bi}_{gi}.png", padding=pad)
        for mode, n in (("same_stego_diff_cluster", same_n),
                        ("diff_z_same_stego", 8)):
            if vis.get(mode) and stego is not None:
                for gi, s0 in enumerate(range(0, len(samples) - n + 1, n)):
                    pv.draw_grid_stego(
                        samples[s0:s0 + n], stego[s0:s0 + n], img[s0:s0 + n],
                        p / f"{prefix}_{mode}_{bi}_{gi}.png", padding=pad)

    return (batch_transform if before_on else None), vis_callback


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

    # in-loop papervis hooks ride the main FID sampling loop
    # (eval_fid.py:216-474 callbacks) — built once, applied to main runs
    vis = cfg.get("vis") or {}
    papervis_dir = log_dir / "papervis"
    first_raw = next(iter(train_dl))
    image_size = first_raw["image"].shape[1]
    batch_transform, vis_callback = _make_vis_hooks(
        trainer, vis, papervis_dir, image_size,
        dataset_name=str(data_cfg.get("name") or ""),
    )

    def one_run(tag: str, cond_scale: float, *, method=None, steps=None,
                random_cond=False, num=None, with_vis=False):
        sample_dir = log_dir / f"test_{tag}{_process_suffix()}"
        fn = _make_batch_sample_fn(
            trainer, cond_scale, method or sampling_method, steps or num_steps,
            random_sample_condition=random_cond,
        )
        sample_to_dir(
            fn, train_dl, num or fid_num, sample_dir,
            batch_transform=batch_transform if with_vis else None,
            vis_callback=vis_callback if with_vis else None,
        )
        d, fid = get_fid_dict(sample_dir, gt_dir, _extractor(), debug=debug)
        results.update({f"test/{tag}/{k}": v for k, v in d.items()})
        if trainer.tracker:
            trainer.tracker.log(
                {f"test/{tag}/{k}": v for k, v in d.items()},
                step=trainer.global_step,
            )
        logger.warning(f"test[{tag}] fid={fid}")
        return fid

    # cond-scale list [s, 0] (exp.cond_scale toggle); the papervis hooks
    # ride the main (non-zero scale) run like the reference's eval_fid loop
    if exp.get("cond_scale", True):
        scale_list = get_condition_scale_list(trainer.cond_scale)
        for s in scale_list:
            one_run(f"{sampling_method}{num_steps}_s{s}", float(s),
                    with_vis=(s == scale_list[0]))

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

    if exp.get("scoremix"):
        # score-level condition mixing (run_exp.py:132-134; the reference's
        # sampler path is NotImplementedError — this one works, see
        # training.state.make_scoremix_sample_fn).  Each consecutive
        # condition pair is swept over `interp` mixing weights in ONE
        # jitted call (per-sample weights); same_noise repeats x_T per pair.
        import jax
        import jax.numpy as jnp

        from ..training.state import make_scoremix_sample_fn
        from .papervis import draw_grid_scoremix

        sc = exp.get("scoremix_c") or {}
        interp = int(sc.get("interp", 3))
        same_noise = bool(sc.get("same_noise", True))
        mixer = make_scoremix_sample_fn(
            trainer.model, trainer.diffusion,
            sampling_method=sampling_method, num_steps=num_steps,
            cond_scale=float(trainer.cond_scale or 1.0),
            scale_type=trainer.scale_type,
            clip_denoised=trainer.clip_denoised, dtp=trainer.dtp,
        )

        def scoremix_fn(batch, seed):
            kw = prepare_sampling_kwargs(
                trainer.condition_method, dict(batch),
                trainer.cond_scale, condition_cfg=trainer.condition_cfg,
                cond_drop_prob=trainer.cond_drop_prob or 0.1,
            )
            cond = np.asarray(kw["cond"])
            n_pairs = max(len(cond) // interp, 1)
            # pair p = (cond[p], cond[p+1]); rows = pairs × interp weights
            ca = np.repeat(cond[:n_pairs], interp, axis=0)
            cb = np.repeat(np.roll(cond, -1, axis=0)[:n_pairs], interp, axis=0)
            w = np.tile(np.linspace(0.0, 1.0, interp), n_pairs)
            b = len(ca)
            h = batch["image"].shape[1]
            c = batch["image"].shape[-1]
            rng = jax.random.PRNGKey(seed)
            x_T = None
            if same_noise:
                noise = jax.random.normal(rng, (n_pairs, h, h, c))
                x_T = jnp.repeat(noise, interp, axis=0)
            imgs, _ = mixer(
                trainer.state.ema_params, rng, b, h, c,
                jnp.asarray(ca, jnp.float32), jnp.asarray(cb, jnp.float32),
                jnp.asarray(w, jnp.float32), x_T=x_T,
            )
            return np.asarray(imgs)

        sample_dir = log_dir / f"test_scoremix{_process_suffix()}"
        sample_to_dir(scoremix_fn, train_dl, fid_num, sample_dir)
        d, fid = get_fid_dict(sample_dir, gt_dir, _extractor(), debug=debug)
        results.update({f"test/scoremix/{k}": v for k, v in d.items()})
        # papervis panel: rows = pairs, cols = mixing weights
        first = scoremix_fn(dict(first_raw), 0)
        draw_grid_scoremix(first, log_dir / "papervis" / "scoremix.png",
                           ncol=interp)
        logger.warning(f"test[scoremix] fid={fid}")

    # standalone vis toggles (run_exp.py:26-71 run_test_vis + the chainvis
    # modes of eval_fid.py:323-357, drawn from one dedicated batch)
    if vis.get("kmeans_vis"):
        # grids of REAL train images per cluster id (run_test_vis:30-48)
        from .papervis import draw_grid_clustervis

        rng = np.random.default_rng(0)
        k = int((trainer.condition_cfg.get("cluster") or {}).get("k", 100))
        cluster_ids = rng.integers(0, max(k, 1), size=20)
        per = 256 if image_size <= 32 else 32
        found: dict[int, list] = {int(i): [] for i in cluster_ids}
        for raw in train_dl:
            cl = raw.get("cluster")
            if cl is None:
                break
            ids = np.asarray(cl).argmax(-1)
            for j, cid in enumerate(ids):
                bucket = found.get(int(cid))
                if bucket is not None and len(bucket) < per:
                    bucket.append(np.clip(
                        (np.asarray(raw["image"][j]) + 1) * 127.5, 0, 255
                    ).astype(np.uint8))
            if all(len(v) >= per for v in found.values()):
                break
        ncol = 16 if image_size <= 32 else 8
        for cid, imgs in found.items():
            if imgs:
                draw_grid_clustervis(
                    imgs, papervis_dir / f"cluster{cid}.png", ncol=ncol)

    if vis.get("cluster_hist_vis"):
        # images-per-cluster histogram (papervis_utils.py:90-97)
        from .papervis import cluster_hist_vis_fn

        counts: dict[int, int] = {}
        for raw in train_dl:
            cl = raw.get("cluster")
            if cl is None:
                break
            for cid in np.asarray(cl).argmax(-1):
                counts[int(cid)] = counts.get(int(cid), 0) + 1
        if counts:
            cluster_hist_vis_fn(np.asarray(list(counts.values())),
                                papervis_dir / "cluster_hist_vis.png")

    if vis.get("chainvis") or vis.get("stego_chainvis") or vis.get("lost_chainvis"):
        # progressive-denoising chains from one dedicated batch
        # (eval_fid.py:323-357 + draw_grid_chainvis :292-302)
        from .papervis import (
            draw_chain_grid,
            draw_grid_lost_chainvis,
            draw_grid_stego_chainvis,
        )

        n = int((vis.get("chainvis_c") or {}).get("samples", 7))
        raw = {k: np.asarray(v)[:n] for k, v in dict(first_raw).items()}
        chain_fn = _make_batch_sample_fn(
            trainer, float(trainer.cond_scale or 0), sampling_method,
            num_steps, want_chain=True,
        )
        _, chain = chain_fn(raw, 0)
        if vis.get("chainvis"):
            draw_chain_grid(chain, papervis_dir / "chainvis.png")
        if vis.get("stego_chainvis") and raw.get("stegomask") is not None:
            draw_grid_stego_chainvis(chain, raw["stegomask"], raw["image"],
                                     papervis_dir / "stego_chainvis.png")
        if vis.get("lost_chainvis") and raw.get("lostbboxmask") is not None:
            draw_grid_lost_chainvis(chain, raw["lostbboxmask"], raw["image"],
                                    papervis_dir / "lost_chainvis.png")

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
                else layout_to_device(
                    np.asarray(kw["layout"][0]),
                    layout_dim_of(trainer.condition_method,
                                  trainer.condition_cfg),
                ),
                sampling_method=sampling_method, num_steps=num_steps,
            )
            draw_grid(imgs, papervis_dir / "condscale_sweep.png", ncol=5)
    # the primary run's dir name, constructed EXACTLY like the cond-scale
    # loop's tag (scale-list element, not raw trainer.cond_scale — the raw
    # value spells "sNone"/"s0.0" where the loop wrote "s0" and the evals
    # would silently skip)
    primary_scale = get_condition_scale_list(trainer.cond_scale)[0]
    primary_dir = log_dir / (
        f"test_{sampling_method}{num_steps}_s{primary_scale}"
        f"{_process_suffix()}"
    )
    if vis.get("knn") or vis.get("knn_vis"):
        from .knn_eval import get_knn_eval_dict

        sample_dir = primary_dir
        if sample_dir.exists():
            results.update(get_knn_eval_dict(
                sample_dir, gt_dir, papervis_dir=papervis_dir
            ))
    if vis.get("tsne") or vis.get("tsne_vis"):
        from .tsne import kluster_tsne_vis

        sample_dir = primary_dir
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
