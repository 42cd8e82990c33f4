"""FID engine: images → inception features → metric dict.

TPU-native rewrite of `eval/eval_fid.py`:

  * `InceptionExtractor` replaces the three external stacks with one on-TPU
    network; the *resize kernel* — the #1 parity trap (SURVEY.md §7) — is
    explicit: `clean` = per-channel float32 PIL-bicubic on the 299×299 resize
    exactly like clean-fid, `bilinear` = TF-style bilinear (what
    torch-fidelity feeds its net) on device,
  * `get_fid_dict` reproduces the reference's metric dict keys
    (`eval_fid.py:138-191`): clean_fid_raw, sfid, fid_tf, is_tf_s1/s10 (+
    stds), precision/recall/density/coverage on a 5k subsample,
  * `sample_to_dir` is the sample→PNG-dir loop (`eval_fid.py:476-608`):
    cycle the train loader, build condition kwargs, run the jitted guided
    sampler, save `img{i}.png`.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable, Iterable

import numpy as np

from ..utils.logging import logger
from .inception import FIDInceptionV3, load_torch_weights, random_params
from .metrics import FeatureStats, compute_prdc, frechet_distance, inception_score

__all__ = ["InceptionExtractor", "get_fid_dict", "sample_to_dir", "cycle"]

_WEIGHTS_ENV = "SGDM_INCEPTION_WEIGHTS"
_DEFAULT_WEIGHTS = [
    "/root/data/pt_inception-2015-12-05-6726825d.pth",
    os.path.expanduser("~/.cache/sgdm/pt_inception-2015-12-05-6726825d.pth"),
]


def _find_weights() -> str | None:
    cand = os.environ.get(_WEIGHTS_ENV)
    paths = ([cand] if cand else []) + _DEFAULT_WEIGHTS
    for p in paths:
        if p and Path(p).exists():
            return p
    return None


def _pil_bicubic_resize_float(img: np.ndarray, size: int = 299) -> np.ndarray:
    """clean-fid's 'clean' resize: float32 PIL-bicubic per channel."""
    from PIL import Image

    img = img.astype(np.float32)
    out = np.empty((size, size, img.shape[2]), dtype=np.float32)
    for c in range(img.shape[2]):
        ch = Image.fromarray(img[:, :, c], mode="F")
        out[:, :, c] = np.asarray(
            ch.resize((size, size), resample=Image.BICUBIC), dtype=np.float32
        )
    return out


class InceptionExtractor:
    """Jitted inception feature extraction with explicit resize modes."""

    def __init__(self, weights_path: str | None = None, seed: int = 0,
                 batch_size: int = 64):
        import jax

        self.batch_size = batch_size
        self._dir_cache: dict = {}
        self.model = FIDInceptionV3()
        weights_path = weights_path or _find_weights()
        if weights_path:
            logger.info(f"inception weights: {weights_path}")
            self.params = load_torch_weights(weights_path)
            self.pretrained = True
            # first-use golden assertion: real weights auto-verify the port
            # (sidecar golden or torch replica; utils.weight_verify)
            from ..utils.weight_verify import verify_inception_load

            verify_inception_load(weights_path, self.params)
        else:
            logger.warning(
                "No pt_inception weights found (set SGDM_INCEPTION_WEIGHTS). "
                "Using a DETERMINISTIC RANDOM inception network: FID values "
                "are self-consistent but NOT comparable to published numbers."
            )
            self.params = random_params(seed)
            self.pretrained = False

        @jax.jit
        def _forward(params, x299):
            return self.model.apply({"params": params}, x299)

        self._forward = _forward

    # ------------------------------------------------------------------
    def _resize_batch(self, imgs: np.ndarray, mode: str) -> np.ndarray:
        """uint8 [B,H,W,3] → float32 [B,299,299,3] in [-1,1]."""
        if mode == "clean":
            # per-image PIL resizes parallelize well (PIL releases the GIL);
            # at 50k-image FID runs this is the host-side hot loop
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=8) as pool:
                out = np.stack(list(pool.map(_pil_bicubic_resize_float, imgs)))
            return out / 127.5 - 1.0
        if mode == "bilinear":
            import jax
            import jax.numpy as jnp

            x = jnp.asarray(imgs, dtype=jnp.float32)
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear"
            )
            return np.asarray(x) / 127.5 - 1.0
        raise ValueError(mode)

    def features_from_arrays(
        self, imgs: np.ndarray, mode: str = "clean"
    ) -> dict[str, np.ndarray]:
        """imgs: uint8 [N,H,W,3].  Returns pool3/logits/spatial numpy."""
        outs: dict[str, list[np.ndarray]] = {"pool3": [], "logits": [], "spatial": []}
        for i in range(0, len(imgs), self.batch_size):
            batch = self._resize_batch(imgs[i:i + self.batch_size], mode)
            res = self._forward(self.params, batch)
            for k in outs:
                outs[k].append(np.asarray(res[k]))
        return {k: np.concatenate(v) for k, v in outs.items()}

    def features_from_dir(
        self, folder: str | Path, mode: str = "clean",
        max_items: int | None = None, cache: bool = False,
    ) -> dict[str, np.ndarray]:
        """``cache=True`` memoizes the result keyed by the dir's content
        fingerprint (name/mtime/size of every image) — the FID REFERENCE
        dir is re-read unchanged by every exploration mode and every
        validation epoch (7-8 full 50k-image extraction passes per test
        suite without it).  Bounded to the 4 most recent entries; sample
        dirs change every run and should NOT pass cache=True."""
        from PIL import Image

        files = sorted(
            p for p in Path(folder).iterdir()
            if p.suffix.lower() in (".png", ".jpg", ".jpeg")
        )
        if max_items:
            files = files[:max_items]
        assert files, f"no images in {folder}"
        if cache:
            fp = hash(tuple((f.name, f.stat().st_mtime_ns, f.stat().st_size)
                            for f in files))
            key = (str(Path(folder).resolve()), mode, max_items, fp)
            hit = self._dir_cache.get(key)
            if hit is not None:
                return hit
        outs: dict[str, list[np.ndarray]] = {"pool3": [], "logits": [], "spatial": []}
        for i in range(0, len(files), self.batch_size):
            imgs = np.stack([
                np.asarray(Image.open(f).convert("RGB")) for f in files[i:i + self.batch_size]
            ])
            batch = self._resize_batch(imgs, mode)
            res = self._forward(self.params, batch)
            for k in outs:
                outs[k].append(np.asarray(res[k]))
        result = {k: np.concatenate(v) for k, v in outs.items()}
        if cache:
            self._dir_cache[key] = result
            while len(self._dir_cache) > 4:  # FIFO bound (~400 MB/entry @50k)
                self._dir_cache.pop(next(iter(self._dir_cache)))
        return result


# ----------------------------------------------------------------------

def _mu_cov(feats: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(μ, Σ) of a feature matrix — GLOBAL on a multi-host run: the per-rank
    sufficient statistics (n, Σx, ΣxxT) are summed over all processes
    (`FeatureStats.reduce_across_processes`, SURVEY §5.8), so every host's
    clean/sFID/fid_tf reflects ALL ranks' samples, not just its own dir.
    No-op single-process."""
    st = FeatureStats()
    st.append(feats)
    dim = feats.shape[1] if feats.ndim == 2 and len(feats) else 2048
    return st.reduce_across_processes(dim=dim).mean_cov()


def get_fid_dict(
    sample_dir: str | Path,
    gt_dir: str | Path,
    extractor: InceptionExtractor,
    *,
    debug: bool = False,
    nearest_k: int = 5,
    prdc_subsample: int = 5000,
    seed: int = 0,
) -> tuple[dict[str, float], float]:
    """Full metric dict between two image folders.

    Parity: eval_fid.py:138-191 get_fid_dict (same keys; one inception
    stack instead of three).  Returns (dict, clean_fid_raw).

    Multi-host: the Fréchet metrics (clean_fid_raw / sfid / fid_tf) are
    GLOBAL — per-rank (n, Σx, ΣxxT) are reduced over all processes inside
    `_mu_cov`; IS and PRDC need raw per-sample features and stay
    rank-local (diagnostic parity with the reference's per-rank dirs).
    """
    f_sample = extractor.features_from_dir(sample_dir, mode="clean")
    f_real = extractor.features_from_dir(gt_dir, mode="clean", cache=True)

    out: dict[str, float] = {}
    mu1, s1 = _mu_cov(f_sample["pool3"])
    mu2, s2 = _mu_cov(f_real["pool3"])
    clean_fid_raw = frechet_distance(mu1, s1, mu2, s2)
    out["clean_fid_raw"] = clean_fid_raw

    # sFID on the 2023-d spatial features (Nash et al.)
    sm1, ss1 = _mu_cov(f_sample["spatial"])
    sm2, ss2 = _mu_cov(f_real["spatial"])
    out["sfid"] = frechet_distance(sm1, ss1, sm2, ss2)

    if not debug:  # torch-fidelity-flavored extras skipped in debug (eval_fid.py:104)
        fb_sample = extractor.features_from_dir(sample_dir, mode="bilinear")
        fb_real = extractor.features_from_dir(gt_dir, mode="bilinear",
                                              cache=True)
        bm1, bs1 = _mu_cov(fb_sample["pool3"])
        bm2, bs2 = _mu_cov(fb_real["pool3"])
        out["fid_tf"] = frechet_distance(bm1, bs1, bm2, bs2)
        for splits in (1, 10):
            m, s = inception_score(fb_sample["logits"], splits=splits)
            out[f"is_tf_s{splits}"] = m
            out[f"is_std_tf_s{splits}"] = s

    # PRDC on a 5k subsample (eval_fid.py:169-185)
    rng = np.random.default_rng(seed)
    n = min(len(f_real["pool3"]), len(f_sample["pool3"]), prdc_subsample)
    ir = rng.choice(len(f_real["pool3"]), n, replace=False)
    is_ = rng.choice(len(f_sample["pool3"]), n, replace=False)
    out.update(compute_prdc(f_real["pool3"][ir], f_sample["pool3"][is_],
                            nearest_k=nearest_k))
    logger.warning(f"fid_dict: {out}")
    return out, clean_fid_raw


# ----------------------------------------------------------------------

def cycle(dl: Iterable) -> Iterable:
    """Endless loader. Parity: eval_fid.py:95-99."""
    while True:
        for batch in dl:
            yield batch


def sample_to_dir(
    sample_fn: Callable[[dict[str, np.ndarray], int], np.ndarray],
    loader: Iterable,
    fid_num: int,
    sample_dir: str | Path,
    *,
    save_gt_dir: str | Path | None = None,
    batch_transform: Callable[[dict], dict] | None = None,
    vis_callback: Callable[[int, dict, np.ndarray], None] | None = None,
    vis_batches: int = 2,
) -> Path:
    """Sample ceil(fid_num/bs) batches and dump img{i}.png.

    ``sample_fn(raw_batch, seed) -> uint8 [B,H,W,C]`` (conditioning + CFG
    inside).  Parity: eval_fid.py:476-608.  ``batch_transform`` mirrors
    `eval_fid_callback_before` (samecondition/interp batch rewrites) and
    ``vis_callback(batch_id, raw_batch, samples)`` mirrors
    `eval_fid_callback_after` (papervis grids), applied to the first
    ``vis_batches`` batches only (the reference's harddrive_vis_num cap).
    """
    from PIL import Image

    sample_dir = Path(sample_dir)
    sample_dir.mkdir(parents=True, exist_ok=True)
    # clear stale PNGs: dirs are reused across runs (same log_dir, e.g. a
    # debug re-run with a smaller fid_num) and the FID reader globs every
    # file present — leftovers from a previous larger run would silently
    # dominate the metric
    for old in sample_dir.glob("img*.png"):
        old.unlink()
    if save_gt_dir is not None:
        Path(save_gt_dir).mkdir(parents=True, exist_ok=True)
        for old in Path(save_gt_dir).glob("img*.png"):
            old.unlink()
    i = 0
    for bi, batch in enumerate(cycle(loader)):
        if batch_transform is not None:
            batch = batch_transform(dict(batch))
        imgs = np.asarray(sample_fn(batch, bi))
        if vis_callback is not None and bi < vis_batches:
            vis_callback(bi, batch, imgs)
        for j, img in enumerate(imgs):
            if i >= fid_num:
                return sample_dir
            arr = img if img.shape[-1] > 1 else img[..., 0]
            Image.fromarray(arr).save(sample_dir / f"img{i}.png")
            if save_gt_dir is not None:
                # pair by the IN-BATCH index j — the global counter would
                # misalign every pair after one short batch (cycle() wrap
                # or a drop_last=False tail)
                gt = np.clip(
                    (np.asarray(batch["image"][j % len(batch["image"])]) + 1)
                    * 127.5, 0, 255,
                ).astype(np.uint8)
                Image.fromarray(gt if gt.shape[-1] > 1 else gt[..., 0]).save(
                    Path(save_gt_dir) / f"img{i}.png"
                )
            i += 1
        if i >= fid_num:
            break
    return sample_dir
