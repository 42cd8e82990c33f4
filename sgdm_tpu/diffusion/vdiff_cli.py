"""v-diffusion guided-sampling CLIs (TPU-native rewrite).

Parity targets: the reference's vendored v-diffusion command-line tools
`diffusion/sampler/v_diffusion/{cfg_sample,clip_sample,cfg_modify_image,
make_grid}.py`, exposed here as one CLI with four subcommands:

    python -m sgdm_tpu.diffusion.vdiff_cli cfg-sample  "prompt:3" ...
    python -m sgdm_tpu.diffusion.vdiff_cli clip-sample "prompt:1" ...
    python -m sgdm_tpu.diffusion.vdiff_cli modify-image init.png "prompt" ...
    python -m sgdm_tpu.diffusion.vdiff_cli make-grid img1.png img2.png ...

TPU design notes:
  * every sampling method is the lax.scan sampler from
    `samplers/v_objective.py` — one compiled program per (method, steps,
    batch) instead of the reference's per-step Python loop;
  * the CFG combine (cfg_sample.py:123-131) tiles the batch by n_conds
    inside the jitted model fn, so XLA sees one (n_conds·B) denoiser
    batch per step — the same concat-double trick the main framework
    uses for classifier-free guidance;
  * CLIP-guided sampling (clip_sample.py:66-78 make_cond_model_fn)
    becomes `jax.grad` through the model: v ← v − (−∂loss/∂x)·σ/α, with
    the loss computed on random cutouts of the denoised prediction.
    Cutouts (clip_sample.py:23-41 MakeCutouts) are implemented with
    `jax.image.scale_and_translate` so the random crop size/offset are
    *data*, not shapes — one compiled program for the whole guided
    sampler, where a literal port (dynamic crop + adaptive_avg_pool)
    would recompile every step.  Bilinear sampling of the crop replaces
    torch's adaptive-average pooling; both are random-resized-crop
    augmentations and the guidance is insensitive to the interpolant.

CLIP gating: this image has no CLIP weights and zero egress, so text /
image prompts require a user-supplied encoder plug (``--clip-encoder
module:factory`` or ``$SGDM_CLIP_ENCODER``) implementing
`ClipEncoderProtocol`; precomputed embeddings load from ``.npy`` via
``--embed file.npy[:weight]``; and ``cfg-sample`` with NO prompts runs
today — the reference seeds its target list with the zero embedding
(cfg_sample.py:101-102), which is exactly unconditional cc12m_1_cfg
sampling.  ``--checkpoint random:<seed>`` smoke-runs any zoo model with
random init (no reference analogue; the .pth loader is the parity path).
"""

from __future__ import annotations

import argparse
import math
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..models.zoo_vdiff import (
    get_vdiff_model, get_vdiff_models, load_vdiff_torch_checkpoint,
)
from .samplers import v_objective as vo

__all__ = [
    "parse_prompt", "spherical_dist_loss", "make_cutouts",
    "make_cfg_model_fn", "make_cond_model_fn", "run_sampler",
    "resolve_clip_encoder", "gather_target_embeds", "main",
]


# ---------------------------------------------------------------------------
# prompt / image helpers (cfg_sample.py:23-36)
# ---------------------------------------------------------------------------

def parse_prompt(prompt: str, default_weight: float = 3.0):
    """'text:weight' → (text, weight); URLs keep their colon."""
    if prompt.startswith("http://") or prompt.startswith("https://"):
        vals = prompt.rsplit(":", 2)
        vals = [vals[0] + ":" + vals[1], *vals[2:]]
    else:
        vals = prompt.rsplit(":", 1)
    vals = vals + ["", default_weight][len(vals):]
    return vals[0], float(vals[1])


def resize_and_center_crop(image, size):
    """PIL LANCZOS cover-resize + center crop (cfg_sample.py:33-36)."""
    from PIL import Image
    fac = max(size[0] / image.size[0], size[1] / image.size[1])
    image = image.resize((round(fac * image.size[0]),
                          round(fac * image.size[1])), Image.LANCZOS)
    w, h = image.size
    left = (w - size[0]) // 2
    top = (h - size[1]) // 2
    return image.crop((left, top, left + size[0], top + size[1]))


def _from_pil(img) -> np.ndarray:
    """PIL → NHWC float in [-1, 1] (utils.py:21-26)."""
    x = np.asarray(img.convert("RGB"), np.float32) / 255.0
    return x * 2.0 - 1.0


def _to_pil(x: np.ndarray):
    """NHWC/HWC float in [-1, 1] → PIL (utils.py:29-36)."""
    from PIL import Image
    if x.ndim == 4:
        x = x[0]
    x = np.clip((np.asarray(x, np.float32) + 1) / 2, 0, 1)
    return Image.fromarray(np.asarray(x * 255, np.uint8))


# ---------------------------------------------------------------------------
# CLIP-guidance math (clip_sample.py:23-78)
# ---------------------------------------------------------------------------

def spherical_dist_loss(x, y):
    """clip_sample.py:45-48 — squared great-circle distance on the sphere."""
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    y = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
    return jnp.square(jnp.arcsin(
        jnp.linalg.norm(x - y, axis=-1) / 2)) * 2


def make_cutouts(key, imgs, cut_size: int, cutn: int, cut_pow: float = 1.0):
    """Random resized crops, shapes-as-data (clip_sample.py:23-41).

    imgs: [B, H, W, C] → [cutn·B, cut_size, cut_size, C], cutouts
    concatenated cutout-major like the torch `torch.cat(cutouts)`.
    Crop size ~ (U[0,1]^cut_pow)·(max−min)+min, resampled bilinearly.
    """
    b, h, w, c = imgs.shape
    max_size = min(h, w)
    min_size = min(h, w, cut_size)
    ku, kx, ky = jax.random.split(key, 3)
    sizes = (jax.random.uniform(ku, (cutn,)) ** cut_pow
             * (max_size - min_size) + min_size)
    offx = jax.random.uniform(kx, (cutn,)) * (w - sizes)
    offy = jax.random.uniform(ky, (cutn,)) * (h - sizes)

    def one(size, ox, oy):
        # map the [oy, oy+size) x [ox, ox+size) window onto cut_size²
        scale = cut_size / size
        translation = jnp.stack([-oy * scale, -ox * scale])
        return jax.vmap(lambda im: jax.image.scale_and_translate(
            im, (cut_size, cut_size, c), (0, 1),
            jnp.stack([scale, scale]), translation, "linear"))(imgs)

    outs = jax.vmap(one)(sizes, offx, offy)       # [cutn, B, s, s, C]
    return outs.reshape(cutn * b, cut_size, cut_size, c)


def make_cond_model_fn(model_fn, loss_fn):
    """clip_sample.py:66-78 — guidance via jax.grad through the model.

    ``loss_fn(x, t, pred) -> scalar`` (summed over batch).  Returns a
    model fn computing v − (−∂loss/∂x)·σ/α.
    """

    def cond_model_fn(x, t):
        a, s = vo.t_to_alpha_sigma(t)
        a4 = a.reshape(-1, *([1] * (x.ndim - 1)))
        s4 = s.reshape(-1, *([1] * (x.ndim - 1)))

        def f(x_):
            v = model_fn(x_, t)
            pred = x_ * a4 - v * s4
            return loss_fn(x_, t, pred), v

        g, v = jax.grad(f, has_aux=True)(x)
        cond_grad = -g
        return v - cond_grad * (s4 / a4)

    return cond_model_fn


def make_cfg_model_fn(apply_fn, target_embeds, weights):
    """cfg_sample.py:123-131 — weighted multi-condition CFG combine.

    apply_fn(x, t, clip_embed) -> v.  target_embeds: [n_conds, D],
    weights: [n_conds]; the denoiser runs once on an (n_conds·B) batch.
    """
    target_embeds = jnp.asarray(target_embeds, jnp.float32)
    weights = jnp.asarray(weights, jnp.float32)
    n_conds = target_embeds.shape[0]

    def cfg_model_fn(x, t):
        n = x.shape[0]
        x_in = jnp.tile(x, (n_conds,) + (1,) * (x.ndim - 1))
        t_in = jnp.tile(t, (n_conds,))
        ce_in = jnp.repeat(target_embeds, n, axis=0)
        vs = apply_fn(x_in, t_in, ce_in).reshape(n_conds, *x.shape)
        return jnp.tensordot(weights, vs, axes=1)

    return cfg_model_fn


# ---------------------------------------------------------------------------
# sampler dispatch (cfg_sample.py:133-148)
# ---------------------------------------------------------------------------

_METHODS = ("ddpm", "ddim", "prk", "plms", "pie", "plms2", "iplms")


def run_sampler(method: str, model_fn, x, steps, eta: float = 0.0,
                rng=None, is_reverse: bool = False):
    if method == "ddpm":
        if is_reverse:
            raise SystemExit(
                "ddpm is stochastic ancestral sampling and cannot be "
                "reversed — use a deterministic method (ddim/prk/plms/"
                "pie/plms2/iplms) for modify-image")
        return vo.v_sample(model_fn, x, steps, 1.0, rng)
    if method == "ddim":
        if is_reverse:
            return vo.v_reverse_sample(model_fn, x, steps)
        return vo.v_sample(model_fn, x, steps, eta, rng)
    fn = {"prk": vo.prk_sample, "plms": vo.plms_sample,
          "pie": vo.pie_sample, "plms2": vo.plms2_sample,
          "iplms": vo.iplms_sample}[method]
    return fn(model_fn, x, steps, is_reverse=is_reverse)


# ---------------------------------------------------------------------------
# CLIP encoder plug
# ---------------------------------------------------------------------------

class ClipEncoderProtocol:
    """Duck-typed interface a ``--clip-encoder module:factory`` must build.

    Attributes: ``embed_dim`` (int), ``input_resolution`` (int).
    Methods: ``encode_text(list[str]) -> np[n, D]`` (host-side is fine);
    ``encode_image_fn(imgs_nhwc_01) -> [n, D]`` — a JAX-traceable,
    differentiable callable (required for clip-sample guidance;
    cfg-sample image prompts only call it forward).  Inputs are ALWAYS
    RGB in [0,1]; the encoder applies its own pixel normalization (the
    CLIP mean/std the reference bakes into its preprocessing,
    clip_sample.py:141-142) — both the image-prompt path and the
    guidance-loss cutout path feed [0,1] pixels.
    """


def resolve_clip_encoder(spec, model_name):
    """spec 'module:factory' (or $SGDM_CLIP_ENCODER) → encoder.

    Default (no spec): the NATIVE Flax CLIP port (`models/clip.py` —
    image + text towers + BPE tokenizer; weights from SGDM_CLIP_WEIGHTS /
    merges from SGDM_CLIP_BPE, deterministic-random fallback otherwise),
    replacing the external `clip` pip package the reference loads
    (clip_sample.py:14,138).  ``spec='none'`` disables the encoder
    entirely (text/image prompts then require --embed .npy files)."""
    import importlib
    import os
    spec = spec or os.environ.get("SGDM_CLIP_ENCODER")
    if spec == "none":
        return None
    if not spec:
        from ..models.clip import build

        return build(model_name)
    mod, _, factory = spec.partition(":")
    return getattr(importlib.import_module(mod), factory or "build")(model_name)


def _require_encoder(encoder, what):
    if encoder is None:
        raise SystemExit(
            f"{what} require a CLIP encoder, and this image ships no CLIP "
            "weights (zero egress). Provide --clip-encoder module:factory "
            "(see ClipEncoderProtocol), or pass precomputed embeddings via "
            "--embed file.npy[:weight].")
    return encoder


def gather_target_embeds(args, clip_dim, encoder, include_zero: bool,
                         default_weight: float = 3.0):
    """cfg_sample.py:101-119 / clip_sample.py:149-174 target collection."""
    from PIL import Image
    target_embeds, weights = [], []
    if include_zero:  # the CFG null condition (cfg_sample.py:101-102)
        target_embeds.append(np.zeros((1, clip_dim), np.float32))
    for prompt in args.prompts:
        txt, weight = parse_prompt(prompt, default_weight)
        enc = _require_encoder(encoder, "text prompts")
        target_embeds.append(np.asarray(enc.encode_text([txt]), np.float32))
        weights.append(weight)
    for prompt in getattr(args, "embeds", None) or []:
        path, weight = parse_prompt(prompt, default_weight)
        e = np.asarray(np.load(path), np.float32).reshape(1, -1)
        if e.shape[-1] != clip_dim:
            raise SystemExit(f"--embed {path}: dim {e.shape[-1]} != {clip_dim}")
        target_embeds.append(e)
        weights.append(weight)
    for prompt in args.images:
        path, weight = parse_prompt(prompt, default_weight)
        enc = _require_encoder(encoder, "image prompts")
        res = enc.input_resolution
        img = resize_and_center_crop(Image.open(path), (res, res))
        x01 = (np.asarray(_from_pil(img))[None] + 1) / 2
        e = np.asarray(enc.encode_image_fn(jnp.asarray(x01)), np.float32)
        e = e / np.linalg.norm(e, axis=-1, keepdims=True)
        target_embeds.append(e)
        weights.append(weight)
    return target_embeds, weights


# ---------------------------------------------------------------------------
# model/checkpoint plumbing
# ---------------------------------------------------------------------------

def _get_model(args):
    """Cheap half of model loading: module + meta + output size."""
    model, meta = get_vdiff_model(args.model)
    side_y, side_x = meta.shape[:2]
    if args.size:
        side_x, side_y = args.size
    return model, meta, side_x, side_y


def _resolve_checkpoint(args):
    """--checkpoint → existing path, or None for random:<seed> init."""
    ckpt = args.checkpoint
    if ckpt and str(ckpt).startswith("random:"):
        return None
    if not ckpt:
        ckpt = Path(f"checkpoints/{args.model}.pth")
    if not Path(ckpt).exists():
        raise SystemExit(
            f"checkpoint {ckpt} not found — pass --checkpoint PATH "
            "(torch .pth) or --checkpoint random:<seed> for a smoke run")
    return ckpt


def _load_params(args, model, meta):
    """Expensive half: checkpoint read / random init (after arg checks,
    so a missing encoder fails before a 0.6B-param init)."""
    ckpt = _resolve_checkpoint(args)
    if ckpt is None:
        seed = int(str(args.checkpoint).split(":", 1)[1])
        h = w = 64 if meta.clip_dim else 32  # tiny init shapes; params are size-free
        x0 = jnp.zeros((1, h, w, 3), jnp.float32)
        a = (x0, jnp.zeros((1,), jnp.float32))
        if meta.clip_dim:
            a = a + (jnp.zeros((1, meta.clip_dim), jnp.float32),)
        return model.init(jax.random.PRNGKey(seed), *a)
    return load_vdiff_torch_checkpoint(args.model, str(ckpt))


def _checkpoint_exists(args):
    """Arg-time validation so bad --checkpoint fails before embed work."""
    _resolve_checkpoint(args)


def _schedule(meta, steps: int, for_modify: bool = False):
    """cfg_sample.py:152-153 / clip_sample.py:219-223 / modify:130-132."""
    if for_modify:
        t = jnp.linspace(0, 1, steps + 1)
        return vo.get_spliced_ddpm_cosine_schedule(t)
    t = jnp.linspace(1, 0, steps + 1)[:-1]
    if meta.min_t == 0:
        return vo.get_spliced_ddpm_cosine_schedule(t)
    return vo.get_ddpm_schedule(t)


def _load_init(args, side_x, side_y, n):
    from PIL import Image
    img = resize_and_center_crop(Image.open(args.init), (side_x, side_y))
    return jnp.tile(jnp.asarray(_from_pil(img))[None], (n, 1, 1, 1))


def _save_batch(outs, start: int, prefix: str = "out"):
    for j, out in enumerate(np.asarray(outs)):
        _to_pil(out).save(f"{prefix}_{start + j:05}.png")


def _run_batches(run, n, batch_size, side_x, side_y, seed, init=None,
                 start_t=None):
    """cfg_sample.py:150-162 run_all: one fixed noise tensor, batched."""
    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(key, (n, side_y, side_x, 3))
    if init is not None:
        a, s = vo.t_to_alpha_sigma(jnp.float32(start_t))
        x = init * a + x * s
    for i in range(0, n, batch_size):
        cur = x[i:i + batch_size]
        _save_batch(run(cur, jax.random.fold_in(key, i)), i)
        print(f"saved {min(i + batch_size, n)}/{n}", file=sys.stderr)


# ---------------------------------------------------------------------------
# subcommands
# ---------------------------------------------------------------------------

def _cmd_cfg_sample(args):
    """cfg_sample.py main (:39-167)."""
    model, meta, side_x, side_y = _get_model(args)
    if not meta.clip_dim:
        raise SystemExit("cfg-sample needs a CLIP-conditioned model "
                         "(cc12m_1_cfg)")
    _checkpoint_exists(args)
    encoder = resolve_clip_encoder(args.clip_encoder, meta.clip_model)
    target_embeds, weights = gather_target_embeds(
        args, meta.clip_dim, encoder, include_zero=True)
    weights = np.asarray([1 - sum(weights), *weights], np.float32)
    params = _load_params(args, model, meta)
    apply_fn = lambda x, t, ce: model.apply(params, x, t, ce)
    cfg_fn = make_cfg_model_fn(apply_fn, np.concatenate(target_embeds),
                               weights)
    steps = _schedule(meta, args.steps)
    init = _load_init(args, side_x, side_y, args.n) if args.init else None
    if init is not None:
        steps = steps[np.asarray(steps) < args.starting_timestep]

    @jax.jit
    def run(x, key):
        return run_sampler(args.method, cfg_fn, x, steps, args.eta, key)

    _run_batches(run, args.n, args.batch_size, side_x, side_y, args.seed,
                 init, float(steps[0]) if init is not None else None)


def _cmd_clip_sample(args):
    """clip_sample.py main (:80-236)."""
    model, meta, side_x, side_y = _get_model(args)
    _checkpoint_exists(args)
    encoder = resolve_clip_encoder(args.clip_encoder, meta.clip_model
                                   or "ViT-B/16")
    clip_dim = meta.clip_dim or (encoder.embed_dim if encoder else 512)
    target_embeds, weights = gather_target_embeds(
        args, clip_dim, encoder, include_zero=False, default_weight=1.0)
    if not target_embeds:
        raise SystemExit("at least one text or image prompt (or --embed) "
                         "must be specified")
    weights = np.asarray(weights, np.float32)
    if abs(weights.sum()) < 1e-3:
        raise SystemExit("the weights must not sum to 0")
    weights = weights / abs(weights.sum())
    if args.clip_guidance_scale:
        _require_encoder(encoder, "CLIP guidance (-cs > 0)")
    params = _load_params(args, model, meta)
    clip_embed = (np.concatenate(target_embeds) * weights[:, None]).sum(0)
    clip_embed = clip_embed / max(np.linalg.norm(clip_embed), 1e-12)
    clip_embed = jnp.tile(jnp.asarray(clip_embed)[None], (args.n, 1))

    if meta.clip_dim:
        base_fn = lambda x, t, ce=None: model.apply(
            params, x, t, clip_embed[:x.shape[0]])
    else:
        base_fn = lambda x, t: model.apply(params, x, t)

    if args.clip_guidance_scale:
        enc = encoder  # validated above, before the expensive param load
        cut_size = enc.input_resolution

        def loss_fn(key, x, t, pred):
            b = x.shape[0]
            if min(pred.shape[1:3]) < 256:  # clip_sample.py:181-182
                ph, pw = pred.shape[1] * 2, pred.shape[2] * 2
                pred = jax.image.resize(pred, (b, ph, pw, 3), "linear")
            # [0,1] cuts — pixel normalization (CLIP mean/std,
            # clip_sample.py:141-142) is the encoder's job per
            # ClipEncoderProtocol, same as the image-prompt path
            cuts = make_cutouts(key, (pred + 1) / 2, cut_size,
                                args.cutn, args.cut_pow)
            emb = enc.encode_image_fn(cuts)
            emb = emb.reshape(args.cutn, b, -1)
            losses = spherical_dist_loss(emb, clip_embed[None, :b])
            return losses.mean(0).sum() * args.clip_guidance_scale

        def model_fn(x, t, key):
            # fresh cutouts every denoiser call, like torch's stateful
            # MakeCutouts — derive the step key from t (data, jit-safe)
            kstep = jax.random.fold_in(
                key, jnp.round(t[0] * 1e6).astype(jnp.int32))
            guided = make_cond_model_fn(
                base_fn, lambda x_, t_, p: loss_fn(kstep, x_, t_, p))
            return guided(x, t)
    else:
        model_fn = lambda x, t, key: base_fn(x, t)

    steps = _schedule(meta, args.steps)
    init = _load_init(args, side_x, side_y, args.n) if args.init else None
    if init is not None:
        steps = steps[np.asarray(steps) < args.starting_timestep]

    @jax.jit
    def run(x, key):
        return run_sampler(args.method, lambda x_, t_: model_fn(x_, t_, key),
                           x, steps, args.eta, key)

    _run_batches(run, args.n, args.batch_size, side_x, side_y, args.seed,
                 init, float(steps[0]) if init is not None else None)


def _cmd_modify_image(args):
    """cfg_modify_image.py main — DDIM-invert with the zero embed, then
    integrate the conditional ODE from that latent (:114-147)."""
    model, meta, side_x, side_y = _get_model(args)
    if not meta.clip_dim:
        raise SystemExit("modify-image needs cc12m_1_cfg")
    if args.method == "ddpm":  # fail before the 0.6B-param load
        raise SystemExit("modify-image cannot use --method ddpm (stochastic "
                         "ancestral sampling has no inverse); pick "
                         "ddim/prk/plms/pie/plms2/iplms")
    _checkpoint_exists(args)
    encoder = resolve_clip_encoder(args.clip_encoder, meta.clip_model)
    target_embeds, weights = gather_target_embeds(
        args, meta.clip_dim, encoder, include_zero=True)
    weights = np.asarray([1 - sum(weights), *weights], np.float32)
    params = _load_params(args, model, meta)
    apply_fn = lambda x, t, ce: model.apply(params, x, t, ce)
    cfg_fn = make_cfg_model_fn(apply_fn, np.concatenate(target_embeds),
                               weights)
    zero = jnp.zeros((1, meta.clip_dim), jnp.float32)
    plain_fn = lambda x, t: apply_fn(x, t, jnp.tile(zero, (x.shape[0], 1)))

    steps = _schedule(meta, args.steps, for_modify=True)
    steps = steps[np.asarray(steps) <= args.max_timestep]
    init = _load_init(args, side_x, side_y, 1)

    @jax.jit
    def run(x0):
        lat = run_sampler(args.method, plain_fn, x0, steps, is_reverse=True)
        fwd = steps[::-1][:-1]
        return run_sampler(args.method, cfg_fn, lat, fwd,
                           rng=jax.random.PRNGKey(args.seed))

    out = run(init)
    _to_pil(np.asarray(out)[0]).save(args.output)


def _cmd_make_grid(args):
    """make_grid.py — paste same-size images into a grid (:12-43)."""
    from PIL import Image
    images = [Image.open(p) for p in args.images]
    mode, size = images[0].mode, images[0].size
    for img, name in zip(images, args.images):
        if img.mode != mode or img.size != size:
            raise SystemExit(f"{name}: mode/size {img.mode}/{img.size} != "
                             f"{mode}/{size}")
    n = len(images)
    x = args.nrow if args.nrow else math.ceil(n ** 0.5)
    y = math.ceil(n / x)
    out = Image.new(mode, (size[0] * x, size[1] * y))
    for i, img in enumerate(images):
        out.paste(img, (size[0] * (i % x), size[1] * (i // x)))
    out.save(args.output)


# ---------------------------------------------------------------------------
# argparse
# ---------------------------------------------------------------------------

def _common(p, default_model, model_choices, default_method,
            default_steps):
    p.add_argument("prompts", type=str, default=[], nargs="*",
                   help="text prompts ('text:weight')")
    p.add_argument("--images", type=str, default=[], nargs="*",
                   metavar="IMAGE", help="image prompts ('path:weight')")
    p.add_argument("--embed", dest="embeds", type=str, action="append",
                   metavar="NPY[:W]",
                   help="precomputed CLIP embedding .npy (repeatable)")
    p.add_argument("--clip-encoder", type=str, default=None,
                   metavar="MODULE:FACTORY",
                   help="CLIP encoder plug (ClipEncoderProtocol)")
    p.add_argument("--batch-size", "-bs", type=int, default=1)
    p.add_argument("--checkpoint", type=str,
                   help=".pth path, or random:<seed> for a smoke run")
    p.add_argument("--eta", type=float, default=0.0)
    p.add_argument("--method", type=str, default=default_method,
                   choices=_METHODS)
    p.add_argument("--model", type=str, default=default_model,
                   choices=model_choices)
    p.add_argument("-n", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--size", type=int, nargs=2)
    p.add_argument("--steps", type=int, default=default_steps)


def build_parser():
    p = argparse.ArgumentParser(
        prog="sgdm-vdiff", description=__doc__.splitlines()[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("cfg-sample", help="classifier-free-guidance sampling")
    _common(c, "cc12m_1_cfg", ["cc12m_1_cfg"], "plms", 50)
    c.add_argument("--init", type=str)
    c.add_argument("--starting-timestep", "-st", type=float, default=0.9)
    c.set_defaults(fn=_cmd_cfg_sample)

    c = sub.add_parser("clip-sample", help="CLIP-guided sampling")
    _common(c, "cc12m_1", get_vdiff_models(), "ddpm", 1000)
    c.add_argument("--clip-guidance-scale", "-cs", type=float, default=500.0)
    c.add_argument("--cutn", type=int, default=16)
    c.add_argument("--cut-pow", type=float, default=1.0)
    c.add_argument("--init", type=str)
    c.add_argument("--starting-timestep", "-st", type=float, default=0.9)
    c.set_defaults(fn=_cmd_clip_sample)

    c = sub.add_parser("modify-image",
                       help="apply a prompt to an existing image")
    c.add_argument("init", type=str, help="the init image")
    _common(c, "cc12m_1_cfg", ["cc12m_1_cfg"], "plms", 50)
    c.add_argument("--max-timestep", "-mt", type=float, default=1.0)
    c.add_argument("--output", "-o", type=str, default="out.png")
    c.set_defaults(fn=_cmd_modify_image)

    c = sub.add_parser("make-grid", help="assemble images into a grid")
    c.add_argument("images", type=str, nargs="+", metavar="image")
    c.add_argument("--output", "-o", type=str, default="out.png")
    c.add_argument("--nrow", type=int)
    c.set_defaults(fn=_cmd_make_grid)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
