"""crowsonkb v-diffusion model zoo (TPU-native Flax rewrite).

Parity targets: the reference's vendored v-diffusion checkpoint-model
definitions, `diffusion/sampler/v_diffusion/diffusion/models/*.py` —
seven nets sharing one block vocabulary (ResConvBlock / SelfAttention2d /
SkipBlock / FourierFeatures) arranged as recursively nested skip-concat
U-Nets built with plain `nn.Sequential`s:

  * ``danbooru_128``  (danbooru_128.py:74-150)  c=256, 2 blocks/level
  * ``imagenet_128``  (imagenet_128.py:74-186)  c=128, 4 blocks/level
  * ``wikiart_128``   (wikiart_128.py:55-142)   no attention anywhere
  * ``wikiart_256``   (wikiart_256.py:74-198)   extra c/2 outer level
  * ``yfcc_1``        (yfcc_1.py:74-210)        512 px, normed attention
  * ``yfcc_2``        (yfcc_2.py:74-165)        512 px, 2 blocks/level
  * ``cc12m_1`` / ``cc12m_1_cfg`` (cc12m_1.py:104-250) CLIP-conditioned
    FiLM (Modulation2d) variant with a 2-block ResLinear mapping net

TPU-native design: instead of transcribing seven ~150-line module
files, every net is a generated *spec* — a nested tuple of block
descriptors produced by ONE loop builder (`_build_net_spec`) that
captures the shared recursion (per-level: down → N res[+attn] blocks →
inner skip → N res[+attn] blocks → up), parameterized by the per-model
channel ladder / block count / attention divisor.  One recursive
`@nn.compact` interpreter executes the spec in NHWC with
broadcast-reshape nearest upsampling (or `jax.image.resize` bilinear,
matching `align_corners=False` half-pixel semantics), and the SAME spec
walk generates the torch-checkpoint key map, so the loader and the
module cannot drift apart.  Structure parity vs the actual reference
classes is asserted by `tests/test_zoo_vdiff.py` on torch's meta device
(exact state_dict key+shape match for all seven nets).

Per-model quirks reproduced faithfully:
  * skip-concat order: `cat([skip, main])` for danbooru/imagenet/wikiart
    (danbooru_128.py:56) but `cat([main, skip])` for yfcc/cc12m
    (yfcc_1.py:35, cc12m_1.py:63);
  * the timestep Fourier features eat log-SNR for the DDPM-schedule
    models (danbooru_128.py:148) but raw cosine-t for yfcc/cc12m
    (yfcc_1.py:209);
  * danbooru_128 and wikiart_128's ResConvBlock has no `is_last` arg, so
    their OUTPUT block ends in a ReLU (danbooru_128.py:19-27);
  * attention head count = channels // 128 (danbooru) or // 64 (yfcc,
    cc12m), with a GroupNorm(1) pre-norm only in the yfcc/cc12m family;
  * cc12m's Modulation2d FiLM is `x * (scale + 1) + shift` from a
    1024-wide cond vector built by `mapping(cat[renormalized CLIP embed,
    Fourier(t, 128)])` (cc12m_1.py:30-38, :243-246).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..diffusion.samplers.v_objective import (
    alpha_sigma_to_log_snr, get_ddpm_schedule, t_to_alpha_sigma,
)
from .layers import upsample_nearest2x

__all__ = [
    "VDiffUNet", "VDiffModelMeta", "get_vdiff_model", "get_vdiff_models",
    "vdiff_torch_key_map", "load_vdiff_torch_checkpoint",
]


# ---------------------------------------------------------------------------
# spec builder — ONE recursion covering all seven reference net files
# ---------------------------------------------------------------------------

def _build_net_spec(size: int, cs: Tuple[int, ...], nb: int,
                    divisor: Optional[int], final_last: bool) -> tuple:
    """Nested block-descriptor spec for one net.

    Nodes: ("res", c_in, c_mid, c_out, last) · ("attn", c, heads) ·
    ("down",) · ("up",) · ("skip", inner_spec).  `cs[0]` is the outer
    level; level i runs at resolution size/2**i; attention (when the
    model has any) appears after every res block at resolutions <= 16 —
    true of all five attention models (e.g. imagenet_128.py:107-114 at
    16x16, yfcc_1.py:117-125, cc12m_1.py:156-164).
    """
    depth = len(cs) - 1

    def has_attn(level: int) -> bool:
        return divisor is not None and (size >> level) <= 16

    def res(seq, level, cin, cmid, cout, last=False):
        seq.append(("res", cin, cmid, cout, last))
        if has_attn(level):
            seq.append(("attn", cout, max(cout // divisor, 1)))

    def level(i: int) -> list:
        seq = [("down",)]
        res(seq, i, cs[i - 1], cs[i], cs[i])
        for _ in range(nb - 1):
            res(seq, i, cs[i], cs[i], cs[i])
        if i < depth:
            seq.append(("skip", tuple(level(i + 1))))
            res(seq, i, cs[i] * 2, cs[i], cs[i])
            for _ in range(nb - 2):
                res(seq, i, cs[i], cs[i], cs[i])
            res(seq, i, cs[i], cs[i], cs[i - 1])
        else:  # innermost: in + 2*(nb-1) middle + out (danbooru_128.py:111-122)
            for _ in range(nb - 1):
                res(seq, i, cs[i], cs[i], cs[i])
            res(seq, i, cs[i], cs[i], cs[i - 1])
        seq.append(("up",))
        return seq

    seq: list = []
    res(seq, 0, 3 + 16, cs[0], cs[0])
    for _ in range(nb - 1):
        res(seq, 0, cs[0], cs[0], cs[0])
    seq.append(("skip", tuple(level(1))))
    res(seq, 0, cs[0] * 2, cs[0], cs[0])
    for _ in range(nb - 2):
        res(seq, 0, cs[0], cs[0], cs[0])
    res(seq, 0, cs[0], cs[0], 3, last=final_last)
    return tuple(seq)


@dataclasses.dataclass(frozen=True)
class _NetCfg:
    size: int
    cs: Tuple[int, ...]
    nb: int
    divisor: Optional[int]
    attn_norm: bool
    up_mode: str            # "nearest" | "bilinear"
    skip_first: bool        # cat([skip, main]) vs cat([main, skip])
    t_input: str            # "log_snr" | "t"
    ff_std: float
    final_relu: bool        # ResConvBlock w/o is_last => output block ReLUs
    ddpm_range: bool        # min_t/max_t from get_ddpm_schedule endpoints
    clip_dim: int = 0       # >0 => cc12m modulated variant
    cond_width: int = 1024

    @property
    def modulated(self) -> bool:
        return self.clip_dim > 0

    def spec(self) -> tuple:
        return _build_net_spec(self.size, self.cs, self.nb, self.divisor,
                               final_last=not self.final_relu)


_CC12M = _NetCfg(size=256, cs=(128, 256, 256, 512, 512, 1024, 1024), nb=4,
                 divisor=64, attn_norm=True, up_mode="bilinear",
                 skip_first=False, t_input="t", ff_std=1.0, final_relu=False,
                 ddpm_range=False, clip_dim=512, cond_width=1024)

# models/models.py:4-13 registry (cc12m_1_cfg shares the cc12m_1 class)
_MODELS = {
    "danbooru_128": _NetCfg(size=128, cs=(256, 512, 512, 1024, 1024, 2048),
                            nb=2, divisor=128, attn_norm=False,
                            up_mode="nearest", skip_first=True,
                            t_input="log_snr", ff_std=0.2, final_relu=True,
                            ddpm_range=True),
    "imagenet_128": _NetCfg(size=128, cs=(128, 256, 256, 512, 512, 1024),
                            nb=4, divisor=128, attn_norm=False,
                            up_mode="nearest", skip_first=True,
                            t_input="log_snr", ff_std=0.2, final_relu=False,
                            ddpm_range=True),
    "wikiart_128": _NetCfg(size=128, cs=(128, 256, 256, 512, 512, 1024),
                           nb=4, divisor=None, attn_norm=False,
                           up_mode="nearest", skip_first=True,
                           t_input="log_snr", ff_std=0.2, final_relu=True,
                           ddpm_range=True),
    "wikiart_256": _NetCfg(size=256, cs=(64, 128, 256, 256, 512, 512, 1024),
                           nb=4, divisor=128, attn_norm=False,
                           up_mode="nearest", skip_first=True,
                           t_input="log_snr", ff_std=0.2, final_relu=False,
                           ddpm_range=True),
    "yfcc_1": _NetCfg(size=512, cs=(128, 128, 256, 256, 512, 512, 1024, 1024),
                      nb=4, divisor=64, attn_norm=True, up_mode="bilinear",
                      skip_first=False, t_input="t", ff_std=1.0,
                      final_relu=False, ddpm_range=False),
    "yfcc_2": _NetCfg(size=512, cs=(128, 256, 512, 512, 1024, 1024, 2048, 2048),
                      nb=2, divisor=64, attn_norm=True, up_mode="bilinear",
                      skip_first=False, t_input="t", ff_std=1.0,
                      final_relu=False, ddpm_range=False),
    "cc12m_1": _CC12M,
    "cc12m_1_cfg": _CC12M,
}


@dataclasses.dataclass(frozen=True)
class VDiffModelMeta:
    """shape/min_t/max_t/clip_model attributes of the torch classes."""
    name: str
    shape: Tuple[int, int, int]          # (H, W, C) — NHWC image shape
    min_t: float
    max_t: float
    clip_dim: int = 0
    clip_model: Optional[str] = None


def _meta(name: str, cfg: _NetCfg) -> VDiffModelMeta:
    if cfg.ddpm_range:  # danbooru_128.py:78-79
        min_t = float(get_ddpm_schedule(jnp.float32(0.0)))
        max_t = float(get_ddpm_schedule(jnp.float32(1.0)))
    else:
        min_t, max_t = 0.0, 1.0
    return VDiffModelMeta(
        name=name, shape=(cfg.size, cfg.size, 3), min_t=min_t, max_t=max_t,
        clip_dim=cfg.clip_dim,
        clip_model="ViT-B/16" if cfg.modulated else None)  # cc12m_1.py:108


# ---------------------------------------------------------------------------
# the interpreter module
# ---------------------------------------------------------------------------

def _l2norm(x, eps=1e-12):
    """torch F.normalize(dim=-1): x / max(||x||, eps)."""
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / jnp.maximum(n, eps)


def _gn1(x, eps=1e-5):
    """GroupNorm(1, c, affine=False): per-sample stats over (H, W, C)."""
    mu = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


class VDiffUNet(nn.Module):
    """Spec-interpreting NHWC rewrite of the v-diffusion nets.

    ``__call__(x, t, clip_embed=None) -> v`` with x: [B, H, W, 3],
    t: [B] continuous cosine time.  Flax param names mirror the torch
    state_dict prefixes ('.' -> '_'), so `load_vdiff_torch_checkpoint`
    is a mechanical relayout.
    """

    spec: tuple
    up_mode: str = "nearest"
    skip_first: bool = True
    attn_norm: bool = False
    modulated: bool = False
    t_input: str = "log_snr"
    ff_std: float = 0.2
    clip_dim: int = 0
    cond_width: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t, clip_embed=None):
        b = x.shape[0]
        t = jnp.asarray(t, jnp.float32)
        if t.ndim == 0:
            t = jnp.full((b,), t)
        if self.t_input == "log_snr":  # danbooru_128.py:148
            ff_in = alpha_sigma_to_log_snr(*t_to_alpha_sigma(t))
        else:
            ff_in = t
        temb = self._fourier("timestep_embed", 16, self.ff_std, ff_in[:, None])

        cond = None
        if self.modulated:  # cc12m_1.py:243-246
            if clip_embed is None:
                clip_embed = jnp.zeros((b, self.clip_dim), self.dtype)
            ce = _l2norm(jnp.asarray(clip_embed, jnp.float32))
            ce = ce * math.sqrt(self.clip_dim)
            mt = self._fourier("mapping_timestep_embed", 128, 1.0, t[:, None])
            cond = self._mapping(jnp.concatenate([ce, mt], axis=-1))

        planes = jnp.broadcast_to(temb[:, None, None, :].astype(x.dtype),
                                  (b, x.shape[1], x.shape[2], temb.shape[-1]))
        h = jnp.concatenate([x, planes], axis=-1)
        return self._interp(self.spec, h, cond, "net")

    # -- building blocks -----------------------------------------------------

    def _fourier(self, name, out_features, std, x):
        """FourierFeatures (danbooru_128.py:59-67): cat[cos, sin](2pi x W^T)."""
        w = self.param(f"{name}_weight",
                       lambda k, s: std * jax.random.normal(k, s, jnp.float32),
                       (out_features // 2, x.shape[-1]))
        f = 2 * math.pi * (x @ w.T)
        return jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)

    def _mapping(self, z):
        """cc12m_1.py:116-119: ResLinearBlock(640,1024,1024) x2 (2nd is_last)."""
        w = self.cond_width
        for i, is_last in enumerate((False, True)):
            p = f"mapping_{i}"
            h = nn.Dense(w, dtype=self.dtype, name=f"{p}_main_0")(z)
            h = nn.relu(h)
            h = nn.Dense(w, dtype=self.dtype, name=f"{p}_main_2")(h)
            if not is_last:
                h = nn.relu(h)
            if z.shape[-1] != w:
                z = nn.Dense(w, use_bias=False, dtype=self.dtype,
                             name=f"{p}_skip")(z)
            z = h + z
        return z

    def _conv(self, x, cout, k, name, use_bias=True):
        return nn.Conv(cout, (k, k), padding=k // 2, use_bias=use_bias,
                       dtype=self.dtype, name=name)(x)

    def _modulate(self, x, cond, cmid, name):
        """Modulation2d (cc12m_1.py:30-38): x*(scale+1)+shift from cond."""
        sc = nn.Dense(2 * cmid, use_bias=False, dtype=self.dtype, name=name)(cond)
        scales, shifts = jnp.split(sc, 2, axis=-1)
        return x * (scales[:, None, None, :] + 1) + shifts[:, None, None, :]

    def _res(self, node, x, cond, p):
        _, cin, cmid, cout, last = node
        if self.modulated:  # ResModConvBlock, cc12m_1.py:41-53
            h = self._conv(x, cmid, 3, f"{p}_main_0")
            h = self._modulate(_gn1(h), cond, cmid, f"{p}_main_2")
            h = nn.relu(h)
            h = self._conv(h, cout, 3, f"{p}_main_4")
            if not last:
                h = self._modulate(_gn1(h), cond, cout, f"{p}_main_6")
                h = nn.relu(h)
        else:  # ResConvBlock, danbooru_128.py:19-27
            h = nn.relu(self._conv(x, cmid, 3, f"{p}_main_0"))
            h = self._conv(h, cout, 3, f"{p}_main_2")
            if not last:
                h = nn.relu(h)
        skip = x if cin == cout else self._conv(x, cout, 1, f"{p}_skip",
                                                use_bias=False)
        return h + skip

    def _attn(self, node, x, p):
        """SelfAttention2d (danbooru_128.py:30-46 / yfcc_1.py:49-67)."""
        _, c, heads = node
        b, hh, ww, _ = x.shape
        n, d = hh * ww, c // heads
        h = x
        if self.attn_norm:  # GroupNorm(1, c) WITH affine (yfcc_1.py:53)
            h = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype,
                             name=f"{p}_norm")(h)
        qkv = self._conv(h, 3 * c, 1, f"{p}_qkv_proj")
        # torch channel layout: (which in {q,k,v}) x head x d, head-major
        qkv = qkv.reshape(b, n, 3, heads, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = d ** -0.25
        att = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k * scale)
        att = jax.nn.softmax(att, axis=-1)
        y = jnp.einsum("bhnm,bmhd->bnhd", att, v).reshape(b, hh, ww, c)
        return x + self._conv(y, c, 1, f"{p}_out_proj")

    def _up(self, x):
        if self.up_mode == "nearest":
            return upsample_nearest2x(x)
        # bilinear align_corners=False == jax.image half-pixel 'linear'
        b, h, w, c = x.shape
        return jax.image.resize(x, (b, 2 * h, 2 * w, c), "linear")

    def _interp(self, seq, x, cond, prefix):
        for i, node in enumerate(seq):
            p = f"{prefix}_{i}"
            kind = node[0]
            if kind == "res":
                x = self._res(node, x, cond, p)
            elif kind == "attn":
                x = self._attn(node, x, p)
            elif kind == "down":
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            elif kind == "up":
                x = self._up(x)
            elif kind == "skip":
                inner = self._interp(node[1], x, cond, f"{p}_main")
                pair = (x, inner) if self.skip_first else (inner, x)
                x = jnp.concatenate(pair, axis=-1)
            else:  # pragma: no cover
                raise ValueError(f"unknown spec node {node!r}")
        return x


def get_vdiff_models() -> list:
    return list(_MODELS)


def _module_from_cfg(cfg: _NetCfg, dtype=jnp.float32) -> "VDiffUNet":
    return VDiffUNet(
        spec=cfg.spec(), up_mode=cfg.up_mode, skip_first=cfg.skip_first,
        attn_norm=cfg.attn_norm, modulated=cfg.modulated, t_input=cfg.t_input,
        ff_std=cfg.ff_std, clip_dim=cfg.clip_dim, cond_width=cfg.cond_width,
        dtype=dtype)


def get_vdiff_model(name: str, dtype=jnp.float32):
    """-> (VDiffUNet, VDiffModelMeta) for a reference zoo entry."""
    cfg = _MODELS[name]
    return _module_from_cfg(cfg, dtype), _meta(name, cfg)


# ---------------------------------------------------------------------------
# torch checkpoint port — generated from the SAME spec walk
# ---------------------------------------------------------------------------

def _iter_params(cfg: _NetCfg):
    """Yield (torch_key, flax_name, leaf, kind, shape) for every weight.

    kind: conv (OIHW->HWIO) | dense (transpose) | raw (as-is).
    flax param location: params[flax_name][leaf] for submodules, or
    params[flax_name] directly when leaf is None (fourier weights).
    """
    out = []

    def conv(tk, fn, cin, cout, k, bias=True):
        out.append((f"{tk}.weight", fn, "kernel", "conv", (k, k, cin, cout)))
        if bias:
            out.append((f"{tk}.bias", fn, "bias", "raw", (cout,)))

    def dense(tk, fn, fin, fout, bias=True):
        out.append((f"{tk}.weight", fn, "kernel", "dense", (fin, fout)))
        if bias:
            out.append((f"{tk}.bias", fn, "bias", "raw", (fout,)))

    def walk(seq, tp, fp):
        for i, node in enumerate(seq):
            tk, fn = f"{tp}.{i}", f"{fp}_{i}"
            if node[0] == "res":
                _, cin, cmid, cout, last = node
                if cfg.modulated:
                    conv(f"{tk}.main.0", f"{fn}_main_0", cin, cmid, 3)
                    dense(f"{tk}.main.2.layer", f"{fn}_main_2",
                          cfg.cond_width, 2 * cmid, bias=False)
                    conv(f"{tk}.main.4", f"{fn}_main_4", cmid, cout, 3)
                    if not last:
                        dense(f"{tk}.main.6.layer", f"{fn}_main_6",
                              cfg.cond_width, 2 * cout, bias=False)
                else:
                    conv(f"{tk}.main.0", f"{fn}_main_0", cin, cmid, 3)
                    conv(f"{tk}.main.2", f"{fn}_main_2", cmid, cout, 3)
                if cin != cout:
                    conv(f"{tk}.skip", f"{fn}_skip", cin, cout, 1, bias=False)
            elif node[0] == "attn":
                _, c, _h = node
                if cfg.attn_norm:
                    out.append((f"{tk}.norm.weight", f"{fn}_norm", "scale",
                                "raw", (c,)))
                    out.append((f"{tk}.norm.bias", f"{fn}_norm", "bias",
                                "raw", (c,)))
                conv(f"{tk}.qkv_proj", f"{fn}_qkv_proj", c, 3 * c, 1)
                conv(f"{tk}.out_proj", f"{fn}_out_proj", c, c, 1)
            elif node[0] == "skip":
                walk(node[1], f"{tk}.main", f"{fn}_main")

    out.append(("timestep_embed.weight", "timestep_embed_weight", None,
                "raw", (8, 1)))
    if cfg.modulated:
        out.append(("mapping_timestep_embed.weight",
                    "mapping_timestep_embed_weight", None, "raw", (64, 1)))
        fin = cfg.clip_dim + 128
        dense("mapping.0.main.0", "mapping_0_main_0", fin, cfg.cond_width)
        dense("mapping.0.main.2", "mapping_0_main_2", cfg.cond_width,
              cfg.cond_width)
        dense("mapping.0.skip", "mapping_0_skip", fin, cfg.cond_width,
              bias=False)
        dense("mapping.1.main.0", "mapping_1_main_0", cfg.cond_width,
              cfg.cond_width)
        dense("mapping.1.main.2", "mapping_1_main_2", cfg.cond_width,
              cfg.cond_width)
    walk(cfg.spec(), "net", "net")
    return out


def vdiff_torch_key_map(name: str) -> dict:
    """torch state_dict key -> (flax_name, leaf, kind, expected flax shape)."""
    return {tk: (fn, leaf, kind, shape)
            for tk, fn, leaf, kind, shape in _iter_params(_MODELS[name])}


def _convert_state_dict(cfg: _NetCfg, sd, name: str = "?") -> dict:
    """torch state_dict -> flax params pytree (shared by loader + tests)."""
    params: dict = {}
    entries = _iter_params(cfg)
    for tk, fn, leaf, kind, shape in entries:
        w = sd[tk]
        if hasattr(w, "numpy"):
            w = w.float().numpy()
        w = np.asarray(w, np.float32)
        if kind == "conv":      # OIHW -> HWIO
            w = w.transpose(2, 3, 1, 0)
        elif kind == "dense":   # [out, in] -> [in, out]
            w = w.T
        if w.shape != shape:
            raise ValueError(f"{name}: {tk} has shape {w.shape}, "
                             f"expected {shape}")
        if leaf is None:
            params[fn] = jnp.asarray(w)
        else:
            params.setdefault(fn, {})[leaf] = jnp.asarray(w)
    extra = set(sd) - {tk for tk, *_ in entries}
    if extra:
        raise ValueError(f"{name}: {len(extra)} unconsumed torch keys, "
                         f"e.g. {sorted(extra)[:4]}")
    return {"params": params}


def load_vdiff_torch_checkpoint(name: str, path: str) -> dict:
    """torch .pth state_dict -> flax params pytree for `get_vdiff_model`."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return _convert_state_dict(_MODELS[name], sd, name)
