"""Native CLIP (image + text towers) in Flax — the v-diffusion CLI default.

TPU-native port of the external ``clip`` pip package the reference leans on
(ref: diffusion/sampler/v_diffusion/clip_sample.py:14,66-78 `clip.load` +
`clip.tokenize`; cfg_sample.py:94-102 text conditioning of the cc12m_1_cfg
checkpoint).  Same treatment as the DINO ViT port (`models/vit.py`): the
architecture + a torch-weight loader live here; the actual weights are
external (zero-egress image) and load from ``SGDM_CLIP_WEIGHTS``; without
them a deterministic random init keeps the plumbing runnable (documented
NOT comparable to real CLIP embeddings).

Pieces:
  * ``CLIP`` Flax module — OpenAI architecture: ViT visual tower
    (patch conv without bias, class embedding, ln_pre, pre-LN transformer
    with QuickGELU MLPs, ln_post + projection) and the 63M text
    transformer (token + positional embeddings, causal mask, ln_final,
    EOT-token pooling @ text_projection).
  * ``load_clip_torch_weights`` — maps the OpenAI state dict (either a
    plain state-dict ``.pt`` or the published torch.jit archive).
  * ``SimpleTokenizer`` — CLIP's byte-level BPE (parity with
    clip/simple_tokenizer.py, minus the ``ftfy`` pass — stdlib
    ``html.unescape`` only); merges file from ``SGDM_CLIP_BPE``.  With no
    merges file a deterministic hash tokenizer keeps ``encode_text``
    runnable (ids are stable but NOT CLIP's).
  * ``ClipEncoder`` / ``build`` — the default ``ClipEncoderProtocol``
    implementation `vdiff_cli.resolve_clip_encoder` falls back to.
"""

from __future__ import annotations

import gzip
import html
import os
import zlib
from dataclasses import dataclass
from functools import lru_cache
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "CLIP", "ClipEncoder", "build", "load_clip_torch_weights",
    "SimpleTokenizer", "tokenize", "CLIP_CONFIGS",
    "CLIP_PIXEL_MEAN", "CLIP_PIXEL_STD",
]

# clip/clip.py _transform Normalize values (also clip_sample.py:141-142)
CLIP_PIXEL_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_PIXEL_STD = (0.26862954, 0.26130258, 0.27577711)

VOCAB_SIZE = 49408
CONTEXT_LENGTH = 77
SOT_TOKEN = 49406
EOT_TOKEN = 49407


@dataclass(frozen=True)
class ClipConfig:
    embed_dim: int
    image_resolution: int
    vision_width: int
    vision_layers: int
    vision_patch: int
    text_width: int
    text_heads: int
    text_layers: int


# the three published ViT CLIP variants (clip/clip.py _MODELS); the
# reference's default is ViT-B/16 (clip_sample.py:137) and cc12m_1's
# conditioning tower is ViT-B/16 (v_diffusion cc12m_1.py:108)
CLIP_CONFIGS: dict[str, ClipConfig] = {
    "ViT-B/32": ClipConfig(512, 224, 768, 12, 32, 512, 8, 12),
    "ViT-B/16": ClipConfig(512, 224, 768, 12, 16, 512, 8, 12),
    "ViT-L/14": ClipConfig(768, 224, 1024, 24, 14, 768, 12, 12),
}


def quick_gelu(x: jax.Array) -> jax.Array:
    """clip/model.py QuickGELU: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


class ClipAttention(nn.Module):
    """torch nn.MultiheadAttention parity: packed in_proj + out_proj."""

    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        b, n, c = x.shape
        h = self.num_heads
        d = c // h
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, n, h, d).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * (d ** -0.5)
        if mask is not None:
            attn = attn + mask
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class ClipBlock(nn.Module):
    """ResidualAttentionBlock (clip/model.py): pre-LN attn + QuickGELU MLP."""

    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x)
        x = x + ClipAttention(self.num_heads, self.dtype, name="attn")(y, mask)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x)
        c = x.shape[-1]
        y = nn.Dense(4 * c, dtype=self.dtype, name="c_fc")(y)
        y = nn.Dense(c, dtype=self.dtype, name="c_proj")(quick_gelu(y))
        return x + y


class ClipVisual(nn.Module):
    """VisionTransformer (clip/model.py:196-241)."""

    width: int
    layers: int
    patch: int
    embed_dim: int
    resolution: int = 224
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        heads = max(self.width // 64, 1)  # width//64 per clip/model.py:225
        x = nn.Conv(self.width, (self.patch, self.patch),
                    strides=(self.patch, self.patch), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = x.reshape(b, -1, self.width)
        cls = self.param("class_embedding",
                         nn.initializers.normal(self.width ** -0.5),
                         (self.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.width)).astype(x.dtype), x], 1)
        n_pos = (self.resolution // self.patch) ** 2 + 1
        pos = self.param("positional_embedding",
                         nn.initializers.normal(self.width ** -0.5),
                         (n_pos, self.width))
        x = x + pos.astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(x)
        for i in range(self.layers):
            x = ClipBlock(heads, self.dtype, name=f"resblocks_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(
            x[:, 0])
        proj = self.param("proj", nn.initializers.normal(self.width ** -0.5),
                          (self.width, self.embed_dim))
        return x.astype(self.dtype) @ proj.astype(self.dtype)


class ClipText(nn.Module):
    """Text transformer (clip/model.py:343-358 encode_text)."""

    width: int
    heads: int
    layers: int
    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        tok = self.param("token_embedding", nn.initializers.normal(0.02),
                         (VOCAB_SIZE, self.width))
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (CONTEXT_LENGTH, self.width))
        x = tok[tokens].astype(self.dtype) + pos.astype(self.dtype)
        # additive causal mask (clip/model.py build_attention_mask)
        n = CONTEXT_LENGTH
        mask = jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)
        for i in range(self.layers):
            x = ClipBlock(self.heads, self.dtype, name=f"resblocks_{i}")(
                x, mask)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(x)
        # pool the EOT token (highest token id in each row)
        eot = jnp.argmax(tokens, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("text_projection",
                          nn.initializers.normal(self.width ** -0.5),
                          (self.width, self.embed_dim))
        return x.astype(self.dtype) @ proj.astype(self.dtype)


class CLIP(nn.Module):
    """Both towers; call with pixels (NHWC, CLIP-normalized) or tokens."""

    config: ClipConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.config
        self.visual = ClipVisual(c.vision_width, c.vision_layers,
                                 c.vision_patch, c.embed_dim,
                                 c.image_resolution, self.dtype)
        self.text = ClipText(c.text_width, c.text_heads, c.text_layers,
                             c.embed_dim, self.dtype)

    def encode_image(self, x):
        return self.visual(x)

    def encode_text(self, tokens):
        return self.text(tokens)

    def __call__(self, x, tokens):
        return self.encode_image(x), self.encode_text(tokens)


# ---------------------------------------------------------------------------
# torch weight loader
# ---------------------------------------------------------------------------

def _block_params(sd, pre: str) -> dict:
    import numpy as _np

    def t(key):
        return _np.asarray(sd[key], _np.float32)

    return {
        "ln_1": {"scale": t(f"{pre}.ln_1.weight"), "bias": t(f"{pre}.ln_1.bias")},
        "ln_2": {"scale": t(f"{pre}.ln_2.weight"), "bias": t(f"{pre}.ln_2.bias")},
        "attn": {
            "in_proj": {"kernel": t(f"{pre}.attn.in_proj_weight").T,
                        "bias": t(f"{pre}.attn.in_proj_bias")},
            "out_proj": {"kernel": t(f"{pre}.attn.out_proj.weight").T,
                         "bias": t(f"{pre}.attn.out_proj.bias")},
        },
        "c_fc": {"kernel": t(f"{pre}.mlp.c_fc.weight").T,
                 "bias": t(f"{pre}.mlp.c_fc.bias")},
        "c_proj": {"kernel": t(f"{pre}.mlp.c_proj.weight").T,
                   "bias": t(f"{pre}.mlp.c_proj.bias")},
    }


def load_clip_torch_weights(path: str) -> tuple[dict, ClipConfig]:
    """OpenAI CLIP checkpoint (.pt state dict OR the published jit archive)
    → (flax params, inferred config)."""
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if not isinstance(sd, dict):
            sd = sd.state_dict()
    except Exception:
        sd = torch.jit.load(path, map_location="cpu").state_dict()
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}

    vw = sd["visual.conv1.weight"].shape[0]
    patch = sd["visual.conv1.weight"].shape[-1]
    n_pos = sd["visual.positional_embedding"].shape[0]
    res = patch * int(round((n_pos - 1) ** 0.5))
    v_layers = 1 + max(int(k.split(".")[3]) for k in sd
                       if k.startswith("visual.transformer.resblocks."))
    t_layers = 1 + max(int(k.split(".")[2]) for k in sd
                       if k.startswith("transformer.resblocks."))
    tw = sd["ln_final.weight"].shape[0]
    embed = sd["text_projection"].shape[1]
    # heads are not recorded in the state dict; OpenAI uses width//64
    # for both towers (clip/model.py:225,268)
    cfg = ClipConfig(embed, res, vw, v_layers, patch, tw,
                     max(tw // 64, 1), t_layers)

    visual: dict = {
        "conv1": {"kernel": sd["visual.conv1.weight"].transpose(2, 3, 1, 0)},
        "class_embedding": sd["visual.class_embedding"],
        "positional_embedding": sd["visual.positional_embedding"],
        "ln_pre": {"scale": sd["visual.ln_pre.weight"],
                   "bias": sd["visual.ln_pre.bias"]},
        "ln_post": {"scale": sd["visual.ln_post.weight"],
                    "bias": sd["visual.ln_post.bias"]},
        "proj": sd["visual.proj"],
    }
    for i in range(v_layers):
        visual[f"resblocks_{i}"] = _block_params(
            sd, f"visual.transformer.resblocks.{i}")
    text: dict = {
        "token_embedding": sd["token_embedding.weight"],
        "positional_embedding": sd["positional_embedding"],
        "ln_final": {"scale": sd["ln_final.weight"],
                     "bias": sd["ln_final.bias"]},
        "text_projection": sd["text_projection"],
    }
    for i in range(t_layers):
        text[f"resblocks_{i}"] = _block_params(sd, f"transformer.resblocks.{i}")
    params = jax.tree.map(jnp.asarray, {"visual": visual, "text": text})
    return {"params": params}, cfg


# ---------------------------------------------------------------------------
# BPE tokenizer (clip/simple_tokenizer.py parity, minus ftfy)
# ---------------------------------------------------------------------------

@lru_cache()
def bytes_to_unicode() -> dict[int, str]:
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word: tuple[str, ...]) -> set[tuple[str, str]]:
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def _clean(text: str) -> str:
    # simple_tokenizer basic_clean without the ftfy.fix_text pass (ftfy is
    # not in this image; html unescape covers the common mojibake source)
    text = html.unescape(html.unescape(text))
    return " ".join(text.split()).strip().lower()


class SimpleTokenizer:
    """CLIP byte-level BPE.  ``bpe_path``: bpe_simple_vocab_16e6.txt.gz."""

    def __init__(self, bpe_path: str):
        import regex

        self.pat = regex.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
            regex.IGNORECASE)
        self.byte_encoder = bytes_to_unicode()
        opener = gzip.open if str(bpe_path).endswith(".gz") else open
        with opener(bpe_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = [tuple(m.split()) for m in merges[1:49152 - 256 - 2 + 1]]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        vocab.extend("".join(m) for m in merges)
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache: dict[str, str] = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs,
                         key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: list[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if word[i] == first and i < len(word) - 1 \
                        and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> list[int]:
        ids: list[int] = []
        for token in self.pat.findall(_clean(text)):
            token = "".join(self.byte_encoder[b]
                            for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return ids


class HashTokenizer:
    """Deterministic fallback when no BPE merges file is available
    (zero-egress image): one stable id per cleaned word.  Keeps the text
    path runnable; ids are NOT CLIP's (embeddings not comparable)."""

    def encode(self, text: str) -> list[int]:
        return [zlib.crc32(w.encode("utf-8")) % (SOT_TOKEN - 1) + 1
                for w in _clean(text).split(" ") if w]


def tokenize(texts: list[str], tokenizer, truncate: bool = True) -> np.ndarray:
    """clip/clip.py tokenize: <sot> ids <eot>, zero-padded to 77."""
    out = np.zeros((len(texts), CONTEXT_LENGTH), np.int32)
    for i, text in enumerate(texts):
        ids = [SOT_TOKEN] + tokenizer.encode(text) + [EOT_TOKEN]
        if len(ids) > CONTEXT_LENGTH:
            if not truncate:
                raise ValueError(f"text too long for CLIP context: {text!r}")
            ids = ids[:CONTEXT_LENGTH]
            ids[-1] = EOT_TOKEN
        out[i, :len(ids)] = ids
    return out


# ---------------------------------------------------------------------------
# the default ClipEncoderProtocol implementation
# ---------------------------------------------------------------------------

class ClipEncoder:
    """`vdiff_cli.ClipEncoderProtocol` built on the native towers.

    Inputs to ``encode_image_fn`` are RGB [0,1] at ``input_resolution``
    (the protocol contract); CLIP pixel normalization happens here."""

    def __init__(self, model_name: str = "ViT-B/16",
                 weights: str | None = None, bpe_path: str | None = None,
                 dtype: Any = jnp.float32):
        name = model_name or "ViT-B/16"
        weights = weights or os.environ.get("SGDM_CLIP_WEIGHTS")
        if weights and Path(weights).exists():
            variables, cfg = load_clip_torch_weights(weights)
            self._real_weights = True
        else:
            if name not in CLIP_CONFIGS:
                raise ValueError(f"unknown CLIP model {name!r}; "
                                 f"have {sorted(CLIP_CONFIGS)}")
            cfg = CLIP_CONFIGS[name]
            module = CLIP(cfg, dtype)
            seed = zlib.crc32(name.encode()) & 0x7FFFFFFF
            variables = jax.jit(module.init)(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3)),
                jnp.zeros((1, CONTEXT_LENGTH), jnp.int32))
            self._real_weights = False
            from ..utils.logging import logger
            logger.warning(
                "No CLIP weights found (set SGDM_CLIP_WEIGHTS). Using a "
                "DETERMINISTIC RANDOM %s - embeddings are self-consistent "
                "but NOT comparable to real CLIP.", name)
        self.config = cfg
        self.module = CLIP(cfg, dtype)
        self.variables = variables
        self.embed_dim = cfg.embed_dim
        self.input_resolution = cfg.image_resolution

        bpe_path = bpe_path or os.environ.get("SGDM_CLIP_BPE")
        if bpe_path and Path(bpe_path).exists():
            self.tokenizer: Any = SimpleTokenizer(bpe_path)
        else:
            self.tokenizer = HashTokenizer()
            if self._real_weights:
                from ..utils.logging import logger
                logger.warning(
                    "CLIP weights loaded but no BPE merges file "
                    "(SGDM_CLIP_BPE) — falling back to a hash tokenizer; "
                    "text embeddings will NOT match real CLIP.")

        mean = jnp.asarray(CLIP_PIXEL_MEAN)
        std = jnp.asarray(CLIP_PIXEL_STD)

        def _encode_image(variables, x01):
            x = (x01 - mean) / std
            return self.module.apply(variables, x,
                                     method=self.module.encode_image)

        self._encode_image = _encode_image
        self._encode_text = jax.jit(
            lambda variables, tok: self.module.apply(
                variables, tok, method=self.module.encode_text))

    # protocol surface ----------------------------------------------------
    def encode_image_fn(self, x01: jax.Array) -> jax.Array:
        """JAX-traceable + differentiable (clip-sample guidance grads flow
        through this); raw (unnormalized) embeddings like torch
        `encode_image` — callers normalize (spherical_dist_loss /
        image-prompt path)."""
        return self._encode_image(self.variables, x01)

    def encode_text(self, texts: list[str]) -> np.ndarray:
        toks = tokenize(list(texts), self.tokenizer)
        return np.asarray(self._encode_text(self.variables,
                                            jnp.asarray(toks)))


def build(model_name: str | None = "ViT-B/16") -> ClipEncoder:
    """`--clip-encoder sgdm_tpu.models.clip:build` factory (and the
    registered default when no plug is given)."""
    return ClipEncoder(model_name or "ViT-B/16")
