"""Native CLIP port tests (models/clip.py).

The external `clip` pip package is not in this image, so parity is proven
the way the other weight ports prove it (test_golden_weight_ports.py):
build a RANDOM torch network in the exact OpenAI on-disk format (the
state-dict key schema of clip/model.py — nn.MultiheadAttention packed
in_proj, QuickGELU MLP, EOT pooling) and assert the Flax forward matches
the torch forward on both towers.  Plus: BPE tokenizer behavior on a
synthetic merges file, tokenize() framing, and the ClipEncoderProtocol
surface (differentiability of encode_image_fn).
"""

from __future__ import annotations

import gzip

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from sgdm_tpu.models.clip import (  # noqa: E402
    CLIP,
    CONTEXT_LENGTH,
    EOT_TOKEN,
    SOT_TOKEN,
    ClipConfig,
    ClipEncoder,
    HashTokenizer,
    SimpleTokenizer,
    load_clip_torch_weights,
    quick_gelu,
    tokenize,
)

# tiny config: embed 16, res 32/patch 8 (17 pos), vision width 32/2 layers,
# text width 16/2 layers.  Heads follow the width//64 rule the loader
# infers (clip/model.py:225,268) → 1 head per tower at these widths.
TINY = ClipConfig(embed_dim=16, image_resolution=32, vision_width=32,
                  vision_layers=2, vision_patch=8, text_width=16,
                  text_heads=1, text_layers=2)


# ======================================================================
# torch replica of clip/model.py (state-dict-key exact)
# ======================================================================

class TQuickGELU(tnn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class TBlock(tnn.Module):
    def __init__(self, d, heads, mask=None):
        super().__init__()
        self.attn = tnn.MultiheadAttention(d, heads)
        self.ln_1 = tnn.LayerNorm(d)
        self.mlp = tnn.Sequential()
        self.mlp.add_module("c_fc", tnn.Linear(d, 4 * d))
        self.mlp.add_module("gelu", TQuickGELU())
        self.mlp.add_module("c_proj", tnn.Linear(4 * d, d))
        self.ln_2 = tnn.LayerNorm(d)
        self.mask = mask

    def forward(self, x):  # x: [N, B, D] like torch CLIP
        m = self.mask.to(x.dtype) if self.mask is not None else None
        x = x + self.attn(self.ln_1(x), self.ln_1(x), self.ln_1(x),
                          need_weights=False, attn_mask=m)[0]
        return x + self.mlp(self.ln_2(x))


class TTransformer(tnn.Module):
    def __init__(self, d, layers, heads, mask=None):
        super().__init__()
        self.resblocks = tnn.Sequential(
            *[TBlock(d, heads, mask) for _ in range(layers)])

    def forward(self, x):
        return self.resblocks(x)


class TVisual(tnn.Module):
    def __init__(self, cfg: ClipConfig):
        super().__init__()
        w, p = cfg.vision_width, cfg.vision_patch
        self.conv1 = tnn.Conv2d(3, w, p, p, bias=False)
        scale = w ** -0.5
        self.class_embedding = tnn.Parameter(scale * torch.randn(w))
        n = (cfg.image_resolution // p) ** 2 + 1
        self.positional_embedding = tnn.Parameter(scale * torch.randn(n, w))
        self.ln_pre = tnn.LayerNorm(w)
        self.transformer = TTransformer(w, cfg.vision_layers, max(w // 64, 1))
        self.ln_post = tnn.LayerNorm(w)
        self.proj = tnn.Parameter(scale * torch.randn(w, cfg.embed_dim))

    def forward(self, x):  # NCHW
        x = self.conv1(x)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.class_embedding.to(x.dtype) + torch.zeros(
            x.shape[0], 1, x.shape[-1], dtype=x.dtype)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding.to(x.dtype)
        x = self.ln_pre(x)
        x = self.transformer(x.permute(1, 0, 2)).permute(1, 0, 2)
        return self.ln_post(x[:, 0, :]) @ self.proj


class TCLIP(tnn.Module):
    """Key-schema replica: visual.* / transformer.* / token_embedding etc."""

    def __init__(self, cfg: ClipConfig, vocab=64):
        super().__init__()
        self.visual = TVisual(cfg)
        n = CONTEXT_LENGTH
        mask = torch.full((n, n), float("-inf")).triu(1)
        self.transformer = TTransformer(cfg.text_width, cfg.text_layers,
                                        cfg.text_heads, mask)
        self.token_embedding = tnn.Embedding(vocab, cfg.text_width)
        self.positional_embedding = tnn.Parameter(
            0.01 * torch.randn(n, cfg.text_width))
        self.ln_final = tnn.LayerNorm(cfg.text_width)
        self.text_projection = tnn.Parameter(
            cfg.text_width ** -0.5 * torch.randn(cfg.text_width,
                                                 cfg.embed_dim))

    def encode_text(self, tokens):
        x = self.token_embedding(tokens) + self.positional_embedding
        x = self.transformer(x.permute(1, 0, 2)).permute(1, 0, 2)
        x = self.ln_final(x)
        x = x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)]
        return x @ self.text_projection


def _tiny_torch_clip():
    torch.manual_seed(0)
    m = TCLIP(TINY)
    # pad token_embedding up to the real vocab so the loader's shape
    # inference works while the test stays tiny: tokens only index <64
    with torch.no_grad():
        full = torch.zeros(49408, TINY.text_width)
        full[:64] = m.token_embedding.weight
        m.token_embedding = tnn.Embedding.from_pretrained(full)
    return m.eval()


@pytest.fixture(scope="module")
def tiny_pair(tmp_path_factory):
    tm = _tiny_torch_clip()
    path = tmp_path_factory.mktemp("clip") / "tiny_clip.pt"
    torch.save(tm.state_dict(), str(path))
    variables, cfg = load_clip_torch_weights(str(path))
    assert cfg == TINY
    return tm, CLIP(cfg), variables


def test_visual_tower_parity(tiny_pair):
    tm, fm, variables = tiny_pair
    x = np.random.default_rng(0).standard_normal((2, 32, 32, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        ref = tm.visual(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(fm.apply(variables, jnp.asarray(x),
                              method=fm.encode_image))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_text_tower_parity(tiny_pair):
    tm, fm, variables = tiny_pair
    toks = np.zeros((3, CONTEXT_LENGTH), np.int64)
    rng = np.random.default_rng(1)
    for i, n in enumerate([5, 17, CONTEXT_LENGTH]):
        toks[i, :n - 1] = rng.integers(1, 60, n - 1)
        toks[i, n - 1] = 63  # EOT stand-in: the row max
    with torch.no_grad():
        ref = tm.encode_text(torch.from_numpy(toks)).numpy()
    got = np.asarray(fm.apply(variables, jnp.asarray(toks.astype(np.int32)),
                              method=fm.encode_text))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_quick_gelu():
    x = jnp.linspace(-3, 3, 7)
    np.testing.assert_allclose(
        np.asarray(quick_gelu(x)),
        np.asarray(x) * (1 / (1 + np.exp(-1.702 * np.asarray(x)))), rtol=1e-6)


# ======================================================================
# tokenizer
# ======================================================================

@pytest.fixture(scope="module")
def bpe_file(tmp_path_factory):
    # synthetic merges: enough structure to exercise the BPE loop.
    # Format parity: first line is a version header (skipped), then
    # space-separated merge pairs.
    # the last character of a word carries '</w>' before merging, so
    # word-final merges name it explicitly (as CLIP's real merges do)
    merges = ["#version: synthetic",
              "h e", "l l</w>", "he ll</w>", "w o", "r l"]
    p = tmp_path_factory.mktemp("bpe") / "merges.txt.gz"
    with gzip.open(p, "wt", encoding="utf-8") as f:
        f.write("\n".join(merges))
    return str(p)


def test_bpe_merges_apply(bpe_file):
    tok = SimpleTokenizer(bpe_file)
    # 'hell' → h+e → 'he', l+l → 'll', with 'll' word-final: 'he' 'll</w>'
    # then the ('he','ll</w>') merge → one token
    ids = tok.encode("hell")
    assert len(ids) == 1
    assert ids[0] == tok.encoder["hell</w>"]
    # unknown sequences fall back to per-character byte tokens
    ids2 = tok.encode("xyz")
    assert len(ids2) == 3


def test_bpe_special_tokens_and_cleaning(bpe_file):
    tok = SimpleTokenizer(bpe_file)
    # specials are the LAST two vocab ids (512 bytes + merges + 2); with
    # the real 48894-merge file that works out to exactly 49406/49407
    n = len(tok.encoder)
    assert tok.encoder["<|startoftext|>"] == n - 2
    assert tok.encoder["<|endoftext|>"] == n - 1
    assert n == 2 * 256 + 5 + 2  # bytes + word-final bytes + merges + specials
    # cleaning: case-fold + whitespace collapse
    assert tok.encode("  HELL\n\thell ") == tok.encode("hell hell")


def test_tokenize_framing(bpe_file):
    tok = SimpleTokenizer(bpe_file)
    out = tokenize(["hell", ""], tok)
    assert out.shape == (2, CONTEXT_LENGTH)
    assert out[0, 0] == SOT_TOKEN
    assert out[0, 2] == EOT_TOKEN  # sot, hell</w>, eot
    assert out[0, 3:].sum() == 0
    assert list(out[1, :2]) == [SOT_TOKEN, EOT_TOKEN]
    # truncation keeps a trailing EOT
    long = tokenize(["hello " * 200], tok)
    assert long.shape == (1, CONTEXT_LENGTH)
    assert long[0, -1] == EOT_TOKEN


def test_hash_tokenizer_deterministic():
    t = HashTokenizer()
    a, b = t.encode("a photo of a dog"), t.encode("A  Photo of a DOG")
    assert a == b  # cleaning folds case/whitespace
    assert all(0 < i < SOT_TOKEN for i in a)
    assert t.encode("dog") != t.encode("cat")


# ======================================================================
# ClipEncoder protocol surface (random-init fallback path)
# ======================================================================

@pytest.fixture(scope="module")
def tiny_encoder(tiny_pair, tmp_path_factory):
    tm, _, _ = tiny_pair
    path = tmp_path_factory.mktemp("enc") / "enc_clip.pt"
    torch.save(tm.state_dict(), str(path))
    return ClipEncoder("ViT-B/16", weights=str(path))


def test_encoder_protocol_surface(tiny_encoder):
    enc = tiny_encoder
    assert enc.embed_dim == TINY.embed_dim
    assert enc.input_resolution == TINY.image_resolution
    e = enc.encode_text(["a dog", "a cat"])
    assert e.shape == (2, TINY.embed_dim)
    assert np.all(np.isfinite(e))


def test_encode_image_fn_differentiable(tiny_encoder):
    enc = tiny_encoder
    x01 = jnp.full((1, 32, 32, 3), 0.5)

    def loss(x):
        return jnp.sum(enc.encode_image_fn(x) ** 2)

    g = jax.grad(loss)(x01)
    assert g.shape == x01.shape
    assert bool(jnp.any(g != 0))


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_encoder_random_fallback_deterministic(monkeypatch):
    monkeypatch.delenv("SGDM_CLIP_WEIGHTS", raising=False)
    monkeypatch.delenv("SGDM_CLIP_BPE", raising=False)
    a = ClipEncoder("ViT-B/32")
    b = ClipEncoder("ViT-B/32")
    ea = a.encode_text(["hello world"])
    eb = b.encode_text(["hello world"])
    np.testing.assert_array_equal(ea, eb)
    assert a.embed_dim == 512 and a.input_resolution == 224


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_vdiff_cli_default_encoder_resolution(monkeypatch):
    """resolve_clip_encoder with no spec returns the native port;
    spec='none' disables it."""
    from sgdm_tpu.diffusion.vdiff_cli import resolve_clip_encoder

    monkeypatch.delenv("SGDM_CLIP_ENCODER", raising=False)
    assert resolve_clip_encoder("none", "ViT-B/16") is None
    enc = resolve_clip_encoder(None, None)
    assert isinstance(enc, ClipEncoder)
    assert enc.embed_dim == 512  # ViT-B/16 default
