"""v-diffusion guided-sampling CLI (diffusion/vdiff_cli.py) tests.

Library-level parity against the reference CLI math
(`diffusion/sampler/v_diffusion/{cfg_sample,clip_sample}.py`) plus
end-to-end subcommand drives on tiny stand-in models.
"""

import math
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgdm_tpu.diffusion.samplers import v_objective as vo
from sgdm_tpu.diffusion import vdiff_cli as vc


# ---------------------------------------------------------------------------
# prompt parsing (cfg_sample.py:23-30)
# ---------------------------------------------------------------------------

def test_parse_prompt():
    assert vc.parse_prompt("a cat") == ("a cat", 3.0)
    assert vc.parse_prompt("a cat:1.5") == ("a cat", 1.5)
    assert vc.parse_prompt("a: cat :2") == ("a: cat ", 2.0)
    assert vc.parse_prompt("https://x/y.png:2") == ("https://x/y.png", 2.0)
    assert vc.parse_prompt("https://x/y.png") == ("https://x/y.png", 3.0)
    assert vc.parse_prompt("p", default_weight=1.0) == ("p", 1.0)


# ---------------------------------------------------------------------------
# CFG combine (cfg_sample.py:123-131)
# ---------------------------------------------------------------------------

def test_cfg_model_fn_matches_reference_combine():
    rng = np.random.default_rng(0)
    d, b, n_conds = 5, 3, 4
    embeds = rng.standard_normal((n_conds, d)).astype(np.float32)
    weights = rng.standard_normal(n_conds).astype(np.float32)
    x = rng.standard_normal((b, 4, 4, 3)).astype(np.float32)
    t = np.asarray([0.2, 0.5, 0.9], np.float32)

    # a deterministic fake v-model with nontrivial clip dependence
    proj = rng.standard_normal((d,)).astype(np.float32)

    def apply_fn(x_, t_, ce):
        s = (ce @ proj)[:, None, None, None] + t_[:, None, None, None]
        return x_ * 0.5 + s

    got = vc.make_cfg_model_fn(apply_fn, embeds, weights)(
        jnp.asarray(x), jnp.asarray(t))

    # reference semantics: x_in = x.repeat(n_conds), clip repeat_interleave,
    # view [n_conds, n, ...], weighted sum
    x_in = np.tile(x, (n_conds, 1, 1, 1))
    t_in = np.tile(t, n_conds)
    ce_in = np.repeat(embeds, b, axis=0)
    vs = np.asarray(apply_fn(x_in, t_in, ce_in)).reshape(n_conds, b, 4, 4, 3)
    want = (vs * weights[:, None, None, None, None]).sum(0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# CLIP-guidance conditioning (clip_sample.py:45-48, :66-78)
# ---------------------------------------------------------------------------

def test_spherical_dist_loss_matches_torch_formula():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 8)).astype(np.float32)
    y = rng.standard_normal((4, 8)).astype(np.float32)
    got = np.asarray(vc.spherical_dist_loss(jnp.asarray(x), jnp.asarray(y)))
    xt, yt = F.normalize(torch.from_numpy(x), dim=-1), \
        F.normalize(torch.from_numpy(y), dim=-1)
    want = (xt - yt).norm(dim=-1).div(2).arcsin().pow(2).mul(2).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_make_cond_model_fn_matches_torch_autograd():
    """v' = v − (−∂loss/∂x)·σ/α with the grad THROUGH the model."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    w = rng.standard_normal((3, 3)).astype(np.float32) * 0.3
    x = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    t = np.asarray([0.3, 0.7], np.float32)
    tgt = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)

    def model_jax(x_, t_):
        return jnp.tanh(x_ @ jnp.asarray(w)) + t_[:, None, None, None]

    def loss_jax(x_, t_, pred):
        return jnp.sum(jnp.square(pred - jnp.asarray(tgt))) * 7.0

    got = vc.make_cond_model_fn(model_jax, loss_jax)(
        jnp.asarray(x), jnp.asarray(t))

    # torch mirror of clip_sample.py:66-78 make_cond_model_fn
    xt = torch.from_numpy(x).requires_grad_()
    tt = torch.from_numpy(t)
    v = torch.tanh(xt @ torch.from_numpy(w)) + tt[:, None, None, None]
    a, s = torch.cos(tt * math.pi / 2), torch.sin(tt * math.pi / 2)
    a4, s4 = a[:, None, None, None], s[:, None, None, None]
    pred = xt * a4 - v * s4
    loss = ((pred - torch.from_numpy(tgt)) ** 2).sum() * 7.0
    cond_grad = -torch.autograd.grad(loss, xt)[0]
    want = (v.detach() - cond_grad * (s4 / a4)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_make_cutouts_geometry():
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    # cut_size == image size => min==max==8 => every cutout is identity
    out = vc.make_cutouts(jax.random.PRNGKey(0), imgs, 8, cutn=3)
    assert out.shape == (6, 8, 8, 3)
    for i in range(3):  # cutout-major concat like torch.cat(cutouts)
        np.testing.assert_allclose(np.asarray(out[2 * i:2 * i + 2]),
                                   np.asarray(imgs), rtol=1e-5, atol=1e-5)
    # differentiable end to end (guidance requires grad through cutouts)
    g = jax.grad(lambda im: jnp.sum(
        vc.make_cutouts(jax.random.PRNGKey(1), im, 4, cutn=2) ** 2))(imgs)
    assert np.isfinite(np.asarray(g)).all()


# ---------------------------------------------------------------------------
# schedule + dispatch plumbing
# ---------------------------------------------------------------------------

def test_schedule_selection():
    from sgdm_tpu.models.zoo_vdiff import get_vdiff_model
    _, meta_spliced = get_vdiff_model("yfcc_1")      # min_t == 0
    _, meta_ddpm = get_vdiff_model("danbooru_128")   # min_t > 0
    t = jnp.linspace(1, 0, 11)[:-1]
    np.testing.assert_allclose(
        np.asarray(vc._schedule(meta_spliced, 10)),
        np.asarray(vo.get_spliced_ddpm_cosine_schedule(t)), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(vc._schedule(meta_ddpm, 10)),
        np.asarray(vo.get_ddpm_schedule(t)), rtol=1e-6)
    asc = np.asarray(vc._schedule(meta_spliced, 10, for_modify=True))
    assert asc.shape == (11,) and asc[0] < asc[-1]


def test_run_sampler_dispatch_all_methods():
    model_fn = lambda x, t: x * 0.1
    x = jnp.ones((2, 4, 4, 3))
    steps = vo.get_spliced_ddpm_cosine_schedule(jnp.linspace(1, 0, 7)[:-1])
    for method in vc._METHODS:
        out = vc.run_sampler(method, model_fn, x, steps,
                             rng=jax.random.PRNGKey(0))
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all(), method


# ---------------------------------------------------------------------------
# end-to-end subcommand drives (tiny stand-in model via monkeypatch)
# ---------------------------------------------------------------------------

class _StubEncoder:
    """ClipEncoderProtocol stub: deterministic linear text/image embeds."""
    embed_dim = 6
    input_resolution = 8

    def encode_text(self, texts):
        rng = np.random.default_rng(abs(hash(tuple(texts))) % (2 ** 31))
        return rng.standard_normal((len(texts), 6)).astype(np.float32)

    def encode_image_fn(self, imgs):
        return jnp.mean(imgs, axis=(1, 2)) @ jnp.ones((imgs.shape[-1], 6))


_PLUGIN_SRC = """
import numpy as np
import jax.numpy as jnp

class _StubEncoder:
    embed_dim = 6
    input_resolution = 8
    def encode_text(self, texts):
        rng = np.random.default_rng(abs(hash(tuple(texts))) % (2 ** 31))
        return rng.standard_normal((len(texts), 6)).astype(np.float32)
    def encode_image_fn(self, imgs):
        return jnp.mean(imgs, axis=(1, 2)) @ jnp.ones((imgs.shape[-1], 6))

def build(model_name):
    return _StubEncoder()
"""


@pytest.fixture()
def encoder_plugin(tmp_path, monkeypatch):
    """Install a ClipEncoderProtocol plug module, the way a user with real
    CLIP weights would."""
    (tmp_path / "clip_stub_plugin.py").write_text(_PLUGIN_SRC)
    monkeypatch.syspath_prepend(str(tmp_path))
    sys.modules.pop("clip_stub_plugin", None)
    yield "clip_stub_plugin:build"
    sys.modules.pop("clip_stub_plugin", None)


@pytest.fixture()
def tiny_zoo(monkeypatch):
    from sgdm_tpu.models import zoo_vdiff as zv
    cfg = zv._NetCfg(size=16, cs=(6, 8), nb=2, divisor=None,
                     attn_norm=True, up_mode="bilinear", skip_first=False,
                     t_input="t", ff_std=1.0, final_relu=False,
                     ddpm_range=False, clip_dim=6, cond_width=8)
    plain = zv.dataclasses.replace(cfg, clip_dim=0)

    def fake_get(name, dtype=jnp.float32):
        c = cfg if name in ("cc12m_1", "cc12m_1_cfg") else plain
        meta = zv.VDiffModelMeta(name=name, shape=(16, 16, 3), min_t=0.0,
                                 max_t=1.0, clip_dim=c.clip_dim,
                                 clip_model="ViT-B/16" if c.clip_dim else None)
        return zv._module_from_cfg(c, dtype), meta

    monkeypatch.setattr(vc, "get_vdiff_model", fake_get)
    return cfg


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_cli_cfg_sample_unconditional_runs(tiny_zoo, tmp_path, monkeypatch):
    """zero prompts == the reference's zero-embed null condition — the one
    mode that runs without CLIP weights (cfg_sample.py:101-102)."""
    monkeypatch.chdir(tmp_path)
    vc.main(["cfg-sample", "--checkpoint", "random:0", "--steps", "4",
             "--method", "plms", "-n", "2", "--batch-size", "2"])
    assert (tmp_path / "out_00000.png").exists()
    assert (tmp_path / "out_00001.png").exists()


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_cli_cfg_sample_with_embed_and_encoder(tiny_zoo, encoder_plugin,
                                               tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    np.save(tmp_path / "e.npy", np.ones(6, np.float32))
    vc.main(["cfg-sample", "a prompt:2", "--embed", str(tmp_path / "e.npy"),
             "--clip-encoder", encoder_plugin,
             "--checkpoint", "random:0", "--steps", "3", "--method", "ddim"])
    assert (tmp_path / "out_00000.png").exists()


def test_cli_cfg_sample_requires_encoder_for_text(tiny_zoo, tmp_path,
                                                  monkeypatch):
    """`--clip-encoder none` disables the (now-default-native) encoder;
    text prompts must then fail loudly.  Without a spec the native port
    (models/clip.py) is built instead — covered by
    tests/test_clip.py::test_vdiff_cli_default_encoder_resolution."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("SGDM_CLIP_ENCODER", raising=False)
    with pytest.raises(SystemExit, match="CLIP encoder"):
        vc.main(["cfg-sample", "a prompt", "--clip-encoder", "none",
                 "--checkpoint", "random:0", "--steps", "3"])


def test_cli_clip_sample_guided(tiny_zoo, encoder_plugin, tmp_path,
                                monkeypatch):
    """full CLIP-guided path (cutouts + grad-through-model) on the stub."""
    monkeypatch.chdir(tmp_path)
    vc.main(["clip-sample", "a prompt:1",
             "--clip-encoder", encoder_plugin,
             "--checkpoint", "random:1", "--steps", "4", "--method", "ddim",
             "--cutn", "2", "-cs", "10"])
    assert (tmp_path / "out_00000.png").exists()


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_cli_modify_image(tiny_zoo, tmp_path, monkeypatch):
    from PIL import Image
    monkeypatch.chdir(tmp_path)
    Image.fromarray(
        np.uint8(np.random.default_rng(0).integers(0, 255, (16, 16, 3)))
    ).save(tmp_path / "init.png")
    vc.main(["modify-image", str(tmp_path / "init.png"),
             "--checkpoint", "random:0", "--steps", "4", "--method", "ddim",
             "-o", str(tmp_path / "mod.png")])
    assert (tmp_path / "mod.png").exists()


def test_cli_make_grid(tmp_path):
    from PIL import Image
    paths = []
    for i in range(3):
        p = tmp_path / f"im{i}.png"
        Image.new("RGB", (4, 4), (i * 40, 0, 0)).save(p)
        paths.append(str(p))
    out = tmp_path / "grid.png"
    vc.main(["make-grid", *paths, "-o", str(out)])
    g = Image.open(out)
    assert g.size == (8, 8)  # ceil(sqrt(3)) = 2 cols, 2 rows
    vc.main(["make-grid", *paths, "-o", str(out), "--nrow", "3"])
    assert Image.open(out).size == (12, 4)


def test_cli_missing_checkpoint_message(tiny_zoo, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit, match="checkpoint"):
        vc.main(["cfg-sample", "--steps", "3"])
