"""v-diffusion model zoo (models/zoo_vdiff.py) parity tests.

Two layers of proof against the ACTUAL reference model files
(`diffusion/sampler/v_diffusion/diffusion/models/*.py`):

  1. structure — every zoo entry's generated torch key map matches the
     real torch model's state_dict (keys AND shapes), instantiated on
     torch's meta device so the ~0.25-1B-param nets cost nothing; and
     the Flax module's param tree (via eval_shape) matches the same map.
  2. numerics — weight-transplant forward parity on tiny nets BUILT
     FROM THE REFERENCE'S OWN BLOCK CLASSES for each of the three block
     families (plain/danbooru, normed-attn+bilinear/yfcc_2,
     modulated+mapping/cc12m_1), driven through the same spec the Flax
     interpreter executes.
"""

import math
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sgdm_tpu.models.zoo_vdiff import (
    _NetCfg, _convert_state_dict, _module_from_cfg,
    get_vdiff_model, get_vdiff_models, vdiff_torch_key_map,
)

REF = "/root/reference/diffusion/sampler/v_diffusion"


@pytest.fixture(scope="module")
def ref():
    for name in ("torchvision", "torchvision.transforms",
                 "torchvision.transforms.functional"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    sys.modules["torchvision.transforms"].functional = \
        sys.modules["torchvision.transforms.functional"]
    # stash any previously-imported top-level `diffusion` package (the
    # reference repo root and the vendored v_diffusion tree share the name)
    stashed = {k: sys.modules.pop(k) for k in list(sys.modules)
               if k == "diffusion" or k.startswith("diffusion.")}
    sys.path.insert(0, REF)
    try:
        from diffusion import models as rmodels
        from diffusion import utils as rutils
        yield rmodels, rutils
    finally:
        sys.path.remove(REF)
        for k in list(sys.modules):
            if k == "diffusion" or k.startswith("diffusion."):
                del sys.modules[k]
        sys.modules.update(stashed)


ALL = ["danbooru_128", "imagenet_128", "wikiart_128", "wikiart_256",
       "yfcc_1", "yfcc_2", "cc12m_1", "cc12m_1_cfg"]


def test_registry_matches_reference(ref):
    rmodels, _ = ref
    assert sorted(get_vdiff_models()) == sorted(rmodels.get_models())


@pytest.mark.parametrize("name", ALL)
def test_structure_parity_meta_device(ref, name):
    rmodels, rutils = ref
    orig = rutils.get_ddpm_schedule
    # min_t/max_t call .item() in __init__, illegal on meta tensors
    rutils.get_ddpm_schedule = lambda t: torch.tensor(0.5, device="cpu")
    try:
        with torch.device("meta"):
            m = rmodels.get_model(name)()
    finally:
        rutils.get_ddpm_schedule = orig
    sd = {k: tuple(v.shape) for k, v in m.state_dict().items()}
    km = vdiff_torch_key_map(name)
    assert set(sd) == set(km)
    for tk, (fn, leaf, kind, shape) in km.items():
        ts = sd[tk]
        if kind == "conv":
            exp = (ts[2], ts[3], ts[1], ts[0])
        elif kind == "dense":
            exp = (ts[1], ts[0])
        else:
            exp = ts
        assert exp == shape, (tk, ts, shape)


@pytest.mark.parametrize("name", ALL)
def test_flax_tree_matches_key_map(name):
    m, meta = get_vdiff_model(name)
    h, w, c = meta.shape
    args = [jax.ShapeDtypeStruct((1, h, w, c), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32)]
    if meta.clip_dim:
        args.append(jax.ShapeDtypeStruct((1, meta.clip_dim), jnp.float32))
    tree = jax.eval_shape(m.init, jax.random.PRNGKey(0), *args)["params"]
    flat = {}
    for fn, sub in tree.items():
        if hasattr(sub, "shape"):
            flat[(fn, None)] = tuple(sub.shape)
        else:
            for leaf, a in sub.items():
                flat[(fn, leaf)] = tuple(a.shape)
    exp = {(fn, leaf): shape
           for _, (fn, leaf, kind, shape) in vdiff_torch_key_map(name).items()}
    assert flat == exp


def test_meta_t_range(ref):
    _, rutils = ref
    _, meta = get_vdiff_model("danbooru_128")
    assert meta.min_t == pytest.approx(
        rutils.get_ddpm_schedule(torch.tensor(0.0)).item(), abs=1e-6)
    assert meta.max_t == pytest.approx(
        rutils.get_ddpm_schedule(torch.tensor(1.0)).item(), abs=1e-6)
    _, meta = get_vdiff_model("yfcc_1")
    assert (meta.min_t, meta.max_t) == (0.0, 1.0)
    assert get_vdiff_model("cc12m_1")[1].clip_model == "ViT-B/16"


# ---------------------------------------------------------------------------
# weight-transplant forward parity on tiny spec nets built from the
# reference's OWN block classes
# ---------------------------------------------------------------------------

def _build_torch_seq(blocks_mod, spec, *, up, conv_block, attn_cls,
                     has_is_last):
    from torch import nn as tnn

    seq = []
    for node in spec:
        if node[0] == "res":
            _, cin, cmid, cout, last = node
            if has_is_last:
                seq.append(conv_block(cin, cmid, cout, is_last=last))
            else:
                assert not last
                seq.append(conv_block(cin, cmid, cout))
        elif node[0] == "attn":
            seq.append(attn_cls(node[1], node[2]))
        elif node[0] == "down":
            seq.append(tnn.AvgPool2d(2))
        elif node[0] == "up":
            seq.append(up)
        elif node[0] == "skip":
            inner = _build_torch_seq(blocks_mod, node[1], up=up,
                                     conv_block=conv_block,
                                     attn_cls=attn_cls,
                                     has_is_last=has_is_last)
            seq.append(blocks_mod.SkipBlock(inner))
    return seq


def _run_parity(ref, cfg, family, seed=0):
    """Build torch tiny net from reference family blocks + flax twin,
    transplant the torch weights, compare forwards."""
    rmodels, rutils = ref
    from torch import nn as tnn

    torch.manual_seed(seed)
    rng = np.random.default_rng(seed)
    spec = cfg.spec()

    if family == "danbooru":
        bm = rmodels.danbooru_128
        up = tnn.Upsample(scale_factor=2, mode="nearest")
        seq = _build_torch_seq(bm, spec, up=up, conv_block=bm.ResConvBlock,
                               attn_cls=bm.SelfAttention2d, has_is_last=False)
        net = tnn.Module()
        net.timestep_embed = bm.FourierFeatures(1, 16, std=cfg.ff_std)
        net.net = tnn.Sequential(*seq)

        def tfwd(x, t):
            log_snr = rutils.alpha_sigma_to_log_snr(
                *rutils.t_to_alpha_sigma(t))
            emb = bm.expand_to_planes(
                net.timestep_embed(log_snr[:, None]), x.shape)
            return net.net(torch.cat([x, emb], dim=1))
    elif family == "yfcc_2":
        bm = rmodels.yfcc_2
        up = tnn.Upsample(scale_factor=2, mode="bilinear",
                          align_corners=False)
        seq = _build_torch_seq(bm, spec, up=up, conv_block=bm.ResConvBlock,
                               attn_cls=bm.SelfAttention2d, has_is_last=True)
        net = tnn.Module()
        net.timestep_embed = bm.FourierFeatures(1, 16)
        net.net = tnn.Sequential(*seq)

        def tfwd(x, t):
            emb = bm.expand_to_planes(net.timestep_embed(t[:, None]), x.shape)
            return net.net(torch.cat([x, emb], dim=1))
    else:  # cc12m modulated
        import functools
        bm = rmodels.cc12m_1
        up = tnn.Upsample(scale_factor=2, mode="bilinear",
                          align_corners=False)
        state = {}
        conv_block = functools.partial(bm.ResModConvBlock, state,
                                       cfg.cond_width)
        seq = _build_torch_seq(bm, spec, up=up, conv_block=conv_block,
                               attn_cls=bm.SelfAttention2d, has_is_last=True)
        net = tnn.Module()
        net.timestep_embed = bm.FourierFeatures(1, 16)
        net.mapping_timestep_embed = bm.FourierFeatures(1, 128)
        net.mapping = tnn.Sequential(
            bm.ResLinearBlock(cfg.clip_dim + 128, cfg.cond_width,
                              cfg.cond_width),
            bm.ResLinearBlock(cfg.cond_width, cfg.cond_width,
                              cfg.cond_width, is_last=True))
        net.net = tnn.Sequential(*seq)

        def tfwd(x, t, clip_embed):
            import torch.nn.functional as F
            ce = F.normalize(clip_embed, dim=-1) * clip_embed.shape[-1]**0.5
            mt = net.mapping_timestep_embed(t[:, None])
            state["cond"] = net.mapping(torch.cat([ce, mt], dim=1))
            emb = bm.expand_to_planes(net.timestep_embed(t[:, None]), x.shape)
            out = net.net(torch.cat([x, emb], dim=1))
            state.clear()
            return out

    fx = _module_from_cfg(cfg)
    params = _convert_state_dict(cfg, net.state_dict(), "tiny")

    x = rng.standard_normal((2, cfg.size, cfg.size, 3)).astype(np.float32)
    t = np.asarray([0.3, 0.8], np.float32)
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    tt = torch.from_numpy(t)
    if family == "cc12m":
        ce = rng.standard_normal((2, cfg.clip_dim)).astype(np.float32)
        with torch.no_grad():
            want = tfwd(xt, tt, torch.from_numpy(ce)).numpy()
        got = fx.apply(params, jnp.asarray(x), jnp.asarray(t),
                       jnp.asarray(ce))
    else:
        with torch.no_grad():
            want = tfwd(xt, tt).numpy()
        got = fx.apply(params, jnp.asarray(x), jnp.asarray(t))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


_TINY_PLAIN = _NetCfg(size=16, cs=(8, 12, 16), nb=2, divisor=4,
                      attn_norm=False, up_mode="nearest", skip_first=True,
                      t_input="log_snr", ff_std=0.2, final_relu=True,
                      ddpm_range=True)
_TINY_YFCC = _NetCfg(size=16, cs=(8, 12, 16), nb=2, divisor=4,
                     attn_norm=True, up_mode="bilinear", skip_first=False,
                     t_input="t", ff_std=1.0, final_relu=False,
                     ddpm_range=False)
_TINY_CC12M = _NetCfg(size=16, cs=(8, 12, 16), nb=2, divisor=4,
                      attn_norm=True, up_mode="bilinear", skip_first=False,
                      t_input="t", ff_std=1.0, final_relu=False,
                      ddpm_range=False, clip_dim=6, cond_width=16)


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_forward_parity_plain_family(ref):
    _run_parity(ref, _TINY_PLAIN, "danbooru")


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_forward_parity_normed_attn_bilinear_family(ref):
    _run_parity(ref, _TINY_YFCC, "yfcc_2")


def test_forward_parity_modulated_family(ref):
    _run_parity(ref, _TINY_CC12M, "cc12m")


def test_loader_rejects_bad_shapes():
    sd = {"timestep_embed.weight": np.zeros((8, 2), np.float32)}
    with pytest.raises((ValueError, KeyError)):
        _convert_state_dict(_TINY_PLAIN, sd, "tiny")
