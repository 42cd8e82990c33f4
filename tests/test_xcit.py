"""XCiT port: golden parity vs a torch replica of the upstream modules.

The reference consumes XCiT from torch.hub (`self_sl/ssl_backbone.py:
114-118` dino_xcit_medium_24_p8) — no weights exist in this zero-egress
image, so the ground truth here is a faithful torch re-statement of the
facebookresearch/xcit modules (same structure, same state-dict naming as
the published checkpoints).  The test randomizes it (including BN running
stats via a train-mode forward), exports the state dict, loads it through
`load_xcit_torch_weights`, and demands matching features — which pins the
weight mapper (OIHW/depthwise/linear transposes, BN folding) and the
numerical semantics (XCA normalize axis, Fourier positions, class-attn
quirks) across frameworks.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

from sgdm_tpu.models.xcit import XCiT, load_xcit_torch_weights  # noqa: E402

# ---------------------------------------------------------------- torch
# replica of facebookresearch/xcit xcit.py (El-Nouby et al. 2021), tiny


def conv3x3(cin, cout, stride=1):
    return nn.Sequential(
        nn.Conv2d(cin, cout, 3, stride, 1, bias=False), nn.BatchNorm2d(cout))


class TConvPatchEmbed(nn.Module):
    def __init__(self, patch_size, dim):
        super().__init__()
        if patch_size == 16:
            self.proj = nn.Sequential(
                conv3x3(3, dim // 8, 2), nn.GELU(),
                conv3x3(dim // 8, dim // 4, 2), nn.GELU(),
                conv3x3(dim // 4, dim // 2, 2), nn.GELU(),
                conv3x3(dim // 2, dim, 2))
        else:
            self.proj = nn.Sequential(
                conv3x3(3, dim // 4, 2), nn.GELU(),
                conv3x3(dim // 4, dim // 2, 2), nn.GELU(),
                conv3x3(dim // 2, dim, 2))

    def forward(self, x):
        x = self.proj(x)
        hp, wp = x.shape[2], x.shape[3]
        return x.flatten(2).transpose(1, 2), (hp, wp)


class TPosFourier(nn.Module):
    def __init__(self, dim, hidden=32, temperature=10000.0):
        super().__init__()
        self.token_projection = nn.Conv2d(hidden * 2, dim, 1)
        self.hidden, self.temp, self.scale = hidden, temperature, 2 * math.pi

    def forward(self, b, h, w):
        ones = torch.ones(b, h, w)
        y = ones.cumsum(1) / (h + 1e-6) * self.scale
        x = ones.cumsum(2) / (w + 1e-6) * self.scale
        dim_t = torch.arange(self.hidden, dtype=torch.float32)
        dim_t = self.temp ** (2 * torch.div(dim_t, 2, rounding_mode="floor")
                              / self.hidden)
        px, py = x[..., None] / dim_t, y[..., None] / dim_t
        px = torch.stack([px[..., 0::2].sin(), px[..., 1::2].cos()],
                         dim=4).flatten(3)
        py = torch.stack([py[..., 0::2].sin(), py[..., 1::2].cos()],
                         dim=4).flatten(3)
        pos = torch.cat([py, px], dim=3).permute(0, 3, 1, 2)
        return self.token_projection(pos)


class TXCA(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.num_heads = heads
        self.temperature = nn.Parameter(torch.ones(heads, 1, 1))
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, C // self.num_heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        q, k, v = (t.transpose(-2, -1) for t in (q, k, v))  # [B,h,d,N]
        q = torch.nn.functional.normalize(q, dim=-1)
        k = torch.nn.functional.normalize(k, dim=-1)
        attn = (q @ k.transpose(-2, -1)) * self.temperature
        attn = attn.softmax(dim=-1)
        x = (attn @ v).permute(0, 3, 1, 2).reshape(B, N, C)
        return self.proj(x)


class TLPI(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv1 = nn.Conv2d(dim, dim, 3, padding=1, groups=dim)
        self.act = nn.GELU()
        self.bn = nn.BatchNorm2d(dim)
        self.conv2 = nn.Conv2d(dim, dim, 3, padding=1, groups=dim)

    def forward(self, x, h, w):
        B, N, C = x.shape
        x = x.permute(0, 2, 1).reshape(B, C, h, w)
        x = self.conv2(self.bn(self.act(self.conv1(x))))
        return x.reshape(B, C, N).permute(0, 2, 1)


class TMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1, self.fc2 = nn.Linear(dim, hidden), nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(torch.nn.functional.gelu(self.fc1(x)))


class TXCABlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio, eta):
        super().__init__()
        self.norm1, self.norm2, self.norm3 = (
            nn.LayerNorm(dim, eps=1e-6) for _ in range(3))
        self.attn = TXCA(dim, heads)
        self.local_mp = TLPI(dim)
        self.mlp = TMlp(dim, int(dim * mlp_ratio))
        for g in ("gamma1", "gamma2", "gamma3"):
            setattr(self, g, nn.Parameter(eta * torch.ones(dim)))

    def forward(self, x, h, w):
        x = x + self.gamma1 * self.attn(self.norm1(x))
        x = x + self.gamma3 * self.local_mp(self.norm3(x), h, w)
        x = x + self.gamma2 * self.mlp(self.norm2(x))
        return x


class TClassAttn(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.num_heads, self.scale = heads, (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, C // self.num_heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        attn_cls = (q[:, :, 0:1] * k).sum(-1) * self.scale
        attn_cls = attn_cls.softmax(dim=-1)
        cls = (attn_cls.unsqueeze(2) @ v).transpose(1, 2).reshape(B, 1, C)
        return torch.cat([self.proj(cls), x[:, 1:]], dim=1)


class TClassAttentionBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio, eta, tokens_norm):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TClassAttn(dim, heads)
        self.mlp = TMlp(dim, int(dim * mlp_ratio))
        self.gamma1 = nn.Parameter(eta * torch.ones(dim))
        self.gamma2 = nn.Parameter(eta * torch.ones(dim))
        self.tokens_norm = tokens_norm

    def forward(self, x):
        x = x + self.gamma1 * self.attn(self.norm1(x))
        if self.tokens_norm:
            x = self.norm2(x)
        else:
            x = torch.cat([self.norm2(x[:, 0:1]), x[:, 1:]], dim=1)
        x_res = x
        cls = self.gamma2 * self.mlp(x[:, 0:1])
        x = torch.cat([cls, x[:, 1:]], dim=1)
        return x_res + x


class TXCiT(nn.Module):
    def __init__(self, patch_size=8, dim=32, depth=2, heads=4,
                 mlp_ratio=2.0, cls_layers=2, eta=1.0, tokens_norm=True):
        super().__init__()
        self.patch_embed = TConvPatchEmbed(patch_size, dim)
        self.pos_embeder = TPosFourier(dim)
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.blocks = nn.ModuleList(
            [TXCABlock(dim, heads, mlp_ratio, eta) for _ in range(depth)])
        self.cls_attn_blocks = nn.ModuleList(
            [TClassAttentionBlock(dim, heads, mlp_ratio, eta, tokens_norm)
             for _ in range(cls_layers)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        B = x.shape[0]
        x, (hp, wp) = self.patch_embed(x)
        pos = self.pos_embeder(B, hp, wp).reshape(
            B, -1, x.shape[1]).permute(0, 2, 1)
        x = x + pos
        for blk in self.blocks:
            x = blk(x, hp, wp)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        for blk in self.cls_attn_blocks:
            x = blk(x)
        return self.norm(x)[:, 0]


# ---------------------------------------------------------------- tests

TINY = dict(patch_size=8, embed_dim=32, depth=2, num_heads=4,
            mlp_ratio=2.0, cls_attn_layers=2, eta=1.0, tokens_norm=True)


def _randomized_torch(seed=0):
    torch.manual_seed(seed)
    tm = TXCiT(patch_size=8, dim=32, depth=2, heads=4, mlp_ratio=2.0,
               cls_layers=2, eta=1.0, tokens_norm=True)
    for p in tm.parameters():  # break ones/zeros inits (gammas, BN, LN)
        with torch.no_grad():
            p.add_(0.05 * torch.randn_like(p))
    tm.train()
    with torch.no_grad():  # populate BN running stats with real statistics
        tm(torch.randn(4, 3, 32, 32))
    return tm.eval()


@pytest.mark.parametrize("tokens_norm", [True, False])
def test_golden_vs_torch_replica(tmp_path, tokens_norm):
    tm = _randomized_torch()
    for blk in tm.cls_attn_blocks:
        blk.tokens_norm = tokens_norm
    path = tmp_path / "xcit.pth"
    torch.save(tm.state_dict(), path)

    model = XCiT(**{**TINY, "tokens_norm": tokens_norm})
    params = load_xcit_torch_weights(str(path))

    x = np.random.default_rng(1).standard_normal((2, 3, 32, 32)).astype("f4")
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = model.apply({"params": params},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), out="cls")
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)


def test_loader_rejects_missing_keys(tmp_path):
    tm = _randomized_torch()
    sd = tm.state_dict()
    del sd["blocks.0.attn.temperature"]
    path = tmp_path / "bad.pth"
    torch.save(sd, path)
    with pytest.raises(KeyError):
        load_xcit_torch_weights(str(path))


def test_output_contracts():
    model = XCiT(**TINY)
    x = jnp.zeros((2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    n = (32 // 8) ** 2
    cls = model.apply({"params": params}, x, out="cls")
    toks = model.apply({"params": params}, x, out="tokens")
    attn = model.apply({"params": params}, x, out="attn_last")
    assert cls.shape == (2, 32)
    assert toks.shape == (2, 1 + n, 32)
    assert attn.shape == (2, 4, 1, 1 + n)
    a = np.asarray(attn[:, :, 0, :])
    np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-5)  # softmax rows


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_ssl_backbone_integration():
    from sgdm_tpu.selfsup.ssl_backbone import get_ssl_backbone

    bb = get_ssl_backbone("dino_xcit_m24_p8", image_size=32)
    assert bb.feat_dim == 512
    imgs = np.random.default_rng(0).integers(
        0, 255, (2, 32, 32, 3), dtype=np.uint8)
    feat = bb.batch_encode_feat(bb.transform_batch(imgs))
    assert feat.shape == (2, 512) and np.isfinite(feat).all()
