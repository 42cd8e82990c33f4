"""Round-trip golden tests for the two pretrained-weight ports.

VERDICT r1 Missing #1 / Next #4: the FID story rests on (a) the pt_inception
state-dict loader (`sgdm_tpu/eval/inception.py load_torch_weights`) and
(b) the DINO ViT loader (`sgdm_tpu/models/vit.py load_dino_torch_weights`).
Neither had ever been executed against a real torch network.  These tests
build RANDOM torch networks in the exact on-disk formats and assert the Flax
forward matches the torch forward:

  * DINO: the reference's own vendored torch ViT
    (`side_repo/STEGO/src/dino/vision_transformer.py` — the same
    architecture torch.hub serves for facebookresearch/dino) → state dict →
    `load_dino_torch_weights` → CLS / tokens / last-block qkv parity.
  * Inception: a core-torch replica of the pytorch-fid FID InceptionV3
    (same module/key naming as `pt_inception-2015-12-05-6726825d.pth`,
    including the FID patches: count_include_pad=False branch pools,
    max-pooled Mixed_7c, 1008-way fc) → torch.save → `load_torch_weights`
    (BN folding) → pool3/logits/spatial parity.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

STEGO_SRC = "/root/reference/side_repo/STEGO/src"


# ======================================================================
# DINO ViT
# ======================================================================

@pytest.fixture(scope="module")
def ref_vit_mod():
    import os

    if not os.path.isdir(STEGO_SRC):
        pytest.skip("reference STEGO not mounted")
    if STEGO_SRC not in sys.path:
        sys.path.append(STEGO_SRC)
    from dino import vision_transformer as vt

    return vt


def _randomize_torch(model, seed, std=0.02):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for prm in model.parameters():
            prm.copy_(torch.randn(prm.shape, generator=g) * std)
    return model


def test_dino_vit_loader_roundtrip(ref_vit_mod, tmp_path):
    import jax.numpy as jnp

    from sgdm_tpu.models.vit import load_dino_torch_weights, vit_small

    tm = ref_vit_mod.vit_small(patch_size=16).eval()
    _randomize_torch(tm, seed=0)
    pth = tmp_path / "dino_vits16.pth"
    torch.save(tm.state_dict(), pth)

    fm = vit_small(patch_size=16)
    params = load_dino_torch_weights(str(pth))

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)

    with torch.no_grad():
        ref_cls = tm(torch.from_numpy(x)).numpy()
        ref_tokens = tm.get_intermediate_layers(torch.from_numpy(x), n=1)[0].numpy()

    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    our_cls = np.asarray(fm.apply({"params": params}, xj, out="cls"))
    our_tokens = np.asarray(fm.apply({"params": params}, xj, out="tokens"))

    np.testing.assert_allclose(our_cls, ref_cls, rtol=0, atol=5e-4)
    np.testing.assert_allclose(our_tokens, ref_tokens, rtol=0, atol=5e-4)


def test_dino_vit_qkv_matches(ref_vit_mod, tmp_path):
    """LOST consumes the last block's key features — assert q/k/v parity."""
    import jax.numpy as jnp

    from sgdm_tpu.models.vit import load_dino_torch_weights, vit_small

    tm = ref_vit_mod.vit_small(patch_size=16).eval()
    _randomize_torch(tm, seed=3)
    pth = tmp_path / "dino.pth"
    torch.save(tm.state_dict(), pth)
    fm = vit_small(patch_size=16)
    params = load_dino_torch_weights(str(pth))

    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        _, _, qkvs = tm.get_intermediate_feat(torch.from_numpy(x), n=1)
    ref_qkv = qkvs[0].numpy()  # [3, B, H, N, d]

    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    _, (q, k, v) = fm.apply({"params": params}, xj, out="qkv_last")
    np.testing.assert_allclose(np.asarray(q), ref_qkv[0], rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(k), ref_qkv[1], rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(v), ref_qkv[2], rtol=0, atol=5e-4)


# ======================================================================
# FID InceptionV3 — core-torch replica with pt_inception key naming
# ======================================================================

class TConvBN(tnn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class TInceptionA(tnn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = TConvBN(cin, 64, kernel_size=1)
        self.branch5x5_1 = TConvBN(cin, 48, kernel_size=1)
        self.branch5x5_2 = TConvBN(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TConvBN(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TConvBN(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TConvBN(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TConvBN(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(_avg(x))
        return torch.cat([b1, b5, bd, bp], 1)


class TInceptionB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = TConvBN(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TConvBN(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TConvBN(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TConvBN(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class TInceptionC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = TConvBN(cin, 192, kernel_size=1)
        self.branch7x7_1 = TConvBN(cin, c7, kernel_size=1)
        self.branch7x7_2 = TConvBN(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = TConvBN(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TConvBN(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = TConvBN(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TConvBN(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TConvBN(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TConvBN(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = TConvBN(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(
            self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(_avg(x))
        return torch.cat([b1, b7, bd, bp], 1)


class TInceptionD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = TConvBN(cin, 192, kernel_size=1)
        self.branch3x3_2 = TConvBN(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TConvBN(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = TConvBN(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TConvBN(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TConvBN(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(
                self.branch7x7x3_2(self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class TInceptionE(tnn.Module):
    def __init__(self, cin, use_max_pool=False):
        super().__init__()
        self.use_max_pool = use_max_pool
        self.branch1x1 = TConvBN(cin, 320, kernel_size=1)
        self.branch3x3_1 = TConvBN(cin, 384, kernel_size=1)
        self.branch3x3_2a = TConvBN(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = TConvBN(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TConvBN(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = TConvBN(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TConvBN(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TConvBN(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = TConvBN(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.use_max_pool:
            bp = F.max_pool2d(x, 3, stride=1, padding=1)
        else:
            bp = _avg(x)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b3, bd, bp], 1)


class TFIDInception(tnn.Module):
    """pytorch-fid's FID InceptionV3 rebuilt on core torch (same key names)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TConvBN(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TConvBN(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TConvBN(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TConvBN(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TConvBN(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280)
        self.Mixed_7c = TInceptionE(2048, use_max_pool=True)
        self.fc = tnn.Linear(2048, 1008)

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Mixed_5b(x)
        x = self.Mixed_5c(x)
        x = self.Mixed_5d(x)
        x = self.Mixed_6a(x)
        x = self.Mixed_6b(x)
        x = self.Mixed_6c(x)
        x = self.Mixed_6d(x)
        x = self.Mixed_6e(x)
        spatial = x[:, :7].reshape(x.shape[0], -1)
        x = self.Mixed_7a(x)
        x = self.Mixed_7b(x)
        x = self.Mixed_7c(x)
        pool3 = x.mean(dim=(2, 3))
        return pool3, self.fc(pool3), spatial


def test_inception_loader_roundtrip(tmp_path):
    import jax.numpy as jnp

    from sgdm_tpu.eval.inception import FIDInceptionV3, load_torch_weights

    tm = TFIDInception().eval()
    # randomize weights AND BN running stats so the folding is non-trivial
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for prm in tm.parameters():
            prm.copy_(torch.randn(prm.shape, generator=g) * 0.05)
        for mod in tm.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.copy_(
                    torch.randn(mod.running_mean.shape, generator=g) * 0.1)
                mod.running_var.copy_(
                    torch.rand(mod.running_var.shape, generator=g) + 0.5)
    pth = tmp_path / "pt_inception.pth"
    torch.save(tm.state_dict(), pth)

    params = load_torch_weights(pth)
    fm = FIDInceptionV3()

    rng = np.random.default_rng(11)
    x = (rng.standard_normal((2, 3, 299, 299)) * 0.5).astype(np.float32)
    with torch.no_grad():
        ref_pool3, ref_logits, ref_spatial = tm(torch.from_numpy(x))

    out = fm.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out["pool3"]), ref_pool3.numpy(), rtol=0, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), ref_logits.numpy(), rtol=0, atol=1e-4)
    # ours flattens HWC, torch flattens CHW — permutation-invariant for FID
    # statistics; permute for the comparison
    ours_sp = np.asarray(out["spatial"]).reshape(2, 17, 17, 7)
    ours_sp = ours_sp.transpose(0, 3, 1, 2).reshape(2, -1)
    np.testing.assert_allclose(ours_sp, ref_spatial.numpy(), rtol=0, atol=1e-4)


def test_inception_loader_skips_auxlogits(tmp_path):
    """The real pth ships AuxLogits.* keys; the loader must ignore them."""
    from sgdm_tpu.eval.inception import load_torch_weights

    tm = TFIDInception().eval()
    sd = tm.state_dict()
    sd["AuxLogits.conv0.conv.weight"] = torch.zeros(128, 768, 1, 1)
    sd["AuxLogits.conv0.bn.weight"] = torch.ones(128)
    sd["AuxLogits.conv0.bn.bias"] = torch.zeros(128)
    sd["AuxLogits.conv0.bn.running_mean"] = torch.zeros(128)
    sd["AuxLogits.conv0.bn.running_var"] = torch.ones(128)
    pth = tmp_path / "pt_inception_aux.pth"
    torch.save(sd, pth)
    params = load_torch_weights(pth)
    assert "AuxLogits" not in params
