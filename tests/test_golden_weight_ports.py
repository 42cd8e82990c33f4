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

from sgdm_tpu.eval.torch_inception_ref import TFIDInception


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


def test_first_use_golden_verification(tmp_path):
    """utils.weight_verify: loading a 'real' checkpoint auto-verifies the
    port against torch and writes a sidecar golden; a tampered sidecar
    (simulated mapping error) fails loudly."""
    import numpy as np
    import pytest as _pytest

    from sgdm_tpu.eval.inception import load_torch_weights
    from sgdm_tpu.utils.weight_verify import _sidecar, verify_inception_load

    tm = TFIDInception().eval()
    g = torch.Generator().manual_seed(21)
    with torch.no_grad():
        for prm in tm.parameters():
            prm.copy_(torch.randn(prm.shape, generator=g) * 0.05)
    pth = tmp_path / "pt_inception.pth"
    torch.save(tm.state_dict(), pth)

    params = load_torch_weights(pth)
    assert verify_inception_load(pth, params) is True
    side = _sidecar(pth)
    assert side.exists()

    # second load verifies against the sidecar (no torch needed)
    assert verify_inception_load(pth, params) is True

    # a mapping error (wrong features) must fail loudly
    bad = dict(np.load(side))
    bad["pool3"] = bad["pool3"] + 1.0
    np.savez(side, **bad)
    with _pytest.raises(RuntimeError, match="verification FAILED"):
        verify_inception_load(pth, params)
