"""SimCLR ResNet-50 port: forward parity against a core-torch torchvision
replica with pl_bolts checkpoint key naming (round-trip through
`load_simclr_torch_weights`'s BN folding)."""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


class TBottleneck(tnn.Module):
    def __init__(self, cin, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )
        else:
            self.downsample = None

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        skip = self.downsample(x) if self.downsample is not None else x
        return F.relu(out + skip)


class TResNet50(tnn.Module):
    """torchvision resnet layout (the pl_bolts SimCLR encoder trunk)."""

    def __init__(self, stage_sizes=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        cin, planes = 64, 64
        for stage, blocks in enumerate(stage_sizes):
            layers = []
            for i in range(blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                layers.append(TBottleneck(cin, planes, stride=stride,
                                          downsample=(i == 0)))
                cin = planes * 4
            setattr(self, f"layer{stage + 1}", tnn.Sequential(*layers))
            planes *= 2

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
        return x.mean(dim=(2, 3))


def test_simclr_resnet_roundtrip(tmp_path):
    import jax.numpy as jnp

    from sgdm_tpu.models.resnet import ResNet50, load_simclr_torch_weights

    tm = TResNet50().eval()
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for prm in tm.parameters():
            prm.copy_(torch.randn(prm.shape, generator=g) * 0.05)
        for mod in tm.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.copy_(
                    torch.randn(mod.running_mean.shape, generator=g) * 0.1)
                mod.running_var.copy_(
                    torch.rand(mod.running_var.shape, generator=g) + 0.5)
    # pl_bolts ckpt format: {'state_dict': {'encoder.<torchvision key>': ...}}
    sd = {f"encoder.{k}": v for k, v in tm.state_dict().items()}
    pth = tmp_path / "simclr_imagenet.ckpt"
    torch.save({"state_dict": sd}, pth)

    params = load_simclr_torch_weights(str(pth))
    fm = ResNet50()

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    ours = np.asarray(fm.apply({"params": params},
                               jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert ours.shape == (2, 2048)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-4)


def _randomized_trunk(stage_sizes=(3, 4, 6, 3), seed=0):
    tm = TResNet50(stage_sizes).eval()
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for prm in tm.parameters():
            prm.copy_(torch.randn(prm.shape, generator=g) * 0.05)
        for mod in tm.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.copy_(
                    torch.randn(mod.running_mean.shape, generator=g) * 0.1)
                mod.running_var.copy_(
                    torch.rand(mod.running_var.shape, generator=g) + 0.5)
    return tm


def _assert_parity(tm, model, params):
    import jax.numpy as jnp

    x = np.random.default_rng(1).standard_normal((2, 3, 64, 64)).astype("f4")
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    ours = np.asarray(model.apply({"params": params},
                                  jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-4)


def test_vissl_consolidated_roundtrip(tmp_path):
    """Consolidated VISSL layout (jigsaw/simclr .torch files):
    classy_state_dict.base_model.model.trunk._feature_blocks.* — parity
    vs self_sl/vissl_backbone.py:36-91 trunk-features-only extraction."""
    from sgdm_tpu.models.resnet import ResNet50, load_vissl_torch_weights

    tm = _randomized_trunk()
    trunk = {f"_feature_blocks.{k}": v for k, v in tm.state_dict().items()}
    pth = tmp_path / "converted_vissl_rn50_jigsaw_in1k_goyal19.torch"
    torch.save({"classy_state_dict": {"base_model": {"model": {
        "trunk": trunk}}}}, pth)
    _assert_parity(tm, ResNet50(), load_vissl_torch_weights(str(pth)))


def test_vissl_swav_roundtrip_rn101(tmp_path):
    """SwAV/deepclusterv2 layout: flat module.* keys plus projection head
    and prototypes (must be dropped); RN101 stage sizes inferred from the
    block indices (vissl_simclr is an RN101, vissl_backbone.py:53-58)."""
    from sgdm_tpu.models.resnet import load_vissl_torch_weights, resnet101

    tm = _randomized_trunk(stage_sizes=(3, 4, 23, 3))
    sd = {f"module.{k}": v for k, v in tm.state_dict().items()}
    sd["module.projection_head.0.weight"] = torch.zeros(2, 2048)
    sd["module.prototypes.weight"] = torch.zeros(3, 2)
    pth = tmp_path / "deepclusterv2_800ep_pretrain.pth.tar"
    torch.save(sd, pth)
    _assert_parity(tm, resnet101(), load_vissl_torch_weights(str(pth)))


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_vissl_backbone_interface():
    from sgdm_tpu.selfsup.ssl_backbone import get_ssl_backbone

    bb = get_ssl_backbone("vissl_deepclusterv2", image_size=64)
    assert bb.feat_dim == 2048
    imgs = np.random.default_rng(0).integers(0, 255, (2, 64, 64, 3),
                                             dtype=np.uint8)
    feats = bb.batch_encode_feat(bb.transform_batch(imgs))
    assert feats.shape == (2, 2048) and np.isfinite(feats).all()


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_simclr_backbone_interface():
    from sgdm_tpu.selfsup.ssl_backbone import get_ssl_backbone

    bb = get_ssl_backbone("simclr_rn50", image_size=64)
    assert bb.feat_dim == 2048
    imgs = np.random.default_rng(0).integers(0, 255, (2, 64, 64, 3),
                                             dtype=np.uint8)
    feats = bb.batch_encode_feat(bb.transform_batch(imgs))
    assert feats.shape == (2, 2048)
    assert np.isfinite(feats).all()
