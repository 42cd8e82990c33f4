"""Extra denoiser zoo (models/zoo.py): diffae LatentFC + lucidrains VDM UNet.

Parity targets: dynamic/diffusionmodules/latent_fc.py:63-226,
unet_vdm_lucidrain.py:202-315.  Shape/finite checks, the input-skip
concat, and VDMUNet driving the continuous 'vdm' sampler end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sgdm_tpu.models.zoo import LatentFC, VDMUNet
import pytest


def test_latent_fc_shapes_and_skip():
    m = LatentFC(num_layers=4, num_channels=32, model_channels=24,
                 dropout=0.1)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 32)),
                    jnp.float32)
    t = jnp.asarray([0.0, 10.0, 100.0, 999.0])
    v = m.init(jax.random.PRNGKey(0), x, t)
    out = m.apply(v, x, t)
    assert out.shape == (4, 32)
    assert bool(jnp.all(jnp.isfinite(out)))
    # hidden layers past the first consume [h ‖ x] (input re-concat):
    # layer_1 linear kernel in-dim = model_channels + num_channels
    k = v["params"]["layer_1"]["linear"]["kernel"]
    assert k.shape[0] == 24 + 32
    # train-mode dropout path runs
    out_t = m.apply(v, x, t, True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert out_t.shape == (4, 32)


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_vdm_unet_forward():
    m = VDMUNet(dim=16, dim_mults=(1, 2), resnet_block_groups=4)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 16, 3)),
                    jnp.float32)
    t = jnp.asarray([0.3, 7.1])  # fractional times (log-SNR conditioning)
    v = m.init(jax.random.PRNGKey(0), x, t)
    out = m.apply(v, x, t)
    assert out.shape == (2, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(out)))
    # forward_with_cond_scale is an unconditional passthrough
    out2 = m.apply(v, x, t, method=m.forward_with_cond_scale,
                   cond_scale=3.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_vdm_unet_learned_sinusoidal_and_variance():
    m = VDMUNet(dim=16, dim_mults=(1, 2), resnet_block_groups=4,
                learned_sinusoidal_cond=True, learned_variance=True)
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.asarray([0.5])
    v = m.init(jax.random.PRNGKey(0), x, t)
    out = m.apply(v, x, t)
    assert out.shape == (1, 16, 16, 6)  # 2*channels with learned variance


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_vdm_unet_drives_continuous_sampler():
    from sgdm_tpu.diffusion.samplers.continuous import (
        beta_linear_log_snr,
        vdm_sample,
    )

    m = VDMUNet(dim=16, dim_mults=(1, 2), resnet_block_groups=4)
    x = jnp.zeros((2, 16, 16, 3))
    v = m.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)))
    denoise = lambda xt, log_snr: m.apply(v, xt, log_snr)
    img, inter = vdm_sample(
        beta_linear_log_snr, denoise, jax.random.PRNGKey(0),
        (2, 16, 16, 3), num_steps=4,
    )
    assert img.shape == (2, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(img)))


def test_ddpm_lucidrains_unet_forward():
    from sgdm_tpu.models.zoo import DDPMUNet

    m = DDPMUNet(dim=16, dim_mults=(1, 2), resnet_block_groups=4)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 16, 16, 3)),
                    jnp.float32)
    t = jnp.asarray([3.0, 500.0])
    v = m.init(jax.random.PRNGKey(0), x, t)
    out = m.apply(v, x, t)
    assert out.shape == (2, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(out)))
