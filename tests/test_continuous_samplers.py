"""Continuous-time samplers (diffusion/samplers/continuous.py).

Parity targets: diffusion/sampler/continuous_vdm.py (Schedule_VDM +
learned_noise_schedule) and continous_ddim.py (DDIMSampler_Continuous).
The analytic-denoiser trick from the verify recipe: for x0 ~ N(0,I) the
exact eps-predictor is sigma(t)·x_t, making sampler output ~N(0,1) —
mean ≈ 0, std ≈ 1 pre-unnormalize.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgdm_tpu.diffusion import GaussianDiffusion
from sgdm_tpu.diffusion.samplers.continuous import (
    LearnedNoiseSchedule,
    alpha_cosine_log_snr,
    beta_linear_log_snr,
    ddim_continuous_sample,
    vdm_q_sample,
    vdm_sample,
)


def test_log_snr_schedules_match_reference_formulas():
    t = np.linspace(0.01, 0.99, 17)
    lin = np.asarray(beta_linear_log_snr(jnp.asarray(t)))
    np.testing.assert_allclose(
        lin, -np.log(np.expm1(1e-4 + 10 * t**2)), rtol=1e-5)
    cos = np.asarray(alpha_cosine_log_snr(jnp.asarray(t)))
    np.testing.assert_allclose(
        cos, -np.log(np.cos((t + 0.008) / 1.008 * np.pi / 2) ** -2 - 1),
        rtol=1e-4)
    # SNR decreases with time (more noise later)
    assert np.all(np.diff(lin) < 0)
    assert np.all(np.diff(cos) < 0)


def test_vdm_q_sample_preserves_unit_variance():
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (64, 8, 8, 3))
    xt, log_snr = vdm_q_sample(
        beta_linear_log_snr, rng, x0, jnp.full((64,), 0.5))
    assert xt.shape == x0.shape and log_snr.shape == (64,)
    # alpha^2 + sigma^2 = 1 ⇒ var(x_t) ≈ 1 for unit-variance data
    assert abs(float(jnp.std(xt)) - 1.0) < 0.05


def _analytic_vdm_denoiser(log_snr_fn):
    def fn(x, batch_log_snr):
        sigma = jnp.sqrt(jax.nn.sigmoid(-batch_log_snr))
        return sigma.reshape(-1, 1, 1, 1) * x

    return fn


def test_vdm_sample_analytic_gaussian():
    img, inter = vdm_sample(
        beta_linear_log_snr,
        _analytic_vdm_denoiser(beta_linear_log_snr),
        jax.random.PRNGKey(0), (64, 8, 8, 3),
        num_steps=50, clip_denoised=False,
    )
    assert img.shape == (64, 8, 8, 3)
    assert inter["pred_x0"].shape[0] == 10
    assert abs(float(jnp.mean(img))) < 0.1
    assert abs(float(jnp.std(img)) - 1.0) < 0.15


def test_ddim_continuous_analytic_gaussian():
    n_t = 200
    alpha_fn = lambda t: jax.nn.sigmoid(beta_linear_log_snr(t))
    table = jnp.sqrt(1.0 - alpha_fn(jnp.linspace(0.0, 1.0, n_t)))

    def denoise(x, t):
        return table[t].reshape(-1, 1, 1, 1) * x

    img, inter = ddim_continuous_sample(
        alpha_fn, denoise, jax.random.PRNGKey(0), (64, 8, 8, 3),
        num_ddpm_timesteps=n_t, num_steps=25, clip_denoised=False,
    )
    assert img.shape == (64, 8, 8, 3)
    assert abs(float(jnp.mean(img))) < 0.1
    assert abs(float(jnp.std(img)) - 1.0) < 0.15


@pytest.mark.parametrize("method", ["vdm", "ddim_continuous"])
def test_registry_dispatch(method):
    # 'sqrt_linear' = the plain-linspace betas whose continuous form IS
    # beta_linear_log_snr (the analytic denoiser below assumes it); the
    # LDM sqrt-space default 'linear' has no closed form and must raise
    diff = GaussianDiffusion(num_timesteps=100, beta_schedule="sqrt_linear")
    if method == "vdm":
        denoise = _analytic_vdm_denoiser(beta_linear_log_snr)
    else:
        alpha_fn = lambda t: jax.nn.sigmoid(beta_linear_log_snr(t))
        table = jnp.sqrt(1.0 - alpha_fn(jnp.linspace(0.0, 1.0, 100)))
        denoise = lambda x, t: table[t.astype(jnp.int32)].reshape(
            -1, 1, 1, 1) * x
    img, inter = diff.sample(
        method, denoise, jax.random.PRNGKey(0), (8, 8, 8, 3),
        num_steps=10, clip_denoised=False,
    )
    assert img.shape == (8, 8, 8, 3) and img.dtype == jnp.uint8
    # ~N(0,1) pre-uint8 ⇒ mean near 127 after unnormalization
    assert 110 < float(jnp.mean(img.astype(jnp.float32))) < 145


def test_learned_noise_schedule_monotonic_and_bounded():
    m = LearnedNoiseSchedule(log_snr_max=9.2, log_snr_min=-6.9,
                             hidden_dim=32)
    t = jnp.linspace(0.0, 1.0, 33)
    params = m.init(jax.random.PRNGKey(0), t)
    out = np.asarray(m.apply(params, t))
    np.testing.assert_allclose(out[0], 9.2, atol=1e-4)
    np.testing.assert_allclose(out[-1], -6.9, atol=1e-4)
    assert np.all(np.diff(out) <= 1e-6)  # monotone non-increasing


def test_unsupported_schedule_raises():
    """The LDM sqrt-space 'linear' default (and any schedule without a
    closed-form log-SNR) must raise instead of silently sampling the
    plain-linspace schedule's log-SNR."""
    for sched in ("linear", "cosine_s999", "sqrt"):
        try:
            diff = GaussianDiffusion(num_timesteps=50, beta_schedule=sched)
        except ValueError:
            continue  # schedule itself unknown — fine
        with pytest.raises(ValueError, match="log-SNR"):
            diff.sample("vdm", lambda x, t: x, jax.random.PRNGKey(0),
                        (2, 8, 8, 3), num_steps=4)
