"""Sampler correctness tests on an analytically-known score.

If the data distribution is x0 ~ N(0, I), then x_t ~ N(0, I) for the
variance-preserving schedule and the Bayes-optimal eps-predictor is
eps*(x_t, t) = sqrt(1 - alpha_bar_t) * x_t.  A correct sampler driven by this
denoiser must therefore produce ~N(0, I) samples; that pins down every
coefficient in the update equations far more tightly than a smoke test.

Reference parity targets: ddpm_sampler.py:154-238, ddim_plms_sampler.py,
pndm_sampler.py, tero_sampler.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgdm_tpu.diffusion import GaussianDiffusion

SHAPE = (256, 4, 4, 1)


@pytest.fixture(scope="module")
def diffusion():
    return GaussianDiffusion(beta_schedule="linear", num_timesteps=1000)


def make_gaussian_denoiser(sched):
    table = sched.sqrt_one_minus_alphas_cumprod

    def denoise(x, t):
        return table[t.astype(jnp.int32)].reshape(-1, 1, 1, 1) * x

    return denoise


def _check_standard_normal(x, atol_mean=0.1, rtol_std=0.12):
    flat = np.asarray(x, dtype=np.float64).ravel()
    assert abs(flat.mean()) < atol_mean, flat.mean()
    assert abs(flat.std() - 1.0) < rtol_std, flat.std()


class TestAncestral:
    def test_matches_analytic_distribution(self, diffusion):
        denoise = make_gaussian_denoiser(diffusion.schedule)
        img, inter = diffusion.sample(
            "native", denoise, jax.random.PRNGKey(0), SHAPE,
            clip_denoised=False, return_uint8=False,
        )
        _check_standard_normal(img)
        assert inter["pred_x0"].shape[0] == 10
        assert inter["x_inter"].shape == (10, *SHAPE)

    def test_uint8_output(self, diffusion):
        denoise = make_gaussian_denoiser(diffusion.schedule)
        small = (8, 4, 4, 1)
        img, _ = diffusion.sample(
            "native", denoise, jax.random.PRNGKey(0), small, return_uint8=True
        )
        assert img.dtype == jnp.uint8


class TestDDIM:
    def test_matches_analytic_distribution(self, diffusion):
        denoise = make_gaussian_denoiser(diffusion.schedule)
        img, _ = diffusion.sample(
            "ddim", denoise, jax.random.PRNGKey(1), SHAPE,
            num_steps=50, ddim_eta=0.0, clip_denoised=False, return_uint8=False,
        )
        _check_standard_normal(img)

    def test_eta1_matches_too(self, diffusion):
        denoise = make_gaussian_denoiser(diffusion.schedule)
        img, _ = diffusion.sample(
            "ddim", denoise, jax.random.PRNGKey(2), SHAPE,
            num_steps=50, ddim_eta=1.0, clip_denoised=False, return_uint8=False,
        )
        _check_standard_normal(img)

    def test_deterministic_given_xT_when_eta0(self, diffusion):
        denoise = make_gaussian_denoiser(diffusion.schedule)
        x_T = jax.random.normal(jax.random.PRNGKey(3), (4, 4, 4, 1))
        img1, _ = diffusion.sample(
            "ddim", denoise, jax.random.PRNGKey(4), (4, 4, 4, 1),
            num_steps=20, ddim_eta=0.0, x_T=x_T, return_uint8=False,
        )
        img2, _ = diffusion.sample(
            "ddim", denoise, jax.random.PRNGKey(5), (4, 4, 4, 1),
            num_steps=20, ddim_eta=0.0, x_T=x_T, return_uint8=False,
        )
        np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), atol=1e-6)

    def test_jittable_end_to_end(self, diffusion):
        denoise = make_gaussian_denoiser(diffusion.schedule)

        @jax.jit
        def run(key):
            img, _ = diffusion.sample(
                "ddim", denoise, key, (2, 4, 4, 1), num_steps=10,
                return_uint8=False,
            )
            return img

        out = run(jax.random.PRNGKey(0))
        assert out.shape == (2, 4, 4, 1)


class TestPLMS:
    def test_matches_analytic_distribution(self, diffusion):
        denoise = make_gaussian_denoiser(diffusion.schedule)
        img, _ = diffusion.sample(
            "plms", denoise, jax.random.PRNGKey(6), SHAPE,
            num_steps=50, clip_denoised=False, return_uint8=False,
        )
        _check_standard_normal(img)


class TestPNDM:
    def test_runs_and_reasonable(self, diffusion):
        # PNDM rebuilds its own (plain-linear) beta table — a reference quirk —
        # so the analytic denoiser is slightly mismatched; only sanity-check.
        denoise = make_gaussian_denoiser(diffusion.schedule)
        img, _ = diffusion.sample(
            "pndm", denoise, jax.random.PRNGKey(7), (64, 4, 4, 1),
            num_steps=50, return_uint8=False,
        )
        flat = np.asarray(img, dtype=np.float64).ravel()
        assert np.all(np.isfinite(flat))
        assert abs(flat.mean()) < 0.3
        assert 0.5 < flat.std() < 2.0


class TestEDM:
    def test_runs_finite(self, diffusion):
        # the tero sampler feeds the model EDM sigmas through an integer index;
        # with our analytic eps model the preconditioning mismatch means we
        # only check the plumbing (finite output, right shape), like the
        # reference's own __main__ harness (tero_sampler.py:153-160).
        denoise = make_gaussian_denoiser(diffusion.schedule)
        img, _ = diffusion.sample(
            "tero", denoise, jax.random.PRNGKey(8), (4, 4, 4, 1),
            num_steps=40, return_uint8=False,
        )
        assert img.shape == (4, 4, 4, 1)
        assert np.all(np.isfinite(np.asarray(img)))


class TestRegistry:
    def test_unknown_sampler_raises(self, diffusion):
        with pytest.raises(KeyError):
            diffusion.sample(
                "does_not_exist", lambda x, t: x, jax.random.PRNGKey(0), (1, 4, 4, 1)
            )
