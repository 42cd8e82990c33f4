"""Golden tests for the diffusion schedule math.

Reference semantics (SURVEY.md §2.3): `dynamic/diffusionmodules/util.py:23-76`
and `diffusion/sampler/ddpm_sampler.py:25-152`.  Golden values are computed
here with torch (CPU) using the same formulas the reference uses, so any
drift in our numpy/JAX port is caught exactly.
"""

import numpy as np
import pytest
import torch

from sgdm_tpu.diffusion import (
    DiffusionSchedule,
    make_beta_schedule,
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
)
from sgdm_tpu.diffusion.schedule import clip_x0, extract, q_posterior, q_sample
import jax.numpy as jnp
import jax


def torch_linear_betas(T, start, end):
    # the LDM sqrt-space linear schedule, exactly as the reference computes it
    return (torch.linspace(start**0.5, end**0.5, T, dtype=torch.float64) ** 2).numpy()


class TestBetaSchedules:
    def test_linear_is_sqrt_space(self):
        ours = make_beta_schedule("linear", 1000, 1e-4, 2e-2)
        golden = torch_linear_betas(1000, 1e-4, 2e-2)
        np.testing.assert_allclose(ours, golden, rtol=0, atol=1e-12)
        # NOT a plain linspace
        assert not np.allclose(ours, np.linspace(1e-4, 2e-2, 1000))

    def test_cosine(self):
        T, s = 1000, 8e-3
        ours = make_beta_schedule("cosine", T, cosine_s=s)
        t = torch.arange(T + 1, dtype=torch.float64) / T + s
        alphas = torch.cos(t / (1 + s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        golden = np.clip((1 - alphas[1:] / alphas[:-1]).numpy(), 0, 0.999)
        np.testing.assert_allclose(ours, golden, atol=1e-12)

    def test_sqrt_linear_and_sqrt(self):
        np.testing.assert_allclose(
            make_beta_schedule("sqrt_linear", 100, 1e-4, 2e-2),
            np.linspace(1e-4, 2e-2, 100),
        )
        np.testing.assert_allclose(
            make_beta_schedule("sqrt", 100, 1e-4, 2e-2),
            np.linspace(1e-4, 2e-2, 100) ** 0.5,
        )

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            make_beta_schedule("nope", 10)


class TestDDIMParams:
    def test_timesteps_have_plus_one_offset(self):
        # reference util.py:57: steps_out = ddim_timesteps + 1
        ts = make_ddim_timesteps("uniform", 50, 1000)
        assert ts[0] == 1
        assert len(ts) == 50
        assert ts[-1] == 1 + 980

    def test_quad(self):
        ts = make_ddim_timesteps("quad", 10, 1000)
        golden = ((np.linspace(0, np.sqrt(1000 * 0.8), 10)) ** 2).astype(int) + 1
        np.testing.assert_array_equal(ts, golden)

    def test_sigmas_eq16(self):
        sched = DiffusionSchedule.create("linear", 1000)
        ab = np.asarray(sched.alphas_cumprod, dtype=np.float64)
        ts = make_ddim_timesteps("uniform", 50, 1000)
        sig, al, al_prev = make_ddim_sampling_parameters(ab, ts, eta=1.0)
        assert al_prev[0] == ab[0]
        golden = 1.0 * np.sqrt((1 - al_prev) / (1 - al) * (1 - al / al_prev))
        np.testing.assert_allclose(sig, golden)
        # eta=0 → deterministic
        sig0, _, _ = make_ddim_sampling_parameters(ab, ts, eta=0.0)
        assert np.all(sig0 == 0)


class TestScheduleTables:
    @pytest.fixture(scope="class")
    def sched(self):
        return DiffusionSchedule.create("linear", 1000, 1e-4, 2e-2)

    def test_shapes_and_ranges(self, sched):
        for name in [
            "betas", "alphas_cumprod", "alphas_cumprod_prev",
            "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
            "posterior_variance", "posterior_mean_coef1",
            "posterior_mean_coef2", "lvlb_weights",
        ]:
            arr = getattr(sched, name)
            assert arr.shape == (1000,), name
            assert np.all(np.isfinite(np.asarray(arr))), name

    def test_cumprod_identities(self, sched):
        betas = np.asarray(sched.betas, dtype=np.float64)
        ab = np.cumprod(1 - betas)
        np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), ab, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(sched.alphas_cumprod_prev)[1:],
            np.asarray(sched.alphas_cumprod)[:-1],
        )
        assert np.asarray(sched.alphas_cumprod_prev)[0] == 1.0

    def test_posterior_coef_sum_at_x0_equals_identity(self, sched):
        # with x_start == x_t == x, posterior mean must equal x at every t
        # (coef1 + coef2 ≈ 1 only holds approximately; use the q_posterior fn)
        x = jnp.ones((4, 2, 2, 1))
        t = jnp.array([0, 10, 500, 999])
        mean, var, log_var = q_posterior(sched, x, x, t)
        c1 = np.asarray(sched.posterior_mean_coef1)[np.asarray(t)]
        c2 = np.asarray(sched.posterior_mean_coef2)[np.asarray(t)]
        np.testing.assert_allclose(
            np.asarray(mean)[:, 0, 0, 0], c1 + c2, rtol=1e-6
        )
        np.testing.assert_allclose(np.asarray(var)[:, 0, 0, 0],
                                   np.asarray(sched.posterior_variance)[np.asarray(t)])

    def test_lvlb_weight_zero_clamped(self, sched):
        w = np.asarray(sched.lvlb_weights)
        assert w[0] == w[1]
        assert np.all(np.isfinite(w))

    def test_q_sample_coefficients(self, sched):
        x0 = jnp.full((2, 2, 2, 1), 0.5)
        noise = jnp.full((2, 2, 2, 1), -1.0)
        t = jnp.array([0, 999])
        xt = q_sample(sched, x0, t, noise)
        sa = np.asarray(sched.sqrt_alphas_cumprod)[[0, 999]]
        so = np.asarray(sched.sqrt_one_minus_alphas_cumprod)[[0, 999]]
        np.testing.assert_allclose(
            np.asarray(xt)[:, 0, 0, 0], sa * 0.5 + so * -1.0, rtol=1e-6
        )

    def test_extract_broadcast(self, sched):
        t = jnp.array([1, 2, 3])
        out = extract(sched.betas, t, 4)
        assert out.shape == (3, 1, 1, 1)

    def test_sigma_roundtrip(self, sched):
        t = jnp.array([3, 100, 700])
        sig = sched.time_to_sigma(t)
        t2 = sched.sigma_to_time_int(sig)
        np.testing.assert_array_equal(np.asarray(t2), np.asarray(t))


class TestClipX0:
    def test_static_clip(self):
        x = jnp.array([[-3.0, 0.5, 2.0]])
        out = clip_x0(x, clip_denoised=True, dtp=1.0)
        np.testing.assert_allclose(np.asarray(out), [[-1.0, 0.5, 1.0]])

    def test_no_clip(self):
        x = jnp.array([[-3.0, 0.5, 2.0]])
        out = clip_x0(x, clip_denoised=False, dtp=1.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x))

    def test_dynamic_threshold_matches_torch(self):
        # golden: imagen DTP as in diffusion_utils/util.py:70-82
        rng = np.random.RandomState(0)
        x_np = rng.randn(4, 3, 8, 8).astype(np.float32) * 2.0
        dtp = 0.9
        xt = torch.tensor(x_np)
        s = torch.quantile(xt.reshape(4, -1).abs(), dtp, dim=-1)
        s.clamp_(min=1.0)
        s = s.reshape(4, 1, 1, 1)
        golden = (xt.clamp(-s, s) / s).numpy()
        ours = clip_x0(jnp.asarray(x_np), clip_denoised=True, dtp=dtp)
        np.testing.assert_allclose(np.asarray(ours), golden, rtol=1e-4, atol=1e-5)

    def test_dtp_noop_below_one(self):
        # s clamps to min 1.0 ⇒ values inside [-1,1] pass through
        x = jnp.array([[0.5, -0.25, 0.1, 0.9]])
        out = clip_x0(x, clip_denoised=True, dtp=0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)
