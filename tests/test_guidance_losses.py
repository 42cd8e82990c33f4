"""Tests for classifier-free guidance fusion and the DDPM loss.

Reference semantics: `openaimodel.py:853-902` (guidance), `diffusion/ddpm.py:
45-107` (loss).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from sgdm_tpu.diffusion import (
    DiffusionSchedule,
    guided_score,
    make_guided_denoiser,
    p_losses,
    pointwise_loss,
    prob_mask_like,
)


class TestGuidedScore:
    def test_imagen_formula(self):
        z, zc = jnp.array([1.0]), jnp.array([3.0])
        out = guided_score(z, zc, 2.0, "imagen")
        # (1-w) z + w zc = -1 + 6 = 5
        np.testing.assert_allclose(np.asarray(out), [5.0])

    def test_cfg_formula(self):
        z, zc = jnp.array([1.0]), jnp.array([3.0])
        out = guided_score(z, zc, 2.0, "cfg")
        # (1+w) zc - w z = 9 - 2 = 7
        np.testing.assert_allclose(np.asarray(out), [7.0])

    def test_degenerate_weights(self):
        z = jnp.array([1.0, 2.0])
        zc = jnp.array([5.0, 6.0])
        # imagen: w=1 → conditional, w=0 → unconditional
        np.testing.assert_allclose(
            np.asarray(guided_score(z, zc, 1.0, "imagen")), np.asarray(zc)
        )
        np.testing.assert_allclose(
            np.asarray(guided_score(z, zc, 0.0, "imagen")), np.asarray(z)
        )
        # cfg: w=0 → conditional (note: the reference's cond_scale==0 fast
        # path returns the UNconditional pass regardless of scale_type — an
        # imagen-semantics shortcut we reproduce in make_guided_denoiser)
        np.testing.assert_allclose(
            np.asarray(guided_score(z, zc, 0.0, "cfg")), np.asarray(zc)
        )

    def test_per_sample_weights(self):
        z = jnp.zeros((3, 2, 2, 1))
        zc = jnp.ones((3, 2, 2, 1))
        w = jnp.array([0.0, 1.0, 2.0])
        out = guided_score(z, zc, w, "imagen")
        np.testing.assert_allclose(np.asarray(out)[:, 0, 0, 0], [0.0, 1.0, 2.0])


class TestGuidedDenoiser:
    def _apply_fn(self, x, t, cond_drop_mask=None, cond=None):
        # a fake denoiser whose output depends on whether cond is dropped:
        # conditional → x + cond_value; unconditional → x
        add = jnp.where(cond_drop_mask.reshape(-1, 1, 1, 1), 0.0, 1.0)
        return x + add * cond.reshape(-1, 1, 1, 1)

    def test_fused_double_matches_manual(self):
        denoiser = make_guided_denoiser(self._apply_fn, scale_type="imagen")
        x = jnp.ones((2, 4, 4, 1))
        t = jnp.zeros((2,), dtype=jnp.int32)
        cond = jnp.array([2.0, 3.0])
        w = 2.0
        out = denoiser(x, t, cond_scale=w, cond=cond)
        eps_zc = x + cond.reshape(-1, 1, 1, 1)
        eps_z = x
        golden = (1 - w) * eps_z + w * eps_zc
        np.testing.assert_allclose(np.asarray(out), np.asarray(golden))

    def test_scale_one_single_pass(self):
        denoiser = make_guided_denoiser(self._apply_fn)
        x = jnp.ones((2, 4, 4, 1))
        t = jnp.zeros((2,), dtype=jnp.int32)
        cond = jnp.array([2.0, 3.0])
        out = denoiser(x, t, cond_scale=1, cond=cond)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(x + cond.reshape(-1, 1, 1, 1))
        )

    def test_scale_zero_unconditional(self):
        denoiser = make_guided_denoiser(self._apply_fn)
        x = jnp.ones((2, 4, 4, 1))
        t = jnp.zeros((2,), dtype=jnp.int32)
        cond = jnp.array([2.0, 3.0])
        out = denoiser(x, t, cond_scale=0, cond=cond)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x))

    def test_jittable(self):
        denoiser = make_guided_denoiser(self._apply_fn)
        f = jax.jit(lambda x, t, c: denoiser(x, t, cond_scale=2.0, cond=c))
        x = jnp.ones((2, 4, 4, 1))
        out = f(x, jnp.zeros((2,), dtype=jnp.int32), jnp.array([2.0, 3.0]))
        assert out.shape == x.shape


class TestProbMask:
    def test_extremes(self):
        key = jax.random.PRNGKey(0)
        assert not np.any(np.asarray(prob_mask_like(key, 64, 0.0)))
        assert np.all(np.asarray(prob_mask_like(key, 64, 1.0)))

    def test_rate(self):
        key = jax.random.PRNGKey(1)
        m = prob_mask_like(key, 20000, 0.1)
        assert abs(float(jnp.mean(m)) - 0.1) < 0.02


class TestLoss:
    def test_huber_matches_torch_smooth_l1(self):
        rng = np.random.RandomState(0)
        a = rng.randn(64).astype(np.float32) * 3
        b = rng.randn(64).astype(np.float32)
        golden = torch.nn.functional.smooth_l1_loss(
            torch.tensor(a), torch.tensor(b), reduction="none"
        ).numpy()
        ours = pointwise_loss(jnp.asarray(a), jnp.asarray(b), "huber")
        np.testing.assert_allclose(np.asarray(ours), golden, rtol=1e-5, atol=1e-6)

    def test_perfect_eps_model_zero_loss(self):
        sched = DiffusionSchedule.create("linear", 100)
        # a denoiser that by construction can't be right for all noise...
        # instead check: if the "model" returns the exact noise the loss sees
        # (impossible in practice), loss is 0 — we emulate by intercepting
        # q_sample: x_t = sa*x0 + so*eps ⇒ eps = (x_t - sa*x0)/so.
        x0 = jnp.zeros((8, 4, 4, 1))

        def perfect(x_t, t, cond_drop_mask=None):
            so = sched.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1)
            return x_t / so  # with x0=0: x_t = so * eps

        loss, aux = p_losses(
            sched, perfect, jax.random.PRNGKey(0), x0, loss_type="l2"
        )
        assert float(loss) < 1e-9
        assert aux["epoch_stats_x"].shape == (8,)
        assert aux["epoch_stats_y"].shape == (8,)

    def test_loss_positive_for_bad_model(self):
        sched = DiffusionSchedule.create("linear", 100)
        bad = lambda x_t, t, cond_drop_mask=None: jnp.zeros_like(x_t)
        x0 = jnp.ones((8, 4, 4, 1))
        loss, _ = p_losses(sched, bad, jax.random.PRNGKey(0), x0, loss_type="l2")
        assert float(loss) > 0.5  # E[eps^2] = 1

    def test_cond_drop_mask_passed(self):
        sched = DiffusionSchedule.create("linear", 100)
        seen = {}

        def spy(x_t, t, cond_drop_mask=None):
            seen["mask"] = cond_drop_mask
            return jnp.zeros_like(x_t)

        p_losses(
            sched, spy, jax.random.PRNGKey(0), jnp.zeros((16, 2, 2, 1)),
            cond_drop_prob=1.0,
        )
        assert np.all(np.asarray(seen["mask"]))
