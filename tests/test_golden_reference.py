"""Golden parity tests against the reference's ACTUAL torch code.

These import the reference modules (`/root/reference`, read-only) directly —
`dynamic/diffusionmodules/util.py`, `diffusion/sampler/ddpm_sampler.py`,
`diffusion/sampler/ddim_plms_sampler.py` — with tiny stub modules standing in
for deps absent from this image (loguru / wandb / pytorch_lightning /
torchvision), and assert bit-level (or fp32-accumulation-level) agreement
with the sgdm_tpu implementations:

  * beta schedule tables (linear sqrt-space + cosine) — exact in float64
  * every Schedule_DDPM registered buffer vs DiffusionSchedule fields
  * make_ddim_timesteps (+1 offset) / eq.16 sigma derivation
  * q_sample / q_posterior / predict_start_from_noise algebra
  * sinusoidal timestep embedding
  * full DDIM(eta=0) and PLMS trajectories on a shared analytic denoiser,
    both with plain x0 clipping and with Imagen dynamic thresholding
  * CFG combine rules (imagen / cfg scale_type)

This converts "parity by code reading" into "parity by assertion"
(SURVEY.md §4's promised golden tests).
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_ROOT = "/root/reference"


# ----------------------------------------------------------------------
# reference import machinery
# ----------------------------------------------------------------------

def _stub_module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


class _NoopLogger:
    def __getattr__(self, _name):
        return lambda *a, **k: None


@pytest.fixture(scope="module")
def ref():
    """Import the reference torch modules with dependency shims installed."""
    import os

    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference repo not mounted")

    shims = {
        "loguru": _stub_module("loguru", logger=_NoopLogger()),
        "pytorch_lightning": _stub_module("pytorch_lightning"),
        "wandb": _stub_module("wandb"),
        # ddpm_sampler imports two wandb vis helpers at module scope
        "diffusion_utils.taokit.wandb_utils": _stub_module(
            "diffusion_utils.taokit.wandb_utils",
            vis_schedule_ddpm=lambda **k: {},
            vis_timestep_loss=lambda *a, **k: {},
        ),
        # ddim_plms_sampler imports papervis + exp-toggle helpers (which pull
        # torchvision/seaborn); it only needs these three symbols
        "eval.papervis_utils": _stub_module(
            "eval.papervis_utils",
            batch_to_conditioninterp_papervis=lambda *a, **k: None,
        ),
        "eval.test_exps.common_stuff": _stub_module(
            "eval.test_exps.common_stuff",
            should_exp=lambda exp, s: bool(getattr(exp, s, False)),
            should_vis=lambda vis, s: bool(getattr(vis, s, False)),
        ),
    }

    inserted = {}
    for name, mod in shims.items():
        if name not in sys.modules:
            inserted[name] = mod
            sys.modules[name] = mod
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)

    try:
        from dynamic.diffusionmodules import util as ref_util
        from diffusion.sampler import ddpm_sampler as ref_ddpm
        from diffusion.sampler import ddim_plms_sampler as ref_ddim
        from diffusion_utils import util as ref_diffutil
    finally:
        # the imported reference modules keep references to the stubs in
        # their own globals; remove the stubs from sys.modules so the rest
        # of the suite still sees wandb/loguru as not-installed
        for name in inserted:
            sys.modules.pop(name, None)

    return types.SimpleNamespace(
        util=ref_util, ddpm=ref_ddpm, ddim=ref_ddim, diffutil=ref_diffutil
    )


def _ref_schedule(ref, **over):
    kw = dict(
        given_betas=None,
        beta_schedule="linear",
        num_timesteps=1000,
        linear_start=1e-4,
        linear_end=2e-2,
        cosine_s=8e-3,
        device="cpu",
        v_posterior=0.0,
        parameterization="eps",
    )
    kw.update(over)
    return ref.ddpm.Schedule_DDPM(**kw)


def _our_schedule(**over):
    from sgdm_tpu.diffusion.schedule import DiffusionSchedule

    kw = dict(beta_schedule="linear", num_timesteps=1000,
              linear_start=1e-4, linear_end=2e-2)
    kw.update(over)
    return DiffusionSchedule.create(**kw)


# ----------------------------------------------------------------------
# schedule tables
# ----------------------------------------------------------------------

@pytest.mark.parametrize("schedule", ["linear", "cosine", "sqrt_linear", "sqrt"])
def test_beta_schedule_tables_bitmatch(ref, schedule):
    from sgdm_tpu.diffusion.schedule import make_beta_schedule

    ref_betas = ref.util.make_beta_schedule(schedule, 1000).numpy() \
        if torch.is_tensor(ref.util.make_beta_schedule(schedule, 1000)) \
        else np.asarray(ref.util.make_beta_schedule(schedule, 1000))
    ours = make_beta_schedule(schedule, 1000)
    # torch.linspace and np.linspace differ by float64 ULPs
    np.testing.assert_allclose(ours, ref_betas, rtol=1e-12, atol=0)


BUFFER_PAIRS = [
    ("betas", "betas"),
    ("alphas_cumprod", "alphas_cumprod"),
    ("alphas_cumprod_prev", "alphas_cumprod_prev"),
    ("sqrt_alphas_cumprod", "sqrt_alphas_cumprod"),
    ("sqrt_one_minus_alphas_cumprod", "sqrt_one_minus_alphas_cumprod"),
    ("log_one_minus_alphas_cumprod", "log_one_minus_alphas_cumprod"),
    ("sqrt_recip_alphas_cumprod", "sqrt_recip_alphas_cumprod"),
    ("sqrt_recipm1_alphas_cumprod", "sqrt_recipm1_alphas_cumprod"),
    ("posterior_variance", "posterior_variance"),
    ("posterior_log_variance_clipped", "posterior_log_variance_clipped"),
    ("posterior_mean_coef1", "posterior_mean_coef1"),
    ("posterior_mean_coef2", "posterior_mean_coef2"),
]


def test_schedule_ddpm_buffers_match(ref):
    rs = _ref_schedule(ref)
    ours = _our_schedule()
    for ref_name, our_name in BUFFER_PAIRS:
        a = getattr(rs, ref_name).numpy()
        b = np.asarray(getattr(ours, our_name))
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-7, err_msg=ref_name)
    # lvlb: the reference computes it from fp32 buffers (betas²/(2·var·α·(1-ᾱ))
    # in fp32, ddpm_sampler.py:87-89) while ours is float64-then-cast — agree
    # only to fp32 error propagation through the division chain
    np.testing.assert_allclose(
        np.asarray(ours.lvlb_weights), rs.lvlb_weights.numpy(),
        rtol=2e-4, atol=0, err_msg="lvlb_weights",
    )


def test_schedule_ddpm_buffers_match_cosine(ref):
    rs = _ref_schedule(ref, beta_schedule="cosine")
    ours = _our_schedule(beta_schedule="cosine")
    for ref_name, our_name in BUFFER_PAIRS:
        a = getattr(rs, ref_name).numpy()
        b = np.asarray(getattr(ours, our_name))
        np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-7, err_msg=ref_name)


def test_ddim_timesteps_and_parameters(ref):
    from sgdm_tpu.diffusion.schedule import (
        make_ddim_sampling_parameters,
        make_ddim_timesteps,
    )

    for S in (10, 25, 50, 250):
        ref_ts = ref.util.make_ddim_timesteps("uniform", S, 1000, verbose=False)
        our_ts = make_ddim_timesteps("uniform", S, 1000)
        np.testing.assert_array_equal(our_ts, ref_ts)

        alphacums = torch.from_numpy(
            np.asarray(_our_schedule().alphas_cumprod, dtype=np.float64)
        )
        for eta in (0.0, 1.0):
            r_sig, r_a, r_ap = ref.util.make_ddim_sampling_parameters(
                alphacums=alphacums, ddim_timesteps=ref_ts, eta=eta, verbose=False
            )
            o_sig, o_a, o_ap = make_ddim_sampling_parameters(
                np.asarray(alphacums), our_ts, eta
            )
            np.testing.assert_allclose(o_a, np.asarray(r_a), rtol=0, atol=0)
            np.testing.assert_allclose(o_ap, np.asarray(r_ap), rtol=0, atol=0)
            np.testing.assert_allclose(o_sig, np.asarray(r_sig), rtol=0, atol=1e-12)


def test_quad_ddim_timesteps(ref):
    from sgdm_tpu.diffusion.schedule import make_ddim_timesteps

    ref_ts = ref.util.make_ddim_timesteps("quad", 25, 1000, verbose=False)
    np.testing.assert_array_equal(make_ddim_timesteps("quad", 25, 1000), ref_ts)


# ----------------------------------------------------------------------
# q_sample / posterior algebra
# ----------------------------------------------------------------------

def test_q_sample_and_posterior_match(ref):
    import jax.numpy as jnp

    from sgdm_tpu.diffusion import schedule as S

    rs = _ref_schedule(ref)
    ours = _our_schedule()
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((4, 3, 8, 8)).astype(np.float32)
    noise = rng.standard_normal((4, 3, 8, 8)).astype(np.float32)
    t = np.array([0, 13, 500, 999], dtype=np.int64)

    ref_xt = rs.q_sample(torch.from_numpy(x0), torch.from_numpy(noise),
                         torch.from_numpy(t)).numpy()
    our_xt = np.asarray(
        S.q_sample(ours, jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise))
    )
    np.testing.assert_allclose(our_xt, ref_xt, rtol=0, atol=1e-6)

    rm, rv, rlv = rs.q_posterior(torch.from_numpy(x0), torch.from_numpy(ref_xt),
                                 torch.from_numpy(t))
    om, ov, olv = S.q_posterior(ours, jnp.asarray(x0), jnp.asarray(ref_xt),
                                jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(om), rm.numpy(), rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ov).ravel(),
                               rv.numpy().reshape(4, -1)[:, 0], atol=1e-7)
    np.testing.assert_allclose(np.asarray(olv).ravel(),
                               rlv.numpy().reshape(4, -1)[:, 0], atol=1e-6)

    ref_x0 = rs.predict_start_from_noise(
        torch.from_numpy(ref_xt), torch.from_numpy(t), torch.from_numpy(noise)
    ).numpy()
    our_x0 = np.asarray(S.predict_start_from_noise(
        ours, jnp.asarray(ref_xt), jnp.asarray(t), jnp.asarray(noise)))
    np.testing.assert_allclose(our_x0, ref_x0, rtol=0, atol=1e-4)


def test_timestep_embedding_matches(ref):
    import jax.numpy as jnp

    from sgdm_tpu.models.layers import timestep_embedding

    t = np.array([0, 1, 17, 999], dtype=np.int64)
    for dim in (32, 128, 31):
        ref_emb = ref.util.timestep_embedding(torch.from_numpy(t), dim).numpy()
        our_emb = np.asarray(timestep_embedding(jnp.asarray(t), dim))
        # fp32 cos/sin argument reduction for args up to ~999 differs between
        # XLA and torch by ~|arg|·eps ≈ 1e-4 in the argument; judge both
        # against a float64 ground truth instead of each other
        half = dim // 2
        freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
        args = t[:, None].astype(np.float64) * freqs[None]
        gold = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
        if dim % 2:
            gold = np.concatenate([gold, np.zeros_like(gold[:, :1])], axis=-1)
        np.testing.assert_allclose(our_emb, gold, rtol=0, atol=2e-3)
        np.testing.assert_allclose(ref_emb, gold, rtol=0, atol=2e-3)
        # and exactly for small-argument rows (the regime training visits
        # most: arg <= t for the high-frequency half decays fast)
        np.testing.assert_allclose(our_emb[:2], ref_emb[:2], rtol=0, atol=1e-6)


def test_clip_x0_dtp_matches(ref):
    import jax.numpy as jnp

    from sgdm_tpu.diffusion.schedule import clip_x0

    rng = np.random.default_rng(3)
    x = (rng.standard_normal((4, 3, 8, 8)) * 2.5).astype(np.float32)
    for dtp, clip in ((1.0, True), (1.0, False), (0.995, True), (0.8, True)):
        ref_out = ref.diffutil.clip_x0_minus_one_to_one(
            torch.from_numpy(x.copy()), clip_denoised=clip, dtp=dtp
        ).numpy()
        our_out = np.asarray(clip_x0(jnp.asarray(x), clip_denoised=clip, dtp=dtp))
        np.testing.assert_allclose(our_out, ref_out, rtol=0, atol=2e-6,
                                   err_msg=f"dtp={dtp} clip={clip}")


# ----------------------------------------------------------------------
# full sampler trajectories on a shared analytic denoiser
# ----------------------------------------------------------------------

def _torch_denoiser(x, t, **_kw):
    return 0.5 * torch.tanh(x) + 0.1 * (t.float() / 1000.0).reshape(-1, 1, 1, 1)


def _jax_denoiser(x, t):
    import jax.numpy as jnp

    return 0.5 * jnp.tanh(x) + 0.1 * (t.astype(jnp.float32) / 1000.0).reshape(-1, 1, 1, 1)


def _run_ref_ddim(ref, rs, x_T, num_steps, dtp):
    sampler = ref.ddim.DDIMSampler(
        ddpm_num_timesteps=1000, device="cpu", sampler_type="ddim"
    )
    sampling_kwargs = {
        "num_timesteps": num_steps,
        "ddim_eta": 0.0,
        "alphas_cumprod": rs.alphas_cumprod,
        "betas": rs.betas,
        "alphas_cumprod_prev": rs.alphas_cumprod_prev,
        "clip_denoised": True,
        "dtp": dtp,
        "temperature": 1.0,
        "noise_dropout": 0.0,
    }
    sampler.make_schedule(sampling_kwargs=sampling_kwargs)
    timesteps = sampler.ddim_timesteps
    total = timesteps.shape[0]
    img = torch.from_numpy(x_T.copy())
    with torch.no_grad():
        for i, step in enumerate(np.flip(timesteps)):
            index = total - i - 1
            ts = torch.full((img.shape[0],), int(step), dtype=torch.long)
            img, _, _ = sampler.p_sample_ddim(
                img, ts, index=index, condition_kwargs=None,
                sampling_kwargs=sampling_kwargs,
                denoise_sample_fn=_torch_denoiser,
                denoise_sample_fn_kwargs={},
            )
    return img.numpy()


@pytest.mark.parametrize("dtp", [1.0, 0.995])
def test_ddim_trajectory_matches_reference(ref, dtp):
    import jax

    from sgdm_tpu.diffusion.samplers.ddim import ddim_sample

    rs = _ref_schedule(ref)
    ours = _our_schedule()
    num_steps = 25
    rng = np.random.default_rng(7)
    x_T = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)

    ref_img = _run_ref_ddim(ref, rs, x_T, num_steps, dtp)
    our_img, _ = ddim_sample(
        ours, _jax_denoiser, jax.random.PRNGKey(0), x_T.shape,
        num_steps=num_steps, eta=0.0, clip_denoised=True, dtp=dtp,
        x_T=x_T,
    )
    np.testing.assert_allclose(np.asarray(our_img), ref_img, rtol=0, atol=5e-5)


def test_plms_trajectory_matches_reference(ref):
    import jax

    from sgdm_tpu.diffusion.samplers.ddim import plms_sample

    rs = _ref_schedule(ref)
    ours = _our_schedule()
    num_steps = 20
    rng = np.random.default_rng(11)
    x_T = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)

    sampler = ref.ddim.DDIMSampler(
        ddpm_num_timesteps=1000, device="cpu", sampler_type="plms"
    )
    sampling_kwargs = {
        "num_timesteps": num_steps,
        "ddim_eta": 0.0,
        "alphas_cumprod": rs.alphas_cumprod,
        "betas": rs.betas,
        "alphas_cumprod_prev": rs.alphas_cumprod_prev,
        "clip_denoised": True,
        "dtp": 1.0,
        "temperature": 1.0,
        "noise_dropout": 0.0,
        "log_num_per_prog": 5,
    }
    sampler.make_schedule(sampling_kwargs=sampling_kwargs)
    # plms_sampling draws its own x_T from torch RNG; seed and pre-draw the
    # identical tensor so both sides start from the same noise
    torch.manual_seed(1234)
    expected_xT = torch.randn((2, 3, 8, 8))
    torch.manual_seed(1234)
    ref_img, _ = sampler.plms_sampling(
        (2, 3, 8, 8), sampling_kwargs=sampling_kwargs,
        denoise_sample_fn=_torch_denoiser, denoise_sample_fn_kwargs={},
        condition_kwargs=None,
    )
    x_T = expected_xT.numpy().astype(np.float32)

    our_img, _ = plms_sample(
        ours, _jax_denoiser, jax.random.PRNGKey(0), (2, 3, 8, 8),
        num_steps=num_steps, clip_denoised=True, dtp=1.0, x_T=x_T,
    )
    np.testing.assert_allclose(np.asarray(our_img), ref_img.numpy(),
                               rtol=0, atol=5e-5)


# ----------------------------------------------------------------------
# CFG combine rules (openaimodel.py:853-859 get_guided_score)
# ----------------------------------------------------------------------

def test_cfg_combine_rules_match(ref):
    """The combine is 3 lines in the reference; mirror them verbatim here
    (openaimodel.py:853-859) rather than constructing a full torch UNet."""
    import jax.numpy as jnp

    from sgdm_tpu.diffusion.guidance import guided_score

    rng = np.random.default_rng(5)
    eps_zc = rng.standard_normal((4, 3, 8, 8)).astype(np.float32)
    eps_z = rng.standard_normal((4, 3, 8, 8)).astype(np.float32)
    for w in (0.0, 1.0, 2.0, 7.5):
        imagen = (1 - w) * eps_z + w * eps_zc
        cfg = (1 + w) * eps_zc - w * eps_z
        ours_imagen = np.asarray(guided_score(
            jnp.asarray(eps_z), jnp.asarray(eps_zc), w, scale_type="imagen"))
        ours_cfg = np.asarray(guided_score(
            jnp.asarray(eps_z), jnp.asarray(eps_zc), w, scale_type="cfg"))
        np.testing.assert_allclose(ours_imagen, imagen, rtol=0, atol=1e-6)
        np.testing.assert_allclose(ours_cfg, cfg, rtol=0, atol=1e-6)
