"""The diffusion-process object: loss + sampler registry + loop dispatch.

TPU-native rewrite of `diffusion/ddpm.py:23-126 LatentDiffusion` (which,
despite the name, operates in pixel space).  The reference wires a torch
module's bound methods in as `denoise_fn` / `denoise_sample_fn`
(`lightning_module.py:72-74`); here the process object is stateless w.r.t.
parameters — the trainer passes (pure) denoise closures in, so every entry
point can live inside `jax.jit` / `shard_map`.

Sampler registry parity (`ddpm.py:28-34`): {native, ddim, plms, pndm, tero}.
"""

from __future__ import annotations

from typing import Any, Callable

import jax

from .losses import p_losses
from .samplers.ddim import ddim_sample, plms_sample
from .samplers.ddpm import ancestral_sample
from .samplers.edm import edm_sample
from .samplers.pndm import pndm_sample
from .schedule import DiffusionSchedule, unnormalize_to_zero_to_255

__all__ = ["GaussianDiffusion", "SAMPLER_REGISTRY"]

# "vdm" / "ddim_continuous" extend the reference registry (ddpm.py:28-34):
# the reference ships those samplers unregistered (continuous_vdm.py,
# continous_ddim.py); here they are wired in and usable
SAMPLER_REGISTRY = ("native", "ddim", "plms", "pndm", "tero",
                    "vdm", "ddim_continuous")


class GaussianDiffusion:
    """Pixel-space DDPM process with a pluggable sampler registry."""

    def __init__(
        self,
        beta_schedule: str = "linear",
        num_timesteps: int = 1000,
        linear_start: float = 1e-4,
        linear_end: float = 2e-2,
        cosine_s: float = 8e-3,
        v_posterior: float = 0.0,
        parameterization: str = "eps",
        loss_type: str = "l2",
        **_unused: Any,
    ):
        self.schedule = DiffusionSchedule.create(
            beta_schedule=beta_schedule,
            num_timesteps=num_timesteps,
            linear_start=linear_start,
            linear_end=linear_end,
            cosine_s=cosine_s,
            v_posterior=v_posterior,
            parameterization=parameterization,
        )
        self.loss_type = loss_type
        self.num_timesteps = num_timesteps
        self.linear_start = linear_start
        self.linear_end = linear_end
        self.beta_schedule = beta_schedule

    # ------------------------------------------------------------------
    # training loss (parity: diffusion/ddpm.py:45-87)
    # ------------------------------------------------------------------
    def loss(
        self,
        denoise_fn: Callable[..., jax.Array],
        rng: jax.Array,
        x_start: jax.Array,
        cond_kwargs: dict[str, Any] | None = None,
        cond_drop_prob: float = 0.0,
    ) -> tuple[jax.Array, dict[str, jax.Array]]:
        return p_losses(
            self.schedule,
            denoise_fn,
            rng,
            x_start,
            cond_kwargs=cond_kwargs,
            cond_drop_prob=cond_drop_prob,
            loss_type=self.loss_type,
        )

    # ------------------------------------------------------------------
    # sampling dispatch (parity: diffusion/ddpm.py:108-122 p_sample_loop)
    # ------------------------------------------------------------------
    def sample(
        self,
        sampling_method: str,
        denoise_fn: Callable[..., jax.Array],
        rng: jax.Array,
        shape: tuple[int, ...],
        *,
        num_steps: int | None = None,
        ddim_eta: float = 0.0,
        clip_denoised: bool = True,
        dtp: float = 1.0,
        temperature: float = 1.0,
        noise_dropout: float = 0.0,
        log_num_per_prog: int = 10,
        x_T: jax.Array | None = None,
        return_uint8: bool = True,
    ) -> tuple[jax.Array, dict[str, jax.Array]]:
        """Run the chosen sampler; by default un-normalize to uint8 [0,255]
        like the reference (`ddpm.py:119-121`).

        ``denoise_fn(x, t) -> eps`` must already have conditioning + guidance
        baked in (build it with `guidance.make_guided_denoiser` + partials).
        """
        from ..utils.fast_rng import fast_rng_key

        # hardware-RNG key: the scan-based samplers split a key EVERY step
        # (×250 for a DDIM-250 run), and threefry splits lower to rolled
        # scalar while-loops on TPU (~ms each) — see utils.fast_rng
        rng = fast_rng_key(rng)
        common = dict(log_num_per_prog=log_num_per_prog, x_T=x_T)
        if sampling_method == "native":
            img, inter = ancestral_sample(
                self.schedule, denoise_fn, rng, shape,
                clip_denoised=clip_denoised, dtp=dtp, temperature=temperature,
                **common,
            )
        elif sampling_method == "ddim":
            img, inter = ddim_sample(
                self.schedule, denoise_fn, rng, shape,
                num_steps=num_steps or 50, eta=ddim_eta,
                clip_denoised=clip_denoised, dtp=dtp, temperature=temperature,
                noise_dropout=noise_dropout, **common,
            )
        elif sampling_method == "plms":
            img, inter = plms_sample(
                self.schedule, denoise_fn, rng, shape,
                num_steps=num_steps or 50,
                clip_denoised=clip_denoised, dtp=dtp, temperature=temperature,
                noise_dropout=noise_dropout, **common,
            )
        elif sampling_method == "pndm":
            img, inter = pndm_sample(
                self.num_timesteps, self.linear_start, self.linear_end,
                self.beta_schedule, denoise_fn, rng, shape,
                num_steps=num_steps or 50, **common,
            )
        elif sampling_method == "tero":
            img, inter = edm_sample(
                denoise_fn, rng, shape, num_steps=num_steps or 50, **common,
            )
        elif sampling_method == "vdm":
            from .samplers.continuous import get_log_snr_fn, vdm_sample

            # closed-form log-SNR exists only for the plain-linspace betas
            # ('sqrt_linear' here; beta_linear_log_snr is THAT schedule's
            # continuous form — NOT the LDM sqrt-space 'linear') and the
            # cosine schedule.  Fail like an unknown sampling_method does:
            # silently substituting a mismatched log-SNR would denoise at
            # systematically wrong alpha/sigma every step.
            ls_names = {"sqrt_linear": "linear", "cosine": "cosine"}
            if self.beta_schedule not in ls_names:
                raise ValueError(
                    f"continuous sampler 'vdm' has no closed-form log-SNR "
                    f"for beta_schedule={self.beta_schedule!r} (supported: "
                    f"sqrt_linear, cosine)")
            # continuous-time ancestral sampler; the denoiser is called
            # with per-sample LOG-SNR as its time input (continuous_vdm.py)
            img, inter = vdm_sample(
                get_log_snr_fn(ls_names[self.beta_schedule]),
                denoise_fn, rng, shape, num_steps=num_steps or 250,
                clip_denoised=clip_denoised, **common,
            )
        elif sampling_method == "ddim_continuous":
            from .samplers.continuous import (
                ddim_continuous_sample,
                get_log_snr_fn,
            )

            ls_names = {"sqrt_linear": "linear", "cosine": "cosine"}
            if self.beta_schedule not in ls_names:
                raise ValueError(
                    f"continuous sampler 'ddim_continuous' has no "
                    f"closed-form log-SNR for beta_schedule="
                    f"{self.beta_schedule!r} (supported: sqrt_linear, "
                    f"cosine)")
            ls_fn = get_log_snr_fn(ls_names[self.beta_schedule])
            img, inter = ddim_continuous_sample(
                lambda t: jax.nn.sigmoid(ls_fn(t)),
                denoise_fn, rng, shape,
                num_ddpm_timesteps=self.num_timesteps,
                num_steps=num_steps or 50, eta=ddim_eta,
                clip_denoised=clip_denoised, dtp=dtp,
                temperature=temperature, noise_dropout=noise_dropout,
                **common,
            )
        else:
            raise KeyError(
                f"unknown sampling_method '{sampling_method}'; "
                f"registry: {SAMPLER_REGISTRY}"
            )

        if return_uint8:
            img = unnormalize_to_zero_to_255(img)
            inter = dict(inter)
            inter["pred_x0"] = unnormalize_to_zero_to_255(inter["pred_x0"])
        return img, inter
