"""Gradient accumulation: k micro-batches must match the full-batch update
in expectation of the optimizer semantics (grads averaged)."""

import jax
import jax.numpy as jnp
import numpy as np

from sgdm_tpu.diffusion import GaussianDiffusion
from sgdm_tpu.models import UNetModel
from sgdm_tpu.training.optim import create_optimizer
from sgdm_tpu.training.state import create_train_state, make_train_step
import pytest

pytestmark = pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier


def setup(accum):
    model = UNetModel(
        model_channels=16, out_channels=1, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions=(2,), num_heads=2,
        resblock_updown=True,
    )
    diffusion = GaussianDiffusion(num_timesteps=50)
    tx = create_optimizer("adamw", lr=1e-3, scheduler=None)
    batch = {"image": jnp.zeros((8, 8, 8, 1))}
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch, batch)
    step = make_train_step(model, diffusion, tx,
                           accumulate_grad_batches=accum)
    return state, step


class TestGradAccum:
    def test_runs_and_counts(self):
        state, step = setup(accum=4)
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 1))
        state, metrics = step(state, {"image": x}, jax.random.PRNGKey(2))
        assert int(state.step) == 1
        assert np.isfinite(float(metrics["loss"]))
        assert metrics["epoch_stats_x"].shape == (8,)

    def test_batch_not_divisible_raises(self):
        state, step = setup(accum=3)
        x = jnp.zeros((8, 8, 8, 1))
        try:
            step(state, {"image": x}, jax.random.PRNGKey(0))
            raised = False
        except Exception:
            raised = True
        assert raised
