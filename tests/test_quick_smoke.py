"""Quick-tier smoke: the one sub-10s test that still EXECUTES the core loop.

The r5 duration profile moved every >10s integration test into the slow
tier (`pytest -m slow`); this file is the quick tier's replacement guard —
a single tiny-shape pass through the paths a broken commit is most likely
to break: train step (loss/EMA/step counter), guided DDIM sampling to
uint8, and the checkpoint save→restore roundtrip.  Shapes are minimal
(8px, ch16, T=10) so the whole file stays in single-digit seconds on the
1-CPU CI box; the full-fidelity versions of each assertion live in
tests/test_training.py / test_trainer_resume.py (slow tier).

Ref match: this is the tiered descendant of the reference's only test —
the flag-shrunk integration smoke `test_unittest.py:1-292` (SURVEY.md §4).
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from sgdm_tpu.diffusion import GaussianDiffusion
from sgdm_tpu.models import UNetModel
from sgdm_tpu.training.checkpoints import CheckpointManager
from sgdm_tpu.training.optim import create_optimizer
from sgdm_tpu.training.state import (
    create_train_state,
    make_sample_fn,
    make_train_step,
)


def test_train_sample_checkpoint_smoke():
    # minimal topology: XLA compile time is the cost floor on the 1-CPU CI
    # box (~15s for the standard tiny two-level net); a single-level,
    # attention-free trunk compiles in roughly half that while still
    # running the full train-step/CFG-sampling/checkpoint machinery
    model = UNetModel(
        model_channels=8, out_channels=1, num_res_blocks=1,
        channel_mult=(1,), attention_resolutions=(), num_heads=1,
        resblock_updown=False, cond_dim=4,
    )
    diffusion = GaussianDiffusion(num_timesteps=10)
    tx = create_optimizer("adamw", lr=2e-3, wd=0.0, scheduler=None)
    batch = {
        "image": jnp.full((4, 8, 8, 1), 0.5),
        "cond": jax.nn.one_hot(jnp.arange(4) % 4, 4),
    }
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), batch, {"cond": batch["cond"]}
    )
    p0 = jax.tree.map(lambda x: np.asarray(x), state.params)

    # one conditional train step: finite loss, counters tick, params move
    step = make_train_step(model, diffusion, tx, cond_drop_prob=0.25)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1 and int(state.ema_updates) == 1
    moved = max(
        jax.tree.leaves(jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - b).max()),
            state.params, p0))
    )
    assert moved > 0.0

    # guided DDIM sampling (CFG concat-double inside the scan) → uint8
    sample = make_sample_fn(
        model, diffusion, sampling_method="ddim", num_steps=2,
        cond_scale=2.0, pallas_inference=False,
    )
    imgs, _ = sample(state.ema_params, jax.random.PRNGKey(2),
                     4, 8, 1, cond=batch["cond"])
    imgs = np.asarray(jax.device_get(imgs))
    assert imgs.dtype == np.uint8 and imgs.shape == (4, 8, 8, 1)

    # checkpoint save → restore: bit-equal state
    with tempfile.TemporaryDirectory() as td:
        mgr = CheckpointManager(os.path.join(td, "ck"))
        mgr.save_last(state, epoch=0)
        template = create_train_state(
            model, tx, jax.random.PRNGKey(0), batch, {"cond": batch["cond"]}
        )
        restored = mgr.restore(template)
        for a, b in zip(
            jax.tree.leaves(jax.device_get((state.params, state.ema_params))),
            jax.tree.leaves(jax.device_get(
                (restored.params, restored.ema_params))),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(restored.step) == 1
