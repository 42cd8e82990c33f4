"""Golden tests: LR schedules vs the reference scheduler classes.

Loads `/root/reference/diffusion_utils/lr_scheduler.py` (read-only) directly
and compares our optax schedules step by step — LambdaLinearScheduler (:81),
LambdaWarmUpCosineScheduler (:4), LambdaWarmUpCosineScheduler2 (:36).
"""

from __future__ import annotations

import importlib.util
import os

import numpy as np
import pytest

REF = "/root/reference/diffusion_utils/lr_scheduler.py"


@pytest.fixture(scope="module")
def ref_mod():
    import sys
    import types

    if not os.path.exists(REF):
        pytest.skip("reference not mounted")
    # loguru is not installed in this image; the reference file only uses
    # `logger.warning` for verbosity printing — stub it for the import
    had_loguru = "loguru" in sys.modules
    if not had_loguru:
        stub = types.ModuleType("loguru")
        stub.logger = types.SimpleNamespace(warning=lambda *a, **k: None)
        sys.modules["loguru"] = stub
    try:
        spec = importlib.util.spec_from_file_location("ref_lr_scheduler", REF)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        if not had_loguru:
            sys.modules.pop("loguru", None)
    return mod


STEPS = np.concatenate([
    np.arange(0, 30), [499, 500, 501, 999, 1000, 1001],
    [4999, 5000, 5001, 9999, 10000, 10001, 20000, 50000],
])


def test_lambda_linear_matches_reference(ref_mod):
    from sgdm_tpu.training.optim import lambda_linear_schedule

    ref = ref_mod.LambdaLinearScheduler(
        warm_up_steps=[500], f_min=[1.0], f_max=[1.0], f_start=[1e-6],
        cycle_lengths=[10000000000000])
    ours = lambda_linear_schedule(1.0, warm_up_steps=500, f_start=1e-6,
                                  f_max=1.0, f_min=1.0, cycle_length=1e13)
    for n in STEPS:
        np.testing.assert_allclose(float(ours(int(n))), ref(int(n)),
                                   rtol=1e-6, err_msg=f"step {n}")


def test_warmup_cosine_matches_reference(ref_mod):
    from sgdm_tpu.training.optim import lambda_warmup_cosine_schedule

    ref = ref_mod.LambdaWarmUpCosineScheduler(
        warm_up_steps=500, lr_min=0.1, lr_max=1.0, lr_start=1e-3,
        max_decay_steps=10000)
    ours = lambda_warmup_cosine_schedule(
        1.0, warm_up_steps=500, lr_min=0.1, lr_max=1.0, lr_start=1e-3,
        max_decay_steps=10000)
    for n in STEPS:
        np.testing.assert_allclose(float(ours(int(n))), ref(int(n)),
                                   rtol=1e-5, err_msg=f"step {n}")


def test_warmup_cosine2_multicycle_matches_reference(ref_mod):
    from sgdm_tpu.training.optim import lambda_warmup_cosine_schedule2

    kw = dict(warm_up_steps=[100, 50, 10], f_min=[0.1, 0.05, 0.01],
              f_max=[1.0, 0.5, 0.25], f_start=[1e-4, 1e-4, 1e-4],
              cycle_lengths=[1000, 2000, 4000])
    ref = ref_mod.LambdaWarmUpCosineScheduler2(**kw)
    ours = lambda_warmup_cosine_schedule2(1.0, **kw)
    # include the exact cycle boundaries (reference: `n <= cum` keeps the
    # boundary step in the earlier cycle) and both sides of each
    for n in list(range(0, 120)) + [999, 1000, 1001, 2999, 3000, 3001,
                                    5000, 6999]:
        np.testing.assert_allclose(float(ours(int(n))), ref(int(n)),
                                   rtol=1e-5, err_msg=f"step {n}")


def test_create_optimizer_scheduler_name_selection():
    import jax.numpy as jnp
    import optax

    from sgdm_tpu.training.optim import create_optimizer

    tx = create_optimizer(
        "adamw", lr=1e-3,
        scheduler={"name": "lambda_warmup_cosine", "warm_up_steps": 10,
                   "lr_min": 0.1, "lr_max": 1.0, "lr_start": 1e-3,
                   "max_decay_steps": 100})
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones((3,))}, state, params)
    assert jnp.all(jnp.isfinite(updates["w"]))
    assert isinstance(tx, optax.GradientTransformation)
