"""Trainer-level resume semantics (Lightning parity).

`trainer.fit(resume_from=...)` must CONTINUE toward `max_epochs` total from
the checkpointed epoch (derived from the restored optimizer step), not
re-run `max_epochs` more — so the per-epoch shuffle order, FID cadence and
epoch numbering line up with an uninterrupted run
(ref: main.py:126-133 → pl Trainer ckpt_path resume).
"""

import numpy as np

from sgdm_tpu.training.trainer import SelfGuidedDiffusionTrainer
import pytest

pytestmark = pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier


def make_trainer(tmp_path, seed=23):
    return SelfGuidedDiffusionTrainer(
        condition_method="label", cond_dim=4, cond_scale=2.0,
        cond_drop_prob=0.1,
        dynamic={
            "target": "sgdm_tpu.models.UNetModel",
            "params": dict(
                model_channels=16, out_channels=3, num_res_blocks=1,
                channel_mult=[1, 2], attention_resolutions=[2],
                num_heads=2, resblock_updown=True, cond_dim=4,
            ),
        },
        diffusion_model={
            "target": "sgdm_tpu.diffusion.GaussianDiffusion",
            "params": {"num_timesteps": 20},
        },
        optim={"name": "adamw", "params": {"lr": 1e-4},
               "scheduler_config": None},
        pl={"trainer": {"strategy": None}},
        compute_dtype="float32",
        log_dir=tmp_path,
        seed=seed,
    )


def make_dm():
    from sgdm_tpu.data.datamodule import DataModuleFromConfig

    ds = {
        "target": "sgdm_tpu.data.synthetic.SyntheticImages",
        "params": dict(size=8, num_classes=4, length=32, cond_key="label"),
    }
    return DataModuleFromConfig(batch_size=8, train=ds, num_workers=0)



def test_resume_continues_epochs(tmp_path, monkeypatch):
    monkeypatch.setenv("SGDM_FORCE_CPU", "1")
    spe = 32 // 8  # steps per epoch

    # uninterrupted 3-epoch run = the golden trajectory
    t_full = make_trainer(tmp_path / "full")
    s_full = t_full.fit(make_dm(), max_epochs=3)
    assert int(s_full.step) == 3 * spe

    # interrupted: 2 epochs, then resume toward the SAME max_epochs
    t_a = make_trainer(tmp_path / "a")
    s_a = t_a.fit(make_dm(), max_epochs=2)
    assert int(s_a.step) == 2 * spe
    last = t_a.ckpt.meta["last_path"]

    t_b = make_trainer(tmp_path / "b")
    s_b = t_b.fit(make_dm(), max_epochs=3, resume_from=last)
    # exactly ONE more epoch ran (not three)
    assert int(s_b.step) == 3 * spe

    # and the resumed run reproduces the uninterrupted trajectory exactly:
    # same epoch-2 shuffle order + same restored state ⇒ identical params
    import jax

    for pa, pb in zip(jax.tree.leaves(s_full.params),
                      jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-5, atol=1e-6)



def test_resume_at_max_epochs_trains_nothing(tmp_path, monkeypatch):
    monkeypatch.setenv("SGDM_FORCE_CPU", "1")
    spe = 32 // 8
    t_a = make_trainer(tmp_path / "a")
    s_a = t_a.fit(make_dm(), max_epochs=2)
    last = t_a.ckpt.meta["last_path"]

    t_b = make_trainer(tmp_path / "b")
    s_b = t_b.fit(make_dm(), max_epochs=2, resume_from=last)
    assert int(s_b.step) == int(s_a.step) == 2 * spe
