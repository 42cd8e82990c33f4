"""Standalone generation CLI (`sgdm_tpu.generate`): restore a run's
checkpoint from its config.yaml + ckpts/meta.json and sample PNGs — the
serving surface outside the FID harness."""

import numpy as np
from PIL import Image

from sgdm_tpu.generate import generate
from tests.test_trainer_resume import make_dm, make_trainer


def test_generate_from_run_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("SGDM_FORCE_CPU", "1")
    run = tmp_path / "run"
    trainer = make_trainer(run)  # label-conditioned, cond_dim=4
    trainer.fit(make_dm(), max_epochs=1)

    out = tmp_path / "samples"
    paths = generate(run, n=3, batch_size=2, ckpt="last", sampler="ddim",
                     steps=2, labels=[1, 3], image_size=8, seed=0,
                     out_dir=out)
    assert len(paths) == 3
    # labels cycle 1,3,1 and are embedded in the filenames
    names = sorted(p.name for p in paths)
    assert names == ["000000_c1.png", "000001_c3.png", "000002_c1.png"]
    img = np.asarray(Image.open(paths[0]))
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8

    # out-of-range label is loud
    import pytest

    with pytest.raises(ValueError, match="labels"):
        generate(run, n=1, steps=2, labels=[99], image_size=8,
                 out_dir=tmp_path / "s2")
