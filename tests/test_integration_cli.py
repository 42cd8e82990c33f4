"""Full-stack CLI integration test (the reference's test_unittest.py role).

Runs `main.py` end-to-end on the synthetic dataset with a generated FID
reference dir: config compose → data → train → EMA → DDIM sampling → FID →
best-checkpoint → test experiment suite.  Slow (~5 min on CPU), so gated
behind SGDM_RUN_SLOW=1; the fast pyramid covers each layer separately.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SGDM_RUN_SLOW"),
    reason="slow integration test; set SGDM_RUN_SLOW=1",
)

REPO = Path(__file__).parent.parent


def test_cli_end_to_end(tmp_path):
    from sgdm_tpu.data.synthetic import SyntheticImages
    from sgdm_tpu.eval.harness import generate_fid_reference_dir

    fid_dir = tmp_path / "fidref"
    generate_fid_reference_dir(SyntheticImages(size=16, num_classes=4, length=48),
                               fid_dir, num=48)
    out_dir = tmp_path / "run"
    env = dict(os.environ, SGDM_FORCE_CPU="1")
    # conftest forces 8 virtual CPU devices for mesh tests; the debug run
    # uses bs=4, which must stay divisible by the mesh size
    env.pop("XLA_FLAGS", None)
    cmd = [
        sys.executable, "main.py",
        "data=synthetic32", "data.image_size=16",
        f"data.fid_train_image_dir={fid_dir}",
        "dynamic=unet_fast", "dynamic.params.model_channels=32",
        "sg.params.condition_method=label", "sg.params.cond_dim=4",
        "sg.params.cond_drop_prob=0.1", "sg.params.cond_scale=2",
        "data.params.train.params.num_classes=4",
        "data.params.validation.params.num_classes=4",
        "data.params.test.params.num_classes=4", "data.num_classes=4",
        "model.params.num_timesteps_test=10", "model.params.num_timesteps_val=5",
        "vis.condscale=1",  # exercise the condscale-sweep papervis path
        "debug=1", f"log_dir={out_dir}", "name=it",
    ]
    res = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                         text=True, timeout=1800)
    assert res.returncode == 0, res.stderr[-3000:]
    metrics = [json.loads(l) for l in (out_dir / "metrics.jsonl").read_text().splitlines()]
    keys = set().union(*[set(m) for m in metrics])
    assert "val/loss_ema" in keys
    assert "val/fid_for_ckpt" in keys
    assert (out_dir / "ckpts" / "last").exists()
    assert (out_dir / "test_results.json").exists()
    results = json.loads((out_dir / "test_results.json").read_text())
    assert any("clean_fid_raw" in k for k in results)
    # best-FID checkpoint with epoch+score filename exists
    assert any(p.name.startswith("epoch_") for p in (out_dir / "ckpts").iterdir())
    assert (out_dir / "papervis" / "condscale_sweep.png").exists()
