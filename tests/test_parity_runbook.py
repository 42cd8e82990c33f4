"""Parity-day runbook tests (utils/parity_runbook.py, round-4 VERDICT #5).

The runbook's job is to turn "weights + data arrived" into "parity
proven"; in the zero-egress image every weight-gated stage must SKIP
cleanly, and the stages that can run on synthetic artifacts (cluster NMI
floor, the CLI plumbing) must produce real PASS/FAIL decisions."""

from __future__ import annotations

import argparse
import json

import h5py
import numpy as np
import pytest

from sgdm_tpu.utils import parity_runbook as rb


def _args(**kw):
    base = dict(stage="all", data_root="~/nonexistent",
                out_root="~/nonexistent", ds="in32p", feat="dino_vitb16",
                bs=8, image_size=32, k=5000, nmi_floor=0.50, feat_h5=None,
                dino_vitb16=None, dino_vits16=None, clip_weights=None,
                clip_bpe=None, inception_weights=None, fid_dir1=None,
                fid_dir2=None)
    base.update(kw)
    return argparse.Namespace(**base)


def test_all_stages_skip_without_artifacts(tmp_path, monkeypatch):
    for env in ("SGDM_DINO_VITB16", "SGDM_DINO_VITS16",
                "SGDM_CLIP_WEIGHTS", "SGDM_INCEPTION_WEIGHTS"):
        monkeypatch.delenv(env, raising=False)
    a = _args(out_root=str(tmp_path))
    results = []
    for s in rb.STAGES:
        results.extend(rb.run_stage(s, a))
    assert results, "no stages ran"
    assert all(r["status"] == "SKIPPED" for r in results), results


def _write_feat_h5(path, n=300, d=16, k_classes=3):
    """Separable features + labels in the feat-h5 contract."""
    rng = np.random.RandomState(0)
    labels = np.arange(n) % k_classes
    feats = (np.eye(k_classes)[labels] * 8).astype(np.float32)
    feats = np.concatenate(
        [feats, rng.randn(n, d - k_classes).astype(np.float32) * 0.1], 1)
    with h5py.File(path, "w") as f:
        f.create_dataset("train", data=feats)
        f.create_dataset("val", data=feats[:32])
        f.create_dataset("train_labels", data=labels)
        f.create_dataset("val_labels", data=labels[:32])
        ds = f.create_dataset("all_attributes", (1,))
        ds.attrs["dataset_name"] = "synth"
        ds.attrs["feat_from"] = "dino_vitb16"
        ds.attrs["feat_dim"] = d
        ds.attrs["is_grey"] = 0


def test_cluster_stage_pass_and_fail(tmp_path):
    feat = tmp_path / "feat.h5"
    _write_feat_h5(feat)
    # separable 3-class features, k=3 → NMI near 1 → PASS at floor 0.5
    a = _args(out_root=str(tmp_path), feat_h5=str(feat), k=3)
    (res,) = rb.run_stage("cluster", a)
    assert res["status"] == "PASS", res
    assert res["value"] > 0.9
    # an absurd floor flips the same measurement to FAIL
    a2 = _args(out_root=str(tmp_path), feat_h5=str(feat), k=3,
               nmi_floor=1.01)
    (res2,) = rb.run_stage("cluster", a2)
    assert res2["status"] == "FAIL"


def test_fid_stage_requires_real_inception(tmp_path):
    """With dirs present but only the random-fallback inception, the fid
    stage must refuse to bless anything (SKIPPED, not PASS)."""
    from PIL import Image

    for d in ("a", "b"):
        (tmp_path / d).mkdir()
        for i in range(3):
            Image.fromarray(
                np.full((16, 16, 3), 40 * i, np.uint8)
            ).save(tmp_path / d / f"img{i}.png")
    a = _args(fid_dir1=str(tmp_path / "a"), fid_dir2=str(tmp_path / "b"))
    (res,) = rb.run_stage("fid", a)
    assert res["status"] == "SKIPPED"
    assert "random-fallback" in res["detail"]


def test_main_json_summary(tmp_path, capsys, monkeypatch):
    for env in ("SGDM_DINO_VITB16", "SGDM_DINO_VITS16",
                "SGDM_CLIP_WEIGHTS", "SGDM_INCEPTION_WEIGHTS"):
        monkeypatch.delenv(env, raising=False)
    rb.main(["--stage", "inception"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec["failed"] == 0
    assert rec["parity_runbook"][0]["stage"] == "inception"


def test_main_exit_code_on_fail(tmp_path):
    feat = tmp_path / "feat.h5"
    _write_feat_h5(feat)
    with pytest.raises(SystemExit) as ei:
        rb.main(["--stage", "cluster", "--feat-h5", str(feat), "--k", "3",
                 "--nmi-floor", "1.01", "--out-root", str(tmp_path)])
    assert ei.value.code == 1


def test_stage_exception_becomes_fail_line(monkeypatch):
    """A golden-check mismatch raises (weight_verify RuntimeError); the
    runbook must record it as a FAIL line — not crash — so later stages
    still run and the JSON summary/exit-code contract holds."""
    monkeypatch.setitem(rb.STAGES, "inception",
                        lambda a: (_ for _ in ()).throw(
                            RuntimeError("golden mismatch 0.5 > 1e-3")))
    (res,) = rb.run_stage("inception", _args())
    assert res["status"] == "FAIL"
    assert "golden mismatch" in res["detail"]
    with pytest.raises(SystemExit) as ei:
        rb.main(["--stage", "inception"])
    assert ei.value.code == 1
