"""End-to-end cross-validation against the independent C++ implementation
(native/baseline_sppm.cpp) on the FULL scene — specular + refractive
transport and teapot caustics, not just the diffuse box of test_golden.py.

The full-size artifact (128^2, 2M photons, recorded verdict) lives in
docs/CROSSVAL.json, produced by scripts/crossval.py.  This test runs a small
version end to end (builds the C++ binary, renders both sides, compares
block-pooled linear radiance); it needs a working g++ and several minutes of
CPU, so it is opt-in via RT3_CROSSVAL=1.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("RT3_CROSSVAL") != "1",
                    reason="set RT3_CROSSVAL=1 (builds+runs the C++ side; minutes)")
def test_crossval_full_scene_small():
    out = os.path.join("/tmp", "crossval_pytest.json")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "crossval.py"),
         "--res", "64", "--photons", "262144", "--platform", "cpu",
         "--block", "8", "--out", out],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    rec = json.load(open(out))
    assert rec["pass"], rec


def test_crossval_artifact_recorded():
    """The checked-in full-size cross-validation verdict must exist and pass
    (regenerate with scripts/crossval.py if the estimator changes)."""
    path = os.path.join(REPO, "docs", "CROSSVAL.json")
    assert os.path.exists(path), "docs/CROSSVAL.json missing - run scripts/crossval.py"
    rec = json.load(open(path))
    assert rec["pass"], rec
    assert rec["rel_err_mean"] < 0.10, rec
    assert rec["blocks_compared"] >= 0.75 * rec["blocks_total"], rec


def test_gradcheck_artifact_recorded():
    """The checked-in grad-check pass-rate metric (BASELINE 'grad check pass
    rate') must exist and pass under the round-3 criterion (regenerate with
    scripts/gradcheck.py): EVERY group >= 0.9 with >= MIN_CHECKED scored
    coordinates, including the at-scale Pallas lane-deposit gradient path."""
    path = os.path.join(REPO, "GRADCHECK.json")
    assert os.path.exists(path), "GRADCHECK.json missing - run scripts/gradcheck.py"
    rec = json.load(open(path))
    assert rec["pass"], rec
    assert rec["grad_check_pass_rate"] >= 0.9, rec
    assert rec["checked"] >= 40, rec["checked"]
    # the headline group: control points through the Newton IFT on a curve
    assert any(k.startswith("ctrl") for k in rec["groups"]), rec["groups"]
    # the differentiable Pallas deposit must be a validated column too
    assert any("+lane" in k for k in rec["groups"]), rec["groups"]
    for name, g in rec["groups"].items():
        assert g["group_pass"], (name, {k: g[k] for k in
                                        ("checked", "passed", "pass_rate")})


def test_crossval_textured_and_sppm_artifacts_recorded():
    """Round-4: the UV-quirk texture paths and the live radius-shrink mode
    are cross-validated against the C++ oracle (VERDICT round 3 item 4);
    regenerate with scripts/crossval.py --textures / --update-mode sppm."""
    for name in ("CROSSVAL_TEX.json", "CROSSVAL_SPPM.json"):
        path = os.path.join(REPO, "docs", name)
        assert os.path.exists(path), f"{name} missing - run scripts/crossval.py"
        rec = json.load(open(path))
        assert rec["pass"], (name, rec)
        assert rec["rel_err_mean"] < 0.10, (name, rec["rel_err_mean"])
        assert rec["jax_stats"]["deposits_dropped"] == 0, name
