"""Visualization + error-map tests (headless Agg rendering)."""

import numpy as np
from pathlib import Path

from flairtpu.io.tiff import Affine, write_array
from flairtpu.zone.error_maps import error_rate_loop, error_rate_patch, gaussian_smooth
from flairtpu.zone.grid import slice_grid
from flairtpu.zone.visualization import visualize_weights, viz_slicing


def test_error_rate_identity_is_zero(rng):
    """Identical rasters => error rate 0 (the reference's own sanity test,
    src/zone_detect/test/tests.py:13-37)."""
    a = rng.integers(0, 5, size=(40, 40))
    assert (error_rate_patch(a, a) == 0).all()
    b = a.copy()
    b[0, 0] = (b[0, 0] + 1) % 5
    err = error_rate_patch(b, a)
    assert err.sum() == 1.0 and err[0, 0] == 1.0


def test_gaussian_smooth_preserves_mass(rng):
    img = rng.random((30, 30)).astype(np.float32)
    sm = gaussian_smooth(img, sigma=1.5)
    assert sm.shape == img.shape
    assert abs(sm.mean() - img.mean()) < 0.02
    assert sm.std() < img.std()  # actually smooths


def test_error_rate_loop_pngs(tmp_path, rng):
    truth = rng.integers(1, 5, size=(40, 40)).astype(np.uint8)
    tdir = tmp_path / "truth" / "Z1_AA"
    tdir.mkdir(parents=True)
    write_array(tdir / "truth.tif", truth)
    pdir = tmp_path / "preds" / "20240101_000000"
    pdir.mkdir(parents=True)
    pred = (truth - 1).copy()
    pred[:10] = 0
    write_array(
        pdir / "D01_2020_Z1_AA_irc-ARGMAX-S_size=32_stride=16_margin=8_padding=no_stitching=max.tif",
        pred)
    out = error_rate_loop(tmp_path / "truth", tmp_path / "maps", tmp_path / "preds")
    assert len(out) == 1
    png = next(iter(out.values()))
    assert png.exists() and png.stat().st_size > 1000


def test_viz_slicing_renders(tmp_path):
    grid = slice_grid(100, 80, 32, 8, stride=16)
    png = tmp_path / "grid.png"
    viz_slicing(grid, png)
    assert png.exists() and png.stat().st_size > 1000


def test_visualize_weights_renders(tmp_path):
    png = tmp_path / "w.png"
    visualize_weights(32, 16, out_png=png)
    assert png.exists() and png.stat().st_size > 1000
