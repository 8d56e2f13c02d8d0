"""Zone-detect tests: grid laws, weight maps, stitching, end-to-end pipeline."""

import json
from pathlib import Path

import numpy as np
import pytest

from flairtpu.zone.grid import get_stride, slice_grid, slice_pixels
from flairtpu.zone.weights import patch_overlap, patch_weights, tile_starts, total_weights
from flairtpu.zone.naming import extract_method, info_extract, method_string


# ---------------------------------------------------------------------------
# grid invariants (SURVEY.md §4: slicing covers every pixel >= 1x; exact
# partition with the default stride)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("W,H,S,M", [(100, 80, 32, 8), (64, 64, 32, 0),
                                     (33, 47, 32, 4), (20, 20, 32, 8)])
def test_grid_inner_regions_partition(W, H, S, M):
    grid = slice_grid(W, H, S, M, stride=S - 2 * M)
    cover = np.zeros((H, W), np.int32)
    for t in grid.tiles:
        assert t.icol0 >= 0 and t.irow0 >= 0
        assert t.icol1 <= W and t.irow1 <= H
        cover[t.irow0:t.irow1, t.icol0:t.icol1] += 1
    assert (cover >= 1).all(), "every pixel must be covered"


def test_grid_full_patch_origin_law():
    grid = slice_grid(100, 80, 32, 8, stride=16)
    for t in grid.tiles:
        assert t.col0 >= -8 and t.col0 + 32 <= 100 + 8
        assert t.row0 >= -8 and t.row0 + 32 <= 80 + 8
    # dedup: origins unique
    origins = {(t.col0, t.row0) for t in grid.tiles}
    assert len(origins) == len(grid.tiles)


def test_get_stride_laws():
    cfg = {"img_pixels_detection": 512, "margin": 128}
    assert get_stride(cfg) == [256]
    cfg2 = {"img_pixels_detection": 512, "margin": 128, "overlap_strat": True,
            "strategies": {"tiling": {"stride_range": [0.5, 0.75]}}}
    assert get_stride(cfg2) == [256, 384]


def test_slice_pixels_covers_and_aligns():
    boxes = slice_pixels((100, 80), 40, 4, 32)  # inner=32
    cover = np.zeros((80, 100), np.int32)
    for x0, x1, y0, y1 in boxes:
        assert x1 - x0 == 32 and y1 - y0 == 32
        assert 0 <= x0 and x1 <= 100 and 0 <= y0 and y1 <= 80
        cover[y0:y1, x0:x1] += 1
    assert (cover >= 1).all()


# ---------------------------------------------------------------------------
# overlap & weight maps
# ---------------------------------------------------------------------------

def test_tile_starts_clamped():
    assert tile_starts(100, 32, 32).tolist() == [0, 32, 64, 68]
    assert tile_starts(20, 32, 32).tolist() == []


def test_patch_overlap_counts():
    # 64-wide image, 32 patches, stride 16 -> interior covered 2x
    m = patch_overlap((64, 64), 32, [0, 64, 0, 64], 16)
    assert m.shape == (64, 64)
    assert m[32, 32] == 4  # 2x in each axis
    assert m[0, 0] == 1
    assert (m >= 1).all()


def test_patch_weights_decay():
    w = patch_weights(32)
    assert w.max() == pytest.approx(1.0)
    c = 16
    assert w[c, c] == w.max()
    assert w[0, 0] == w.min()
    # symmetric in Chebyshev rings
    assert w[c, 0] == pytest.approx(w[0, c])


def test_total_weights_positive_everywhere():
    tw = total_weights((64, 64), 32, [0, 64, 0, 64], 16)
    assert (tw > 0).all()


def test_average_identity_property():
    """count-average of identical uniform tiles == the tile (SURVEY.md §4)."""
    counts = patch_overlap((64, 64), 32, [0, 64, 0, 64], 16).astype(np.float64)
    acc = np.zeros((64, 64))
    for ty in tile_starts(64, 32, 16):
        for tx in tile_starts(64, 32, 16):
            acc[ty:ty + 32, tx:tx + 32] += 0.7
    np.testing.assert_allclose(acc / counts, 0.7)


# ---------------------------------------------------------------------------
# naming
# ---------------------------------------------------------------------------

def test_method_string_roundtrip():
    m = method_string(512, 256, 128, "no-padding", "exact-clipping")
    info = extract_method(m)
    assert info == {"patch_size": 512, "stride": 256, "margin": 128,
                    "padding": "no-padding", "stitching": "exact-clipping"}


def test_info_extract():
    p = "/out/D012_2019_Z13_AA_irc-ARGMAX-S_size=128_stride=96_margin=16_padding=no_stitching=max.tif"
    info = info_extract(p)
    assert info["dpt"] == "D012_2019"
    assert info["zone"] == "Z13_AA"
    assert info["patch_size"] == 128 and info["stitching"] == "max"
