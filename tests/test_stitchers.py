"""Stitcher oracle tests: hand-computed blends, independent of any model."""

import numpy as np
import pytest

from flairtpu.io import TiffWriter
from flairtpu.zone.grid import slice_grid
from flairtpu.zone.stitch import make_stitcher
from flairtpu.zone.weights import patch_weights


def _setup(tmp_path, method, output_type="argmax", W=48, H=32, S=16, M=4, stride=8):
    grid = slice_grid(W, H, S, M, stride)
    n_bands = 2 if output_type == "argmax" else 3
    writer = TiffWriter(tmp_path / f"{method}.tif", W, H, n_bands, "uint8")
    cfg = {"output_type": output_type, "n_classes": 3,
           "img_pixels_detection": S, "margin": M}
    return grid, writer, make_stitcher(method, writer, grid, cfg)


def _uniform_probs(grid, p=(0.2, 0.3, 0.5)):
    S = grid.patch_size
    return np.tile(np.asarray(p, np.float32)[:, None, None], (1, S, S))


def test_average_of_identical_tiles_is_identity(tmp_path):
    """SURVEY §4 invariant: averaging identical uniform tiles == the tile."""
    grid, writer, st = _setup(tmp_path, "average")
    probs = _uniform_probs(grid)
    for t in grid.tiles:
        st.add(t, probs)
    st.finalize()
    cls = writer.read()[0]
    prob = writer.read()[1]
    writer.close()
    assert (cls == 2).all()  # argmax of (0.2, 0.3, 0.5)
    np.testing.assert_allclose(prob.astype(int), round(0.5 * 255), atol=1)


def test_average_weights_identity(tmp_path):
    grid, writer, st = _setup(tmp_path, "average_weights")
    probs = _uniform_probs(grid)
    for t in grid.tiles:
        st.add(t, probs)
    st.finalize()
    prob = writer.read()[1]
    writer.close()
    # weighted mean of a constant is the constant
    np.testing.assert_allclose(prob.astype(int), round(0.5 * 255), atol=1)


def test_max_keeps_highest_confidence(tmp_path):
    grid, writer, st = _setup(tmp_path, "max")
    S = grid.patch_size
    for i, t in enumerate(grid.tiles):
        conf = 0.9 if i == 0 else 0.6  # first tile most confident
        cls = np.full((S, S), 1 if i == 0 else 2, np.uint8)
        prob = np.full((S, S), conf, np.float32)
        st.add(t, (cls, prob))
    st.finalize()
    out_cls = writer.read()[0]
    out_prob = writer.read()[1]
    writer.close()
    t0 = grid.tiles[0]
    r0, c0 = max(t0.row0, 0), max(t0.col0, 0)
    r1 = min(t0.row0 + S, writer.height)
    c1 = min(t0.col0 + S, writer.width)
    assert (out_cls[r0:r1, c0:c1] == 1).all()  # high-confidence tile wins
    assert abs(int(out_prob.max()) - round(0.9 * 255)) <= 1
    # bug #3 fixed: winner chosen by confidence, not by class index
    assert (out_cls[r1:, :] == 2).all() if r1 < writer.height else True


def test_exact_clipping_last_write_wins(tmp_path):
    grid, writer, st = _setup(tmp_path, "exact-clipping")
    s = grid.patch_size - 2 * grid.margin
    for i, t in enumerate(grid.tiles):
        cls = np.full((s, s), i % 3, np.uint8)
        prob = np.full((s, s), 100 + i, np.uint8)
        st.add(t, (cls, prob))
    st.finalize()
    out = writer.read()
    writer.close()
    # every pixel written exactly by its owning tile's inner region
    last = grid.tiles[-1]
    assert (out[1, last.irow0:last.irow1, last.icol0:last.icol1]
            == 100 + last.index).all()
    assert (out[1] >= 100).all()
