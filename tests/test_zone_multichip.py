"""Multi-device zone inference on the virtual 8-CPU mesh: sharded == single.

All four stitching modes shard the tile grid over the 'data' mesh axis
(reference behavior: src/zone_detect/compare.py:68-136 under SURVEY §2.5's
"shard the tile grid across devices" plan). exact-clipping is bit-exact;
the accumulate modes merge via psum, so f32 summation order may differ from
the sequential scan — planes must agree to 1 quantization step.
"""

import numpy as np
import pytest

from flairtpu.io import TiffReader
from flairtpu.io.tiff import Affine, write_array
from flairtpu.models.factory import create_model, init_model
from flairtpu.parallel.mesh import make_mesh
from flairtpu.zone.device_engine import DeviceZoneRunner
from flairtpu.zone.grid import slice_grid


@pytest.fixture(scope="module")
def zone_runner(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mz")
    rng = np.random.default_rng(2022)
    mf = {"model_provider": "SegmentationModelsPytorch",
          "SegmentationModelsPytorch": {"encoder_decoder": "resnet18_unet"}}
    cfg = {"model_framework": mf, "n_classes": 4, "channels": [1, 2, 3, 4, 5],
           "img_pixels_detection": 32, "margin": 8, "output_type": "argmax",
           "batch_size": 2,
           "norma_task": [{"norm_type": "scaling", "norm_means": [],
                           "norm_stds": []}]}
    model = create_model(cfg)
    params, stats = init_model(model, (1, 32, 32, 5))

    zone = rng.integers(0, 255, (5, 96, 112)).astype(np.uint8)
    p = tmp / "mz.tif"
    write_array(p, zone, transform=Affine.from_origin(0, 100, 0.2, 0.2), crs=2154)

    runner = DeviceZoneRunner(cfg, model, params, stats)
    mesh = make_mesh()
    assert int(np.prod(mesh.devices.shape)) == 8
    return p, runner, mesh


def test_sharded_exact_matches_single_device(zone_runner):
    p, runner, mesh = zone_runner
    with TiffReader(p) as r:
        grid = slice_grid(r.width, r.height, 32, 8, 16, r.transform, r.crs)
        single = runner.run(r, grid, "exact-clipping")
        sharded = runner.run(r, grid, "exact-clipping", mesh=mesh)
    np.testing.assert_array_equal(single["cls"], sharded["cls"])
    np.testing.assert_array_equal(single["prob"], sharded["prob"])
    assert sharded["tiles"] == len(grid)


@pytest.mark.parametrize("method", ["average", "average_weights", "max"])
def test_sharded_overlap_modes_match_single_device(zone_runner, method):
    p, runner, mesh = zone_runner
    with TiffReader(p) as r:
        # stride 16 < 32 - 2*8: genuinely overlapping tiles
        grid = slice_grid(r.width, r.height, 32, 8, 16, r.transform, r.crs)
        single = runner.run(r, grid, method)
        sharded = runner.run(r, grid, method, mesh=mesh)
    assert sharded["tiles"] == len(grid)
    # uint8 confidence plane: psum reassociates f32 adds -> <=1 step off
    prob_diff = np.abs(single["prob"].astype(int) - sharded["prob"].astype(int))
    assert prob_diff.max() <= 1, f"{method}: prob diff {prob_diff.max()}"
    cls_agree = (single["cls"] == sharded["cls"]).mean()
    assert cls_agree > 0.999, f"{method}: class agreement {cls_agree:.5f}"


def test_sharded_staged_zone_upload_is_cached(zone_runner):
    """The replicated padded-zone upload is paid once per staged zone, not
    once per run — sweep combinations with the same padding reuse it."""
    p, runner, mesh = zone_runner
    with TiffReader(p) as r:
        grid = slice_grid(r.width, r.height, 32, 8, 16, r.transform, r.crs)
        zone_np = np.ascontiguousarray(
            np.moveaxis(r.read(runner.config["channels"]), 0, -1))
        staged = {"path": str(p), "zone_np": zone_np, "read_seconds": 0.0}
        first = runner.run(r, grid, "exact-clipping", staged=staged, mesh=mesh)
        rep = staged.get("_rep_zone")
        assert rep is not None
        second = runner.run(r, grid, "max", staged=staged, mesh=mesh)
        assert staged["_rep_zone"] is rep  # same padding -> no re-upload
        unstaged = runner.run(r, grid, "exact-clipping", mesh=mesh)
    np.testing.assert_array_equal(first["cls"], unstaged["cls"])
    assert second["tiles"] == len(grid)


def test_sharded_class_prob_matches_single_device(zone_runner):
    """class_prob (K-plane payload, forced exact clipping) also shards —
    round-2 verdict hole: zone/device_engine.py used to run it single-device."""
    import dataclasses

    p, runner, mesh = zone_runner
    cfg = dict(runner.config, output_type="class_prob")
    probs_runner = DeviceZoneRunner(cfg, runner.model, runner.params,
                                    runner.batch_stats)
    with TiffReader(p) as r:
        grid = slice_grid(r.width, r.height, 32, 8, 16, r.transform, r.crs)
        single = probs_runner.run(r, grid, "exact-clipping")
        sharded = probs_runner.run(r, grid, "exact-clipping", mesh=mesh)
        # the reference forces exact clipping for class_prob whatever the
        # method (compare.py:68) — the sharded path must do the same
        sharded_avg = probs_runner.run(r, grid, "average", mesh=mesh)
    assert single["probs"].shape == (4, 96, 112)
    np.testing.assert_array_equal(single["probs"], sharded["probs"])
    np.testing.assert_array_equal(single["probs"], sharded_avg["probs"])
    assert sharded["tiles"] == len(grid)
