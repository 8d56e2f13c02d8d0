"""Multi-device zone inference on the virtual 8-CPU mesh: sharded == single."""

import numpy as np

from flairtpu.io import TiffReader
from flairtpu.io.tiff import Affine, write_array
from flairtpu.models.factory import create_model, init_model
from flairtpu.parallel.mesh import make_mesh
from flairtpu.zone.device_engine import DeviceZoneRunner
from flairtpu.zone.grid import slice_grid


def test_sharded_zone_matches_single_device(tmp_path, rng):
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
    p = tmp_path / "mz.tif"
    write_array(p, zone, transform=Affine.from_origin(0, 100, 0.2, 0.2), crs=2154)

    runner = DeviceZoneRunner(cfg, model, params, stats)
    mesh = make_mesh()
    assert int(np.prod(mesh.devices.shape)) == 8
    with TiffReader(p) as r:
        grid = slice_grid(r.width, r.height, 32, 8, 16, r.transform, r.crs)
        single = runner.run(r, grid, "exact-clipping")
        sharded = runner.run(r, grid, "exact-clipping", mesh=mesh)
    np.testing.assert_array_equal(single["cls"], sharded["cls"])
    np.testing.assert_array_equal(single["prob"], sharded["prob"])
    assert sharded["tiles"] == len(grid)
