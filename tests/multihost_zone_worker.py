"""Worker process for the multi-host (DCN) ZONE INFERENCE test.

Launched twice by tests/test_multihost.py (2 processes x 4 virtual CPU
devices = one 8-device global mesh). The reference's zone-detect is strictly
single-process/single-device (src/zone_detect/main.py:398-427); here the
tile grid shards over the global 'data' axis spanning both processes —
each host reads the same raster, computes its tile share, and the stitched
planes come back replicated so every host holds the full result.

Usage: python multihost_zone_worker.py <port> <pid> <zone_tif> <out_npz> \
           <weights_msgpack> <pipeline_out_dir>
"""

import os
import sys

port, pid, zone_path, out_npz, weights_path, pipe_out = (
    sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5],
    sys.argv[6])
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from flairtpu.parallel.mesh import initialize_distributed, make_mesh  # noqa: E402

initialize_distributed(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert jax.device_count() == 8 and len(jax.local_devices()) == 4
print(f"[worker {pid}] OK distributed: {jax.device_count()} global devices")

from flairtpu.io import TiffReader  # noqa: E402
from flairtpu.models.factory import create_model, init_model  # noqa: E402
from flairtpu.zone.device_engine import DeviceZoneRunner  # noqa: E402
from flairtpu.zone.grid import slice_grid  # noqa: E402

cfg = {
    "model_framework": {
        "model_provider": "SegmentationModelsPytorch",
        "SegmentationModelsPytorch": {"encoder_decoder": "resnet18_unet"},
    },
    "n_classes": 4, "channels": [1, 2, 3, 4, 5],
    "img_pixels_detection": 32, "margin": 8, "output_type": "argmax",
    "batch_size": 2,
    "norma_task": [{"norm_type": "scaling", "norm_means": [], "norm_stds": []}],
}
model = create_model(cfg)
params, stats = init_model(model, (1, 32, 32, 5))  # deterministic: same on
# both processes and in the parent (seeded flax init)

runner = DeviceZoneRunner(cfg, model, params, stats)
mesh = make_mesh(devices=jax.devices())  # global 8-device 'data' mesh

with TiffReader(zone_path) as r:
    grid = slice_grid(r.width, r.height, 32, 8, 16, r.transform, r.crs)
    exact = runner.run(r, grid, "exact-clipping", mesh=mesh)
    avg = runner.run(r, grid, "average", mesh=mesh)
print(f"[worker {pid}] OK zone inference: {exact['tiles']} tiles, "
      f"{exact['cls'].shape} planes")

np.savez(out_npz, exact_cls=exact["cls"], exact_prob=exact["prob"],
         avg_cls=avg["cls"], avg_prob=avg["prob"])

# -- phase 2: the actual flair-detect pipeline spanning both hosts --------
# FLAIRTPU_ZONE_SHARD=1 forces the mesh-sharded programs on the CPU
# backend; run_pipeline's raster write is rank-0-gated (engine.py).
os.environ["FLAIRTPU_ZONE_SHARD"] = "1"

from flairtpu import config as cfgmod  # noqa: E402
from flairtpu.zone.engine import run_pipeline  # noqa: E402

base_cfg = {
    "output_name": "mhz-ARGMAX-S",
    "input_img_path": zone_path, "channels": [1, 2, 3, 4, 5],
    "img_pixels_detection": 32, "margin": 8, "output_type": "argmax",
    "n_classes": 4, "model_weights": weights_path,
    "model_framework": cfg["model_framework"],
    "batch_size": 2, "use_gpu": False, "num_worker": 1,
    "norma_task": [{"norm_type": "scaling", "norm_means": [],
                    "norm_stds": []}],
    "classes": {i: [1, f"c{i}"] for i in range(1, 5)},
}
run_pipeline(cfgmod.validate_detect_config(
    {**base_cfg, "output_path": pipe_out}))
wrote = os.path.exists(os.path.join(pipe_out, "mhz-ARGMAX-S.tif"))
print(f"[worker {pid}] OK run_pipeline (rank0_wrote={wrote})")

# -- phase 3: bn_fold across both hosts — FoldedZoneModel's out-of-tree
# folded weights must be re-placed as global replicated arrays by the
# sharded runner (device_engine) or the shard_map program can't close
# over them on a process-spanning mesh
run_pipeline(cfgmod.validate_detect_config(
    {**base_cfg, "output_path": pipe_out + "_fold", "bn_fold": True}))
wrote = os.path.exists(os.path.join(pipe_out + "_fold", "mhz-ARGMAX-S.tif"))
print(f"[worker {pid}] OK run_pipeline bn_fold (rank0_wrote={wrote})")
print(f"[worker {pid}] ALL OK")
