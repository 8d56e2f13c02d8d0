"""Multi-host (DCN) training: 2 jax.distributed processes over the CPU backend.

The TPU-native answer to the reference's Lightning `num_nodes`/`strategy=ddp`
knobs (src/flair/tasks.py:83-93, configs/flair-1-config.yaml:81-85): spawns 2
OS processes, each with 4 virtual CPU devices, forming one 8-device global
mesh via jax.distributed; runs a real SPMD train step with process-sharded
data loading and a multi-process Orbax checkpoint save/restore.
"""

import socket
import subprocess
import sys
from pathlib import Path

import numpy as np


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_step_and_checkpoint(tmp_path):
    worker = Path(__file__).parent / "multihost_worker.py"
    port = _free_port()
    out_dir = tmp_path / "mh_ckpt"
    out_dir.mkdir()
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), str(pid), str(out_dir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outputs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    for pid, out in enumerate(outputs):
        assert f"[worker {pid}] ALL OK" in out, out
        assert "OK distributed: 8 global devices" in out
        assert "OK train step" in out
        assert "OK checkpoint round-trip" in out
    # the two processes read DISJOINT halves of the epoch
    ids = [sorted(line.split(": ", 1)[1] for line in out.splitlines()
                  if "OK loader shard" in line) for out in outputs]
    assert ids[0] != ids[1]
    # rank-0 gating: the checkpoint exists exactly once on disk
    assert any(out_dir.iterdir())


def test_two_process_zone_inference(tmp_path):
    """One zone inference spanning 2 processes (8-device global mesh): the
    tile grid shards across hosts and the stitched planes match the
    single-process result (exact-clipping bit-exact; average within the
    1-quantization-step psum tolerance of test_zone_multichip.py)."""
    from flairtpu.io import TiffReader
    from flairtpu.io.tiff import Affine, write_array
    from flairtpu.models.factory import create_model, init_model
    from flairtpu.train.checkpoints import save_weights_msgpack
    from flairtpu.zone.device_engine import DeviceZoneRunner
    from flairtpu.zone.grid import slice_grid

    rng = np.random.default_rng(2022)
    zone = rng.integers(0, 255, (5, 96, 112)).astype(np.uint8)
    zone_p = tmp_path / "mhz.tif"
    write_array(zone_p, zone, transform=Affine.from_origin(0, 100, 0.2, 0.2),
                crs=2154)

    # single-process reference (same deterministic init as the workers)
    cfg = {"model_framework": {
               "model_provider": "SegmentationModelsPytorch",
               "SegmentationModelsPytorch": {"encoder_decoder": "resnet18_unet"}},
           "n_classes": 4, "channels": [1, 2, 3, 4, 5],
           "img_pixels_detection": 32, "margin": 8, "output_type": "argmax",
           "batch_size": 2,
           "norma_task": [{"norm_type": "scaling", "norm_means": [],
                           "norm_stds": []}]}
    model = create_model(cfg)
    params, stats = init_model(model, (1, 32, 32, 5))
    weights_p = tmp_path / "mhz_weights.msgpack"
    save_weights_msgpack(weights_p, params, stats)
    runner = DeviceZoneRunner(cfg, model, params, stats)
    with TiffReader(zone_p) as r:
        grid = slice_grid(r.width, r.height, 32, 8, 16, r.transform, r.crs)
        ref_exact = runner.run(r, grid, "exact-clipping")
        ref_avg = runner.run(r, grid, "average")

    worker = Path(__file__).parent / "multihost_zone_worker.py"
    port = _free_port()
    outs = [tmp_path / f"w{pid}.npz" for pid in range(2)]
    pipe_out = tmp_path / "pipe_out"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), str(pid), str(zone_p),
             str(outs[pid]), str(weights_p), str(pipe_out)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"[worker {pid}] ALL OK" in out, out

    for pid in range(2):  # every host holds the full stitched result
        got = np.load(outs[pid])
        np.testing.assert_array_equal(got["exact_cls"], ref_exact["cls"])
        np.testing.assert_array_equal(got["exact_prob"], ref_exact["prob"])
        prob_diff = np.abs(got["avg_prob"].astype(int)
                           - ref_avg["prob"].astype(int))
        assert prob_diff.max() <= 1, prob_diff.max()
        assert (got["avg_cls"] == ref_avg["cls"]).mean() > 0.999

    # phase 2: the full flair-detect pipeline across both processes wrote
    # the raster exactly once (rank-0 gating), matching the reference run
    tifs = sorted(p.name for p in pipe_out.glob("*.tif"))
    assert tifs == ["mhz-ARGMAX-S.tif"], tifs
    with TiffReader(pipe_out / "mhz-ARGMAX-S.tif") as r:
        np.testing.assert_array_equal(r.read(1), ref_exact["cls"])

    # phase 3: bn_fold across both processes (the folded weights live
    # outside the params tree and must re-place as global arrays); CPU
    # compute dtype is f32 so folding is pure algebra — planes agree
    fold_out = Path(str(pipe_out) + "_fold")
    with TiffReader(fold_out / "mhz-ARGMAX-S.tif") as r:
        assert (r.read(1) == ref_exact["cls"]).mean() >= 0.999
        np.testing.assert_array_equal(r.read(2), ref_exact["prob"])
