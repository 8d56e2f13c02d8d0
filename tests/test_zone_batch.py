"""Department batch mode (-b) end-to-end test (CPU)."""

import json
from pathlib import Path

import numpy as np
import pytest

from flairtpu import config as cfgmod
from flairtpu.io.tiff import Affine, write_array
from flairtpu.models.factory import create_model, init_model
from flairtpu.train.checkpoints import save_weights_msgpack

N_CLASSES = 4


def test_batch_metrics_pipeline(tmp_path, rng):
    # department layout: input_path/D099_2021-like zone dirs; truth mirrors it
    dpt_in = tmp_path / "inputs" / "D099_2021"
    truth_root = tmp_path / "truth"
    for zone in ("Z1_AA", "Z2_BB"):
        zdir = dpt_in / zone
        zdir.mkdir(parents=True)
        img = rng.integers(0, 255, size=(5, 48, 64)).astype(np.uint8)
        # reference filename convention: <dpt>_<zone>_<type>.tif
        write_array(zdir / f"D099_2021_{zone}_irc.tif", img,
                    transform=Affine.from_origin(0, 100, 0.2, 0.2), crs=2154)
        tdir = truth_root / "D099_2021" / zone
        tdir.mkdir(parents=True)
        truth = rng.integers(1, N_CLASSES + 1, size=(48, 64)).astype(np.uint8)
        write_array(tdir / "truth.tif", truth)

    mf = {"model_provider": "SegmentationModelsPytorch",
          "SegmentationModelsPytorch": {"encoder_decoder": "resnet18_unet"}}
    model = create_model({"model_framework": mf, "n_classes": N_CLASSES,
                          "channels": [1, 2, 3, 4, 5]})
    params, stats = init_model(model, (1, 32, 32, 5))
    weights = tmp_path / "w.msgpack"
    save_weights_msgpack(weights, params, stats)

    out = tmp_path / "out"
    cfg = {
        "output_path": str(out),
        "output_name": "placeholder",
        "input_img_path": str(dpt_in / "Z1_AA" / "D099_2021_Z1_AA_irc.tif"),
        "input_path": str(dpt_in),
        "truth_root": str(truth_root),
        "truth_path": str(truth_root / "D099_2021" / "Z1_AA" / "truth.tif"),
        "data_type": "irc",
        "model_name": "resnet18_unet",
        "channels": [1, 2, 3, 4, 5],
        "img_pixels_detection": 32,
        "margin": 8,
        "output_type": "argmax",
        "n_classes": N_CLASSES,
        "model_weights": str(weights),
        "model_framework": mf,
        "batch_size": 4,
        "use_gpu": False,
        "num_worker": 1,
        "write_dataframe": False,
        "norma_task": [{"norm_type": "scaling", "norm_means": [], "norm_stds": []}],
        "classes": {i + 1: [1, f"class_{i}"] for i in range(N_CLASSES)},
        "metrics": True,
        "batch_mode": True,
        "compare": False,
    }
    cfg = cfgmod.validate_detect_config(cfg)

    from flairtpu.zone.batch import batch_metrics_pipeline

    batch_metrics_pipeline(cfg)

    # two zone rasters produced with parseable method names
    tifs = sorted(out.glob("*.tif"))
    assert len(tifs) == 2
    assert all("-ARGMAX-S_size=32" in t.name for t in tifs)

    # aggregated per-method metrics json
    mjson = json.loads(Path(cfg["metrics_out"]).read_text())
    assert len(mjson) == 1  # one method
    rec = mjson[0]
    assert rec["Parameters values"][0] == "resnet18_unet"
    assert rec["Parameters values"][1] == 32  # patch size
    assert rec["Avg_metrics_name"] == ["mIoU", "Overall Accuracy", "Fscore",
                                       "Time in ms"]
    assert len(rec["per_class_iou"]) == N_CLASSES
