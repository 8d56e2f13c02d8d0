"""Zone pipeline with an HF-provider model (SegFormer) end-to-end (CPU)."""

import numpy as np
from pathlib import Path

from flairtpu import config as cfgmod
from flairtpu.io import TiffReader
from flairtpu.io.tiff import Affine, write_array
from flairtpu.models.factory import create_model, init_model
from flairtpu.train.checkpoints import save_weights_msgpack


def test_zone_pipeline_with_segformer(tmp_path, rng):
    zone = rng.integers(0, 255, size=(3, 64, 80)).astype(np.uint8)
    zpath = tmp_path / "zone.tif"
    write_array(zpath, zone, transform=Affine.from_origin(0, 100, 0.2, 0.2),
                crs=2154)

    mf = {"model_provider": "HuggingFace",
          "HuggingFace": {"org_model": "nvidia/segformer-b0"}}
    model = create_model({"model_framework": mf, "n_classes": 5,
                          "channels": [1, 2, 3]})
    params, stats = init_model(model, (1, 32, 32, 3))
    weights = tmp_path / "w.msgpack"
    save_weights_msgpack(weights, params, stats)

    cfg = cfgmod.validate_detect_config({
        "output_path": str(tmp_path / "out"),
        "output_name": "seg-ARGMAX-S",
        "input_img_path": str(zpath),
        "channels": [1, 2, 3],
        "img_pixels_detection": 32,
        "margin": 8,
        "output_type": "argmax",
        "n_classes": 5,
        "model_weights": str(weights),
        "model_framework": mf,
        "batch_size": 2,
        "use_gpu": False,
        "num_worker": 1,
        "write_dataframe": False,
        "norma_task": [{"norm_type": "scaling", "norm_means": [], "norm_stds": []}],
    })
    from flairtpu.zone.engine import run_pipeline

    run_pipeline(cfg)
    with TiffReader(Path(cfg["output_path"]) / "seg-ARGMAX-S.tif") as r:
        assert (r.width, r.height, r.count) == (80, 64, 2)
        assert (r.read(2) > 0).all()
        assert r.read(1).max() < 5


def test_zone_pipeline_with_mobilevit(tmp_path, rng):
    """Zone path with the MobileViT family (xx-small, real spec)."""
    zone = rng.integers(0, 255, size=(3, 64, 80)).astype(np.uint8)
    zpath = tmp_path / "zone.tif"
    write_array(zpath, zone, transform=Affine.from_origin(0, 100, 0.2, 0.2),
                crs=2154)

    mf = {"model_provider": "HuggingFace",
          "HuggingFace": {"org_model": "apple/deeplabv3-mobilevit-xx-small"}}
    model = create_model({"model_framework": mf, "n_classes": 5,
                          "channels": [1, 2, 3]})
    params, stats = init_model(model, (1, 32, 32, 3))
    weights = tmp_path / "w.msgpack"
    save_weights_msgpack(weights, params, stats)

    cfg = cfgmod.validate_detect_config({
        "output_path": str(tmp_path / "out"),
        "output_name": "mv-ARGMAX-S",
        "input_img_path": str(zpath),
        "channels": [1, 2, 3],
        "img_pixels_detection": 32,
        "margin": 8,
        "output_type": "argmax",
        "n_classes": 5,
        "model_weights": str(weights),
        "model_framework": mf,
        "batch_size": 2,
        "use_gpu": False,
        "num_worker": 1,
        "write_dataframe": False,
        "norma_task": [{"norm_type": "scaling", "norm_means": [], "norm_stds": []}],
    })
    from flairtpu.zone.engine import run_pipeline

    run_pipeline(cfg)
    with TiffReader(Path(cfg["output_path"]) / "mv-ARGMAX-S.tif") as r:
        assert (r.width, r.height, r.count) == (80, 64, 2)
        assert (r.read(2) > 0).all()
        assert r.read(1).max() < 5
