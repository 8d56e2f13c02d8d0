"""Zone pipeline end-to-end with the non-unet smp architectures (CPU).

The inner-decode fast path is unet-only; these archs take the
full-decode + margin-crop fallback in engine._forward_inner /
device_engine._forward_inner — this exercises that route through the real
flair-detect pipeline (reference src/zone_detect/main.py:244-435 analog).
"""

import numpy as np
import pytest
from pathlib import Path

from flairtpu import config as cfgmod
from flairtpu.io import TiffReader
from flairtpu.io.tiff import Affine, write_array
from flairtpu.models.factory import create_model, init_model
from flairtpu.train.checkpoints import save_weights_msgpack


# pan's FPA pyramid needs a stride-16 map >= 8px, hence the larger tile;
# mit encoders are RGB-only (smp set_in_channels parity) and need a
# stride-32 map >= 2px, hence tile 64 + 3-channel selection
@pytest.mark.parametrize("encoder_decoder,tile,zone_hw,channels", [
    ("resnet18_fpn", 32, (64, 96), [1, 2, 3, 4, 5]),
    ("resnet18_linknet", 32, (64, 96), [1, 2, 3, 4, 5]),
    ("resnet18_manet", 32, (64, 96), [1, 2, 3, 4, 5]),
    ("resnet18_pan", 128, (128, 192), [1, 2, 3, 4, 5]),
    ("efficientnet-b0_unet", 32, (64, 96), [1, 2, 3, 4, 5]),
    ("mobilenet_v2_unet", 32, (64, 96), [1, 2, 3, 4, 5]),
    ("vgg11_unet", 32, (64, 96), [1, 2, 3, 4, 5]),
    ("densenet121_fpn", 32, (64, 96), [1, 2, 3, 4, 5]),
    ("xception_unet", 64, (96, 128), [1, 2, 3, 4, 5]),
    ("mit_b0_unet", 64, (96, 128), [1, 2, 3]),
    ("dpn68_unet", 64, (96, 128), [1, 2, 3, 4, 5]),
    ("inceptionresnetv2_unet", 64, (96, 128), [1, 2, 3, 4, 5]),
    ("timm-efficientnet-b0_unet", 64, (96, 128), [1, 2, 3]),
    ("timm-resnest14d_unet", 64, (96, 128), [1, 2, 3, 4]),
    ("timm-res2net50_26w_4s_unet", 64, (96, 128), [1, 2, 3]),
    ("timm-mobilenetv3_large_100_unet", 64, (96, 128), [1, 2, 3, 4]),
    ("timm-skresnet18_unet", 64, (96, 128), [1, 2, 3]),
    ("timm-regnety_002_unet", 64, (96, 128), [1, 2, 3, 4]),
    ("timm-gernet_s_unet", 64, (96, 128), [1, 2, 3, 4]),
    ("mobileone_s0_unet", 64, (96, 128), [1, 2, 3]),
])
def test_zone_pipeline_with_smp_arch(tmp_path, rng, encoder_decoder, tile,
                                     zone_hw, channels):
    zone = rng.integers(0, 255, size=(5, *zone_hw)).astype(np.uint8)
    zpath = tmp_path / "zone.tif"
    write_array(zpath, zone, transform=Affine.from_origin(0, 100, 0.2, 0.2),
                crs=2154)

    mf = {"model_provider": "SegmentationModelsPytorch",
          "SegmentationModelsPytorch": {"encoder_decoder": encoder_decoder}}
    model = create_model({"model_framework": mf, "n_classes": 6,
                          "channels": channels})
    params, stats = init_model(model, (1, tile, tile, len(channels)))
    weights = tmp_path / "w.msgpack"
    save_weights_msgpack(weights, params, stats)

    cfg = cfgmod.validate_detect_config({
        "output_path": str(tmp_path / "out"),
        "output_name": "smp-ARGMAX-S",
        "input_img_path": str(zpath),
        "channels": channels,
        "img_pixels_detection": tile,
        "margin": tile // 4,
        "output_type": "argmax",
        "n_classes": 6,
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
    with TiffReader(Path(cfg["output_path"]) / "smp-ARGMAX-S.tif") as r:
        assert (r.width, r.height, r.count) == (zone_hw[1], zone_hw[0], 2)
        assert (r.read(2) > 0).all()
        assert r.read(1).max() < 6


@pytest.mark.parametrize("encoder_decoder", [
    "resnet18_deeplabv3plus", "resnet18_fpn"])
def test_strided_head_inner_decode_planes_agree(
        tmp_path, rng, monkeypatch, encoder_decoder):
    """Zone e2e: the strided-head inner decode fast path (windowed head
    upsample) vs the full-decode + crop route it replaces (reference
    exact-clipping crop, compare.py:68-82). Class planes must be exact;
    the confidence byte may flip by 1 on the rare pixel whose probability
    sits within reduction-order rounding of a 1/255 boundary."""
    tile, zone_hw, channels = 32, (64, 96), [1, 2, 3, 4, 5]
    zone = rng.integers(0, 255, size=(5, *zone_hw)).astype(np.uint8)
    zpath = tmp_path / "zone.tif"
    write_array(zpath, zone, transform=Affine.from_origin(0, 100, 0.2, 0.2),
                crs=2154)
    mf = {"model_provider": "SegmentationModelsPytorch",
          "SegmentationModelsPytorch": {"encoder_decoder": encoder_decoder}}
    model = create_model({"model_framework": mf, "n_classes": 6,
                          "channels": channels})
    params, stats = init_model(model, (1, tile, tile, len(channels)))
    weights = tmp_path / "w.msgpack"
    save_weights_msgpack(weights, params, stats)

    from flairtpu.models import factory
    from flairtpu.zone.engine import run_pipeline

    planes = {}
    for mode in ("inner", "full"):
        if mode == "full":  # force the full-decode + crop fallback
            monkeypatch.setattr(factory, "INNER_DECODE_ARCHS",
                                frozenset({"unet"}))
        cfg = cfgmod.validate_detect_config({
            "output_path": str(tmp_path / f"out_{mode}"),
            "output_name": "smp-ARGMAX-S",
            "input_img_path": str(zpath),
            "channels": channels,
            "img_pixels_detection": tile,
            "margin": tile // 4,
            "output_type": "argmax",
            "n_classes": 6,
            "model_weights": str(weights),
            "model_framework": mf,
            "batch_size": 2,
            "use_gpu": False,
            "num_worker": 1,
            "write_dataframe": False,
            "norma_task": [{"norm_type": "scaling", "norm_means": [],
                            "norm_stds": []}],
        })
        run_pipeline(cfg)
        with TiffReader(Path(cfg["output_path"]) / "smp-ARGMAX-S.tif") as r:
            planes[mode] = (r.read(1), r.read(2))
    np.testing.assert_array_equal(planes["inner"][0], planes["full"][0])
    d = np.abs(planes["inner"][1].astype(np.int16)
               - planes["full"][1].astype(np.int16))
    assert d.max() <= 1 and (d != 0).mean() <= 0.005
