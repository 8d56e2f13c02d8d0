"""int8 PTQ zone path (models/quantize.py): folding, walk parity, e2e."""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flairtpu import config as cfgmod
from flairtpu.config import ConfigError
from flairtpu.data.normalize import normalize_device
from flairtpu.models.factory import create_model, init_model
from flairtpu.models.quantize import (QuantizedZoneModel, _float_conv,
                                      calibrate, fold_encoder, quantize_folded,
                                      quantize_model, walk_features)

NORM = dict(norm_type="scaling", means=(), stds=())


def _model_config(encoder_decoder: str, n_classes: int = 7) -> dict:
    return {
        "model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {"encoder_decoder": encoder_decoder},
        },
        "n_classes": n_classes, "channels": [1, 2, 3, 4, 5],
        "norma_task": [{"norm_type": "scaling", "norm_means": [],
                        "norm_stds": []}],
    }


def _randomize_bn(params, stats, seed=0):
    """Random BN affine + running stats so folding is non-trivial."""
    rng = np.random.default_rng(seed)

    def pp(path, leaf):
        name = path[-1].key
        if name == "scale":
            return jnp.asarray(rng.uniform(0.5, 1.5, leaf.shape), leaf.dtype)
        if name == "bias":
            return jnp.asarray(rng.normal(0.0, 0.3, leaf.shape), leaf.dtype)
        return leaf

    def ps(path, leaf):
        name = path[-1].key
        if name == "mean":
            return jnp.asarray(rng.normal(0.0, 0.5, leaf.shape), leaf.dtype)
        if name == "var":
            return jnp.asarray(rng.uniform(0.5, 2.0, leaf.shape), leaf.dtype)
        return leaf

    return (jax.tree_util.tree_map_with_path(pp, params),
            jax.tree_util.tree_map_with_path(ps, stats))


@pytest.mark.parametrize("spec,arch", [("resnet34", "unet"),
                                       ("resnet50", "fpn")])
def test_float_walk_matches_flax_encoder(spec, arch):
    cfg = _model_config(f"{spec}_{arch}")
    model = create_model(cfg)
    params, stats = init_model(model, (1, 64, 64, 5), seed=3)
    params, stats = _randomize_bn(params, stats, seed=4)

    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 64, 64, 5)),
                    jnp.float32)
    ref = model.apply({"params": params, "batch_stats": stats}, x,
                      method=lambda m, v: m.encoder(v.astype(m.dtype),
                                                    train=False))
    folded = fold_encoder(params, stats)
    got = walk_features(spec, _float_conv(folded, None), x)
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def _quantized_pair(encoder_decoder: str, seed=11):
    cfg = _model_config(encoder_decoder)
    model = create_model(cfg)
    params, stats = init_model(model, (1, 64, 64, 5), seed=seed)
    params, stats = _randomize_bn(params, stats, seed=seed + 1)
    rng = np.random.default_rng(seed + 2)
    calib = [rng.integers(0, 255, (2, 64, 64, 5)).astype(np.uint8)
             for _ in range(2)]
    qmodel = quantize_model(cfg, model, params, stats, calib)
    variables = {"params": params, "batch_stats": stats}
    return model, qmodel, variables, rng


def test_quantized_logits_track_float():
    model, qmodel, variables, rng = _quantized_pair("resnet34_unet")
    x_u8 = rng.integers(0, 255, (2, 64, 64, 5)).astype(np.uint8)
    x = normalize_device(jnp.asarray(x_u8), src_dtype=np.uint8, **NORM)
    ref = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(qmodel.apply(variables, x, train=False))
    assert got.shape == ref.shape
    rel = np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-9)
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert rel < 0.15, f"relative logit error {rel:.3f}"
    assert agree > 0.85, f"argmax agreement {agree:.3f}"


def test_quantized_inner_margin_matches_full_crop():
    _, qmodel, variables, rng = _quantized_pair("resnet34_unet", seed=21)
    x_u8 = rng.integers(0, 255, (1, 64, 64, 5)).astype(np.uint8)
    x = normalize_device(jnp.asarray(x_u8), src_dtype=np.uint8, **NORM)
    m = 16
    full = np.asarray(qmodel.apply(variables, x, train=False))
    inner = np.asarray(qmodel.apply(variables, x, train=False, inner_margin=m))
    np.testing.assert_array_equal(inner, full[:, m:-m, m:-m, :])


def test_float_decoder_walk_matches_flax_decoder():
    """walk_unet_decode with float folded convs == the Flax UnetDecoder,
    both full decode and the inner-margin interval plan."""
    from flairtpu.models.quantize import fold_unet_decoder, walk_unet_decode

    cfg = _model_config("resnet34_unet")
    model = create_model(cfg)
    params, stats = init_model(model, (1, 64, 64, 5), seed=6)
    params, stats = _randomize_bn(params, stats, seed=7)
    variables = {"params": params, "batch_stats": stats}
    x = jnp.asarray(np.random.default_rng(1).normal(0, 1, (2, 64, 64, 5)),
                    jnp.float32)
    feats = model.apply(variables, x,
                        method=lambda m, v: m.encoder(v.astype(m.dtype),
                                                      train=False))
    folded_dec = fold_unet_decoder(params, stats)

    ref_full = model.apply(variables, feats, train=False, method="decode")
    y, off = walk_unet_decode(_float_conv(folded_dec, None), feats, None)
    head = params["segmentation_head"]["conv"]
    got = jax.lax.conv_general_dilated(
        y, head["kernel"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + head["bias"]
    assert off == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_full),
                               rtol=2e-4, atol=2e-4)

    m = 16
    ref_inner = model.apply(variables, feats, train=False, inner_margin=m,
                            method="decode")
    yi, offi = walk_unet_decode(_float_conv(folded_dec, None), feats, m)
    gi = jax.lax.conv_general_dilated(
        yi, head["kernel"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + head["bias"]
    S = x.shape[1]
    gi = gi[:, m - offi : S - m - offi, m - offi : S - m - offi, :]
    np.testing.assert_allclose(np.asarray(gi), np.asarray(ref_inner),
                               rtol=2e-4, atol=2e-4)


def test_decoder_quantization_dispatch():
    """unet quantizes its decoder by default; int8_decoder: false and
    non-unet archs keep the float decoder."""
    model, qmodel, variables, rng = _quantized_pair("resnet34_unet", seed=31)
    assert qmodel.dec_qparams is not None
    assert sorted(qmodel.dec_qparams)[:2] == ["block0/conv1", "block0/conv2"]

    cfg = _model_config("resnet34_unet")
    cfg["int8_decoder"] = False
    m2 = create_model(cfg)
    p2, s2 = init_model(m2, (1, 64, 64, 5), seed=31)
    calib = [rng.integers(0, 255, (2, 64, 64, 5)).astype(np.uint8)]
    q2 = quantize_model(cfg, m2, p2, s2, calib)
    assert q2.dec_qparams is None

    cfg3 = _model_config("resnet50_fpn")
    m3 = create_model(cfg3)
    p3, s3 = init_model(m3, (1, 64, 64, 5), seed=31)
    q3 = quantize_model(cfg3, m3, p3, s3, calib)
    assert q3.dec_qparams is None  # non-unet: float decoder path


def test_decoder_quantization_depth_cutoff():
    """int8_decoder: N quantizes only block0..block{N-1}; the rest stay
    folded-float, and the partially-quantized logits still track float."""
    cfg = _model_config("resnet34_unet")
    cfg["int8_decoder"] = 2
    model = create_model(cfg)
    params, stats = init_model(model, (1, 64, 64, 5), seed=41)
    params, stats = _randomize_bn(params, stats, seed=42)
    rng = np.random.default_rng(43)
    calib = [rng.integers(0, 255, (2, 64, 64, 5)).astype(np.uint8)]
    q = quantize_model(cfg, model, params, stats, calib)
    assert sorted(q.dec_qparams) == ["block0/conv1", "block0/conv2",
                                     "block1/conv1", "block1/conv2"]
    assert sorted(q.dec_folded) == ["block2/conv1", "block2/conv2",
                                    "block3/conv1", "block3/conv2",
                                    "block4/conv1", "block4/conv2"]
    variables = {"params": params, "batch_stats": stats}
    x_u8 = rng.integers(0, 255, (2, 64, 64, 5)).astype(np.uint8)
    x = normalize_device(jnp.asarray(x_u8), src_dtype=np.uint8, **NORM)
    ref = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(q.apply(variables, x, train=False))
    rel = np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-9)
    assert rel < 0.15, f"relative logit error {rel:.3f}"
    # inner-margin consistency holds on the mixed path too
    m = 16
    full = np.asarray(q.apply(variables, x, train=False))
    inner = np.asarray(q.apply(variables, x, train=False, inner_margin=m))
    np.testing.assert_array_equal(inner, full[:, m:-m, m:-m, :])

    from flairtpu.models.quantize import (DEFAULT_DECODER_BLOCKS,
                                          decoder_quant_blocks)
    assert decoder_quant_blocks({}) == DEFAULT_DECODER_BLOCKS
    assert decoder_quant_blocks({"int8_decoder": False}) == 0
    assert decoder_quant_blocks({"int8_decoder": 3}) == 3
    with pytest.raises(ValueError):
        decoder_quant_blocks({"int8_decoder": 7})


def test_quantize_rejections():
    cfg = _model_config("resnet34_unet")
    model = create_model(cfg)
    params, stats = init_model(model, (1, 32, 32, 5), seed=0)
    calib = [np.zeros((1, 32, 32, 5), np.uint8)]
    qmodel = quantize_model(cfg, model, params, stats, calib)
    assert isinstance(qmodel, QuantizedZoneModel)
    with pytest.raises(ValueError, match="inference-only"):
        qmodel.apply({"params": params, "batch_stats": stats},
                     jnp.zeros((1, 32, 32, 5)), train=True)
    # non-resnet encoder
    cfg2 = _model_config("mobilenet_v2_unet")
    model2 = create_model(cfg2)
    with pytest.raises(ValueError, match="ResNet encoder"):
        quantize_model(cfg2, model2, params, stats, calib)


def test_detect_config_quantize_validation(tmp_path):
    img = tmp_path / "z.tif"
    from flairtpu.io.tiff import Affine, write_array

    write_array(img, np.zeros((5, 32, 32), np.uint8),
                transform=Affine.from_origin(0, 10, 0.2, 0.2), crs=2154)
    w = tmp_path / "w.msgpack"
    w.write_bytes(b"")
    base = {
        "output_path": str(tmp_path / "out"), "output_name": "z-ARGMAX-S",
        "input_img_path": str(img), "channels": [1, 2, 3, 4, 5],
        "img_pixels_detection": 32, "margin": 8, "output_type": "argmax",
        "n_classes": 4, "model_weights": str(w),
        "model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {"encoder_decoder": "resnet18_unet"},
        },
        "norma_task": [{"norm_type": "scaling", "norm_means": [],
                        "norm_stds": []}],
    }
    ok = cfgmod.validate_detect_config(dict(base, quantize="int8"))
    assert ok["quantize"] == "int8"
    with pytest.raises(ConfigError, match="only supported value"):
        cfgmod.validate_detect_config(dict(base, quantize="int4"))
    bad = dict(base, quantize="int8")
    bad["model_framework"] = {
        "model_provider": "SegmentationModelsPytorch",
        "SegmentationModelsPytorch": {"encoder_decoder": "vgg16_unet"},
    }
    with pytest.raises(ConfigError, match="ResNet-family"):
        cfgmod.validate_detect_config(bad)


def test_zone_e2e_quantized_agrees_with_float(tmp_path):
    """flair-detect with quantize: int8 — valid raster, high argmax overlap."""
    from flairtpu.io import TiffReader
    from flairtpu.io.tiff import Affine, write_array
    from flairtpu.train.checkpoints import save_weights_msgpack
    from flairtpu.zone.engine import run_pipeline

    n_classes, size, margin = 4, 32, 8
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, size=(5, 70, 90)).astype(np.uint8)
    img_path = tmp_path / "zone_irc.tif"
    write_array(img_path, img, transform=Affine.from_origin(0, 100, 0.2, 0.2),
                crs=2154, blockxsize=64, blockysize=64)
    model = create_model(_model_config("resnet18_unet", n_classes))
    params, stats = init_model(model, (1, size, size, 5), seed=7)
    params, stats = _randomize_bn(params, stats, seed=8)
    weights = tmp_path / "weights.msgpack"
    save_weights_msgpack(weights, params, stats)

    def cfg(**over):
        c = {
            "output_path": str(tmp_path / "out"),
            "output_name": "zone_irc-ARGMAX-S",
            "input_img_path": str(img_path), "channels": [1, 2, 3, 4, 5],
            "img_pixels_detection": size, "margin": margin,
            "output_type": "argmax", "n_classes": n_classes,
            "model_weights": str(weights),
            "model_framework": {
                "model_provider": "SegmentationModelsPytorch",
                "SegmentationModelsPytorch":
                    {"encoder_decoder": "resnet18_unet"},
            },
            "batch_size": 4, "use_gpu": False, "num_worker": 2,
            "write_dataframe": False,
            "norma_task": [{"norm_type": "scaling", "norm_means": [],
                            "norm_stds": []}],
        }
        c.update(over)
        return cfgmod.validate_detect_config(c)

    run_pipeline(cfg())
    run_pipeline(cfg(quantize="int8", output_name="zone_irc-ARGMAX-S-q"))
    with TiffReader(Path(tmp_path, "out", "zone_irc-ARGMAX-S.tif")) as r:
        ref = r.read([1, 2])
    with TiffReader(Path(tmp_path, "out", "zone_irc-ARGMAX-S-q.tif")) as r:
        got = r.read([1, 2])
    assert got.shape == ref.shape
    assert (got[1] > 0).all()  # every pixel written
    agree = (got[0] == ref[0]).mean()
    assert agree > 0.8, f"argmax agreement {agree:.3f}"
