"""bn_fold (float BN-fold zone inference) — drift bounds + e2e + config.

The folded walk reuses the int8 path's fold/walk machinery
(models/quantize.py) with float weights in the compute dtype; on CPU the
compute dtype is f32 so folding is pure algebra and agreement with the
BN-module path is rounding-level. On-chip (bf16) throughput:
PERFORMANCE.md round 5 (+28% over the float path, 0.9885 argmax agreement
on random weights at bf16)."""

import numpy as np
import jax.numpy as jnp
import pytest
from pathlib import Path

from flairtpu import config as cfgmod
from flairtpu.config import ConfigError
from flairtpu.io import TiffReader
from flairtpu.io.tiff import Affine, write_array
from flairtpu.models.factory import create_model, init_model
from flairtpu.models.fold import fold_model
from flairtpu.train.checkpoints import save_weights_msgpack


def _model(rng, encoder_decoder="resnet18_unet", n_classes=6, size=64):
    mf = {"model_provider": "SegmentationModelsPytorch",
          "SegmentationModelsPytorch": {"encoder_decoder": encoder_decoder}}
    model = create_model({"model_framework": mf, "n_classes": n_classes,
                          "channels": [1, 2, 3, 4, 5]})
    params, stats = init_model(model, (1, size, size, 5), seed=3)
    # randomize BN stats so folding actually exercises them
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(stats)
    stats = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(rng.uniform(0.5, 1.5, l.shape), l.dtype)
                  for l in leaves])
    return model, params, stats, mf


def test_folded_logits_match_float(rng):
    model, params, stats, _ = _model(rng)
    fm = fold_model(model, params, stats)
    v = {"params": params, "batch_stats": stats}
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 5), dtype=np.float32))
    want = np.asarray(model.apply(v, x, train=False))
    got = np.asarray(fm.apply(v, x, train=False))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_folded_inner_margin_matches_crop(rng):
    model, params, stats, _ = _model(rng)
    fm = fold_model(model, params, stats)
    v = {"params": params, "batch_stats": stats}
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 5), dtype=np.float32))
    m = 16
    full = np.asarray(fm.apply(v, x, train=False))[:, m:48, m:48, :]
    inner = np.asarray(fm.apply(v, x, train=False, inner_margin=m))
    np.testing.assert_allclose(inner, full, atol=1e-5, rtol=1e-5)


def test_folded_non_unet_arch_encoder_only(rng):
    model, params, stats, _ = _model(rng, "resnet18_deeplabv3plus")
    fm = fold_model(model, params, stats)
    v = {"params": params, "batch_stats": stats}
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 5), dtype=np.float32))
    want = np.asarray(model.apply(v, x, train=False))
    got = np.asarray(fm.apply(v, x, train=False))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_fold_rejects_non_resnet_and_metadata(rng):
    mf = {"model_provider": "SegmentationModelsPytorch",
          "SegmentationModelsPytorch": {"encoder_decoder": "vgg11_unet"}}
    model = create_model({"model_framework": mf, "n_classes": 6,
                          "channels": [1, 2, 3]})
    with pytest.raises(ValueError, match="bn_fold"):
        fold_model(model, {}, {})


def _detect_base(tmp_path, rng):
    """Synthesize zone + weights and return a valid detect config dict."""
    model, params, stats, mf = _model(rng)
    weights = tmp_path / "w.msgpack"
    save_weights_msgpack(weights, params, stats)
    zone = rng.integers(0, 255, size=(5, 64, 96)).astype(np.uint8)
    zpath = tmp_path / "zone.tif"
    write_array(zpath, zone, transform=Affine.from_origin(0, 100, 0.2, 0.2),
                crs=2154)
    base = {
        "output_path": str(tmp_path / "out"), "output_name": "f-ARGMAX-S",
        "input_img_path": str(zpath), "channels": [1, 2, 3, 4, 5],
        "img_pixels_detection": 32, "margin": 8, "output_type": "argmax",
        "n_classes": 6, "model_weights": str(weights), "model_framework": mf,
        "batch_size": 2, "use_gpu": False, "num_worker": 1,
        "write_dataframe": False,
        "norma_task": [{"norm_type": "scaling", "norm_means": [],
                        "norm_stds": []}],
    }
    return base


def test_config_validates_bn_fold(tmp_path, rng):
    base = _detect_base(tmp_path, rng)
    cfgmod.validate_detect_config({**base, "bn_fold": True})
    with pytest.raises(ConfigError, match="bn_fold"):
        cfgmod.validate_detect_config({**base, "bn_fold": "yes"})
    bad = {**base, "bn_fold": True,
           "model_framework": {
               "model_provider": "SegmentationModelsPytorch",
               "SegmentationModelsPytorch": {"encoder_decoder": "vgg11_unet"}}}
    with pytest.raises(ConfigError, match="ResNet-family"):
        cfgmod.validate_detect_config(bad)


@pytest.mark.slow
def test_zone_sharded_mesh_bn_fold_agrees(tmp_path, rng, monkeypatch):
    """bn_fold on the multi-chip sharded zone path: FoldedZoneModel's
    folded-weight arrays live OUTSIDE the params tree and reach the
    shard_map program as jit-captured constants — this locks that they
    replicate correctly over the virtual 8-device mesh (verified on the
    CPU mesh; single-process only, like every sharded-zone test)."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs the virtual multi-device mesh")
    monkeypatch.setenv("FLAIRTPU_ZONE_SHARD", "1")
    base = _detect_base(tmp_path, rng)
    from flairtpu.io import TiffReader
    from flairtpu.zone.engine import run_pipeline

    planes = {}
    for mode, extra in (("plain", {}), ("fold", {"bn_fold": True})):
        cfg = cfgmod.validate_detect_config(
            {**base, "output_path": str(tmp_path / f"sh_{mode}"), **extra})
        run_pipeline(cfg)
        with TiffReader(Path(cfg["output_path"]) / "f-ARGMAX-S.tif") as r:
            planes[mode] = r.read(1)
    assert (planes["fold"] == planes["plain"]).mean() >= 0.999


def test_quantize_float_dtype_composition(rng):
    """quantize_model(float_dtype=f32) must be bit-identical to the default
    int8 path (the cast is a no-op), proving the bn_fold composition only
    changes dtypes, never the arithmetic structure."""
    import jax.numpy as jnp

    from flairtpu.models.quantize import quantize_model

    model, params, stats, _ = _model(rng, size=32)
    cfg = {"norma_task": [{"norm_type": "scaling", "norm_means": [],
                           "norm_stds": []}], "int8_decoder": 2}
    calib = [np.random.default_rng(5).integers(
        0, 255, (2, 32, 32, 5)).astype(np.uint8)]
    v = {"params": params, "batch_stats": stats}
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 5), dtype=np.float32))
    q_plain = quantize_model(cfg, model, params, stats, calib)
    q_f32 = quantize_model(cfg, model, params, stats, calib,
                           float_dtype=jnp.float32)
    a = np.asarray(q_plain.apply(v, x, train=False))
    b = np.asarray(q_f32.apply(v, x, train=False))
    np.testing.assert_array_equal(a, b)


def test_zone_e2e_bn_fold_agrees_with_float(tmp_path, rng):
    base = _detect_base(tmp_path, rng)
    from flairtpu.zone.engine import run_pipeline

    planes = {}
    for mode, extra in (("float", {}), ("fold", {"bn_fold": True})):
        cfg = cfgmod.validate_detect_config(
            {**base, "output_path": str(tmp_path / f"out_{mode}"), **extra})
        run_pipeline(cfg)
        with TiffReader(Path(cfg["output_path"]) / "f-ARGMAX-S.tif") as r:
            planes[mode] = (r.read(1), r.read(2))
    # CPU runs the folded walk in f32: agreement should be essentially
    # exact (bf16 drift is an on-chip property, bounded in PERFORMANCE.md)
    agree = (planes["fold"][0] == planes["float"][0]).mean()
    assert agree >= 0.999
    d = np.abs(planes["fold"][1].astype(np.int16)
               - planes["float"][1].astype(np.int16))
    assert d.max() <= 1
