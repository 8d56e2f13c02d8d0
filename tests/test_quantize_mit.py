"""int8 PTQ for the MiT attention family (models/quantize_mit.py).

The float-site walk must reproduce the Flax MiTSmpEncoder exactly (parity
locked through decode), int8 drift is bounded, the inner-margin plan is
preserved, and config validation admits mit_b* for quantize but rejects
bn_fold alone. On-chip numbers: PERFORMANCE.md round 5."""

import numpy as np
import jax.numpy as jnp
import pytest

from flairtpu import config as cfgmod
from flairtpu.config import ConfigError
from flairtpu.models.factory import create_model, init_model
from flairtpu.models.quantize import quantize_model
from flairtpu.models.quantize_mit import float_sites, walk_mit_features


def _mit_model(n_classes=6, size=64):
    mf = {"model_provider": "SegmentationModelsPytorch",
          "SegmentationModelsPytorch": {"encoder_decoder": "mit_b0_unet"}}
    cfg = {"model_framework": mf, "n_classes": n_classes,
           "channels": [1, 2, 3],
           "norma_task": [{"norm_type": "scaling", "norm_means": [],
                           "norm_stds": []}]}
    model = create_model(cfg)
    params, stats = init_model(model, (1, size, size, 3), seed=7)
    return model, params, stats, cfg


def test_float_walk_parity(rng):
    """walk_mit_features with float sites -> decode must equal the Flax
    model's full forward exactly (same ops, same order)."""
    model, params, stats, _ = _mit_model()
    v = {"params": params, "batch_stats": stats}
    x = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3))
                    .astype(np.float32) / 255.0)
    want = np.asarray(model.apply(v, x, train=False))
    dense_fn, conv_fn = float_sites(None, jnp.float32)
    feats = walk_mit_features("mit_b0", dense_fn, conv_fn,
                              params["encoder"], x, dtype=jnp.float32)
    got = np.asarray(model.apply(v, feats, train=False, method="decode"))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_int8_drift_bounded(rng):
    model, params, stats, cfg = _mit_model()
    v = {"params": params, "batch_stats": stats}
    calib = [rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
             for _ in range(2)]
    q = quantize_model({**cfg, "int8_decoder": 2}, model, params, stats,
                       calib)
    x = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3))
                    .astype(np.float32) / 255.0)
    want = np.asarray(model.apply(v, x, train=False))
    got = np.asarray(q.apply(v, x, train=False))
    assert (got.argmax(-1) == want.argmax(-1)).mean() > 0.9
    assert np.abs(got - want).max() < 0.1

    # inner-margin decode agrees with full + crop on the quantized path
    inner = np.asarray(q.apply(v, x, train=False, inner_margin=16))
    np.testing.assert_allclose(inner, got[:, 16:48, 16:48, :],
                               atol=1e-5, rtol=1e-5)


def test_quantized_sites_are_the_attention_matmuls(rng):
    model, params, stats, cfg = _mit_model()
    calib = [rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)]
    q = quantize_model(cfg, model, params, stats, calib)
    sites = set(q.qparams)
    # qkv/proj/mlp denses + embed/sr convs quantized; dwconv never
    assert "block0_0/attn/query" in sites
    assert "block0_0/attn/out" in sites
    assert "block0_0/mlp/dense1" in sites
    assert "block0_0/mlp/dense2" in sites
    assert "embed0/proj" in sites
    assert "block0_0/attn/sr" in sites
    assert not any(s.endswith("dwconv") for s in sites)
    for c in q.qparams.values():
        assert c["wq"].dtype == jnp.int8


def test_config_admits_mit_quantize_rejects_fold(tmp_path, rng):
    from flairtpu.io.tiff import Affine, write_array
    from flairtpu.train.checkpoints import save_weights_msgpack

    model, params, stats, _ = _mit_model()
    weights = tmp_path / "w.msgpack"
    save_weights_msgpack(weights, params, stats)
    zone = rng.integers(0, 255, size=(3, 64, 96)).astype(np.uint8)
    zpath = tmp_path / "zone.tif"
    write_array(zpath, zone, transform=Affine.from_origin(0, 100, 0.2, 0.2),
                crs=2154)
    base = {
        "output_path": str(tmp_path / "out"), "output_name": "q-ARGMAX-S",
        "input_img_path": str(zpath), "channels": [1, 2, 3],
        "img_pixels_detection": 32, "margin": 8, "output_type": "argmax",
        "n_classes": 6, "model_weights": str(weights),
        "model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {"encoder_decoder": "mit_b0_unet"}},
        "batch_size": 2, "use_gpu": False, "num_worker": 1,
        "write_dataframe": False,
        "norma_task": [{"norm_type": "scaling", "norm_means": [],
                        "norm_stds": []}],
    }
    cfgmod.validate_detect_config({**base, "quantize": "int8"})
    cfgmod.validate_detect_config(
        {**base, "quantize": "int8", "bn_fold": True})  # dtype-only compose
    with pytest.raises(ConfigError, match="bn_fold"):
        cfgmod.validate_detect_config({**base, "bn_fold": True})
