"""jax.export serving artifacts: export -> serialize -> deserialize -> call."""

import numpy as np
import jax.numpy as jnp

from flairtpu.serving import build_forward, export_model, load_exported

CFG = {
    "model_framework": {
        "model_provider": "SegmentationModelsPytorch",
        "SegmentationModelsPytorch": {"encoder_decoder": "resnet18_unet"},
    },
    "n_classes": 5,
    "channels": [1, 2, 3, 4, 5],
    "img_pixels_detection": 32,
    "batch_size": 2,
    "norma_task": [{"norm_type": "scaling", "norm_means": [], "norm_stds": []}],
}


def test_export_roundtrip_logits(tmp_path, rng):
    out = export_model(CFG, tmp_path / "model.stablehlo", dtype=jnp.float32)
    assert out.stat().st_size > 1000
    fn = load_exported(out)
    x = rng.integers(0, 255, size=(2, 32, 32, 5)).astype(np.uint8)
    got = np.asarray(fn(x))
    assert got.shape == (2, 32, 32, 5) and got.dtype == np.float32

    direct, _ = build_forward(CFG, dtype=jnp.float32)
    want = np.asarray(direct(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_export_argmax_payload(tmp_path, rng):
    out = export_model(CFG, tmp_path / "m.stablehlo", payload="argmax",
                       margin=8, dtype=jnp.float32)
    fn = load_exported(out)
    x = rng.integers(0, 255, size=(2, 32, 32, 5)).astype(np.uint8)
    cls, prob = fn(x)
    cls, prob = np.asarray(cls), np.asarray(prob)
    assert cls.shape == prob.shape == (2, 16, 16)
    assert cls.dtype == prob.dtype == np.uint8
    assert cls.max() < 5


def test_export_cli(tmp_path):
    import yaml

    from flairtpu.tools import main as tools_main

    conf = tmp_path / "c.yaml"
    conf.write_text(yaml.safe_dump(CFG))
    out = tmp_path / "m.stablehlo"
    tools_main(["export-model", "--conf", str(conf), "--out", str(out)])
    assert out.exists() and out.stat().st_size > 1000


def test_export_new_archs(tmp_path, rng):
    """The round-3 additions (manet, efficientnet encoder) export through
    the same jax.export path."""
    for ed in ("resnet18_manet", "efficientnet-b0_unet"):
        cfg = dict(CFG, model_framework={
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {"encoder_decoder": ed}})
        out = export_model(cfg, tmp_path / f"{ed}.stablehlo",
                           dtype=jnp.float32)
        fn = load_exported(out)
        x = rng.integers(0, 255, size=(2, 32, 32, 5)).astype(np.uint8)
        assert np.asarray(fn(x)).shape == (2, 32, 32, 5)
