"""Config-time model-name validation (flairtpu/models/registry.py).

Locks two properties:
1. validate_*_config rejects model names the factory cannot build (the
   reference only errors at smp/transformers construction time,
   src/flair/model.py:35-50).
2. The registry and the factory agree: every name the registry accepts
   builds, every name it rejects raises in the factory too.
"""

import pytest

from flairtpu import config as cfgmod
from flairtpu.models import registry


def _train_cfg(provider, name):
    mf = {"model_provider": provider}
    if provider == "SegmentationModelsPytorch":
        mf["SegmentationModelsPytorch"] = {"encoder_decoder": name}
    else:
        mf["HuggingFace"] = {"org_model": name}
    return {
        "paths": {}, "tasks": {}, "model_framework": mf,
        "channels": [1, 2, 3], "norm_type": "scaling",
        "classes": {i: [1, f"c{i}"] for i in range(1, 14)},
    }


def test_config_rejects_unported_names():
    for provider, name in [
        ("SegmentationModelsPytorch", "timm-gernet_xl_unet"),
        ("SegmentationModelsPytorch", "tu-convnext_base_unet"),
        ("SegmentationModelsPytorch", "resnet34_frobnicate"),
        ("SegmentationModelsPytorch", "nonsense"),
        ("HuggingFace", "Intel/dpt-giant-ade"),
        ("HuggingFace", "facebook/mask2former-ade-semantic"),
        # encoder/arch incompatibilities (smp make_dilated errors)
        ("SegmentationModelsPytorch", "vgg11_deeplabv3"),
        ("SegmentationModelsPytorch", "densenet121_pan"),
    ]:
        with pytest.raises(cfgmod.ConfigError):
            cfgmod.validate_train_config(_train_cfg(provider, name))


def test_config_accepts_ported_names():
    for provider, name in [
        ("SegmentationModelsPytorch", "resnet34_unet"),
        ("SegmentationModelsPytorch", "resnext50_32x4d_deeplabv3plus"),
        ("SegmentationModelsPytorch", "mobilenet_v2_pan"),
        ("SegmentationModelsPytorch", "vgg16_unet"),
        ("SegmentationModelsPytorch", "densenet169_fpn"),
        ("SegmentationModelsPytorch", "dpn68_unet"),
        ("SegmentationModelsPytorch", "dpn92_deeplabv3plus"),
        ("SegmentationModelsPytorch", "timm-efficientnet-b0_unet"),
        ("SegmentationModelsPytorch", "timm-resnest14d_unet"),
        ("HuggingFace", "nvidia/segformer-b2-finetuned-ade-512-512"),
        ("HuggingFace", "openmmlab/upernet-swin-tiny"),
        ("HuggingFace", "microsoft/beit-base-finetuned-ade-640-640"),
        ("HuggingFace", "Intel/dpt-large-ade"),
        ("HuggingFace", "apple/deeplabv3-mobilevit-small"),
        ("HuggingFace", "google/deeplabv3_mobilenet_v2_1.0_513"),
    ]:
        cfgmod.validate_train_config(_train_cfg(provider, name))


def test_detect_config_validates_model_name(tmp_path):
    import numpy as np

    from flairtpu.io.tiff import write_array

    zone = tmp_path / "zone.tif"
    write_array(zone, np.zeros((3, 64, 64), np.uint8))
    weights = tmp_path / "w.pth"
    weights.write_bytes(b"")
    cfg = {
        "output_path": str(tmp_path), "input_img_path": str(zone),
        "channels": [1, 2, 3], "img_pixels_detection": 32, "margin": 4,
        "output_type": "argmax", "n_classes": 13,
        "norma_task": [{"norm_type": "scaling"}],
        "model_weights": str(weights),
        "model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {"encoder_decoder": "timm-resnest14d_pan"},
        },
    }
    with pytest.raises(cfgmod.ConfigError):
        cfgmod.validate_detect_config(cfg)


def test_registry_factory_agree_smp():
    """Every (encoder, arch) pair the registry accepts must build."""
    from flairtpu.models.factory import create_model

    # one encoder per block family x every arch keeps this cheap while
    # covering the whole dispatch table
    for encoder in ("resnet34", "resnet50"):
        for arch in registry.SMP_ARCHS:
            name = f"{encoder}_{arch}"
            registry.check_smp(name)
            m = create_model(_train_cfg("SegmentationModelsPytorch", name))
            assert m is not None
    # timm-gernet (the historically last unported family) now dispatches
    registry.check_smp("timm-gernet_m_unet")
    assert create_model(_train_cfg("SegmentationModelsPytorch",
                                   "timm-gernet_m_unet")) is not None
    with pytest.raises(NotImplementedError):
        registry.check_smp("timm-gernet_xl_unet")
    # smp's 'tu-' timm-universal prefix: targeted error with a suggestion
    # when the wrapped model has a natively-registered equivalent
    with pytest.raises(NotImplementedError, match="timm-universal"):
        registry.check_smp("tu-convnext_base_unet")
    with pytest.raises(NotImplementedError,
                       match="did you mean 'timm-resnest14d'"):
        registry.check_smp("tu-resnest14d_unet")
    with pytest.raises(NotImplementedError, match="did you mean 'resnet34'"):
        registry.check_smp("tu-resnet34_unet")
    # vgg/densenet reject the dilated archs in the factory too (via check_smp)
    with pytest.raises(ValueError, match="dilated"):
        create_model(_train_cfg("SegmentationModelsPytorch", "vgg11_deeplabv3"))


@pytest.mark.slow
def test_every_registered_encoder_dispatches():
    """Full-surface smoke: every SMP encoder string traces a unet forward
    to the right logit shape (jax.eval_shape: whole graph exercised
    abstractly, no params materialized, no compute)."""
    import jax
    import jax.numpy as jnp

    from flairtpu.models.factory import create_model

    x = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    for encoder in registry.SMP_ENCODERS:
        m = create_model(_train_cfg("SegmentationModelsPytorch",
                                    f"{encoder}_unet"))
        out, _ = jax.eval_shape(
            lambda xx, mm=m: mm.init_with_output(
                jax.random.PRNGKey(0), xx, train=False), x)
        assert out.shape == (1, 64, 64, 13), (encoder, out.shape)


@pytest.mark.slow
def test_every_hf_family_size_dispatches():
    """Full HF-surface smoke: every registered org-model size traces a
    forward to the right logit shape (eval_shape, no params/compute)."""
    import jax
    import jax.numpy as jnp

    from flairtpu.models.factory import create_model

    names = (
        [f"nvidia/segformer-b{i}-finetuned-ade-512-512" for i in range(6)]
        + [f"openmmlab/upernet-swin-{s}"
           for s in ("tiny", "small", "base", "large")]
        + [f"openmmlab/upernet-convnext-{s}"
           for s in ("tiny", "small", "base", "large", "xlarge")]
        + ["microsoft/beit-base-finetuned-ade-640-640",
           "microsoft/beit-large-finetuned-ade-640-640",
           "facebook/data2vec-vision-base-ft1k",
           "facebook/data2vec-vision-large-ft1k",
           "Intel/dpt-base", "Intel/dpt-large-ade", "Intel/dpt-hybrid-midas"]
        + [f"apple/deeplabv3-mobilevit-{s}"
           for s in ("small", "x-small", "xx-small")]
        + [f"apple/mobilevitv2-{w}-imagenet1k-256"
           for w in ("0.5", "1.0", "2.0")]
        + ["google/deeplabv3_mobilenet_v2_1.0_513",
           "google/deeplabv3_mobilenet_v2_1.4_513"])
    x = jax.ShapeDtypeStruct((1, 128, 128, 3), jnp.float32)
    for name in names:
        family, _ = registry.hf_family(name)
        assert family in registry.HF_FAMILIES, name
        m = create_model(_train_cfg("HuggingFace", name))
        out, _ = jax.eval_shape(
            lambda xx, mm=m: mm.init_with_output(
                jax.random.PRNGKey(0), xx, train=False), x)
        assert out.shape == (1, 128, 128, 13), (name, out.shape)


def test_registry_factory_agree_hf():
    from flairtpu.models.factory import create_model

    good = [
        "nvidia/mit-b0", "openmmlab/upernet-convnext-tiny",
        "facebook/data2vec-vision-large-ft1k", "Intel/dpt-base",
        "Intel/dpt-hybrid-midas",
        "apple/deeplabv3-mobilevit-xx-small",
        "google/deeplabv3_mobilenet_v2_1.4_513",
    ]
    for name in good:
        family, spec = registry.hf_family(name)
        assert family in registry.HF_FAMILIES
        m = create_model(_train_cfg("HuggingFace", name))
        assert m is not None
    bad = ["openmmlab/upernet-beit-giant", "Intel/dpt-giant",
           "some/unknown-model"]
    for name in bad:
        with pytest.raises(NotImplementedError):
            registry.hf_family(name)
        with pytest.raises(NotImplementedError):
            create_model(_train_cfg("HuggingFace", name))


def test_hf_families_cover_installed_transformers_registry():
    """Live-oracle completeness guard: the installed transformers'
    AutoModelForSemanticSegmentation registry contains exactly the model
    types flairtpu ports (upernet = the swin/convnext backbones the
    published openmmlab checkpoints use). A transformers upgrade that adds
    a new seg family fails here instead of silently shrinking coverage."""
    from transformers.models.auto.modeling_auto import (
        MODEL_FOR_SEMANTIC_SEGMENTATION_MAPPING_NAMES as NAMES)

    assert set(NAMES) == {"beit", "data2vec-vision", "dpt", "mobilenet_v2",
                          "mobilevit", "mobilevitv2", "segformer", "upernet"}


def test_unknown_ckpt_monitor_raises(tmp_path):
    """fit() fails fast on a monitor that will never be logged
    (train/loop.py; the reference's Lightning raises the same way)."""
    from flairtpu.train.loop import fit

    cfg = _train_cfg("SegmentationModelsPytorch", "resnet34_unet")
    cfg.update({"batch_size": 2, "ckpt_monitor": "val_lass"})
    with pytest.raises(ValueError, match="ckpt_monitor"):
        fit(cfg, {}, {}, tmp_path)
