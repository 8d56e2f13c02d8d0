"""Flax MobileViT/MobileNetV2 segmentation parity vs transformers (torch)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models.mobilevit import (MOBILEVIT_SPECS, MobileViTSeg,
                                       hf_mobilevit_torch_to_flax)

TINY = dict(neck=(8, 16, 16, 24, 32, 40, 160), hidden=(32, 40, 48),
            expand_ratio=2.0)
MOBILEVIT_SPECS["tiny-test"] = TINY


def _torch_mobilevit(output_stride: int, n_classes: int = 7):
    from transformers import MobileViTConfig, MobileViTForSemanticSegmentation

    torch.manual_seed(0)
    cfg = MobileViTConfig(
        num_channels=5, image_size=64,
        hidden_sizes=list(TINY["hidden"]),
        neck_hidden_sizes=list(TINY["neck"]),
        expand_ratio=TINY["expand_ratio"],
        num_attention_heads=4, output_stride=output_stride,
        aspp_out_channels=32, num_labels=n_classes,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        aspp_dropout_prob=0.0, classifier_dropout_prob=0.0,
    )
    m = MobileViTForSemanticSegmentation(cfg)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.8, 1.2)
    m.eval()
    return m


@pytest.mark.parametrize("output_stride", [16, 8, 32])
def test_mobilevit_logit_parity(output_stride, rng):
    tm = _torch_mobilevit(output_stride)
    x = rng.standard_normal((1, 64, 64, 5), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).logits.numpy()

    variables = hf_mobilevit_torch_to_flax(
        {k: v.numpy() for k, v in tm.state_dict().items()})
    model = MobileViTSeg(spec="tiny-test", classes=7,
                         output_stride=output_stride, aspp_channels=32)
    got = model.apply(variables, jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)

    assert want.shape == (1, 7, 64 // output_stride, 64 // output_stride)
    assert got.shape == (1, 7, 64, 64)
    want_up = torch.nn.functional.interpolate(
        torch.from_numpy(want), size=(64, 64), mode="bilinear",
        align_corners=False).numpy()
    np.testing.assert_allclose(got, want_up, atol=5e-4, rtol=1e-3)


def test_mobilevit_nondivisible_input(rng):
    """48x80 at os=16 gives a 3x5 map -> unfold must resize to 4x6 and back."""
    tm = _torch_mobilevit(16)
    x = rng.standard_normal((2, 48, 80, 5), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).logits.numpy()
    variables = hf_mobilevit_torch_to_flax(
        {k: v.numpy() for k, v in tm.state_dict().items()})
    model = MobileViTSeg(spec="tiny-test", classes=7, output_stride=16,
                         aspp_channels=32)
    got = model.apply(variables, jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)
    want_up = torch.nn.functional.interpolate(
        torch.from_numpy(want), size=(48, 80), mode="bilinear",
        align_corners=False).numpy()
    np.testing.assert_allclose(got, want_up, atol=5e-4, rtol=1e-3)


def _torch_mobilenet_v2(output_stride: int, depth_multiplier: float = 1.0,
                        n_classes: int = 7):
    from transformers import (MobileNetV2Config,
                              MobileNetV2ForSemanticSegmentation)

    torch.manual_seed(0)
    cfg = MobileNetV2Config(
        num_channels=5, image_size=64, depth_multiplier=depth_multiplier,
        output_stride=output_stride, num_labels=n_classes,
        classifier_dropout_prob=0.0,
    )
    m = MobileNetV2ForSemanticSegmentation(cfg)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.8, 1.2)
    m.eval()
    return m


@pytest.mark.parametrize("output_stride,dm", [(8, 1.0), (16, 1.0), (32, 0.5)])
def test_mobilenet_v2_logit_parity(output_stride, dm, rng):
    from flairtpu.models.mobilenet_v2 import (MobileNetV2Seg,
                                              hf_mobilenet_v2_torch_to_flax)

    tm = _torch_mobilenet_v2(output_stride, dm)
    x = rng.standard_normal((1, 64, 64, 5), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).logits.numpy()

    variables = hf_mobilenet_v2_torch_to_flax(
        {k: v.numpy() for k, v in tm.state_dict().items()})
    model = MobileNetV2Seg(classes=7, depth_multiplier=dm,
                           output_stride=output_stride)
    got = model.apply(variables, jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)

    assert want.shape == (1, 7, 64 // output_stride, 64 // output_stride)
    want_up = torch.nn.functional.interpolate(
        torch.from_numpy(want), size=(64, 64), mode="bilinear",
        align_corners=False).numpy()
    np.testing.assert_allclose(got, want_up, atol=5e-4, rtol=1e-3)


def test_mobilenet_v2_dispatch():
    from flairtpu.models.convert import any_state_dict_to_flax
    from flairtpu.models.factory import create_model
    from flairtpu.models.mobilenet_v2 import (MobileNetV2Seg,
                                              hf_mobilenet_v2_torch_to_flax)

    tm = _torch_mobilenet_v2(8)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    got = any_state_dict_to_flax(sd)
    want = hf_mobilenet_v2_torch_to_flax(dict(sd))
    assert set(got["params"]) == set(want["params"])

    cfg = {"model_framework": {
        "model_provider": "HuggingFace",
        "HuggingFace": {"org_model": "google/deeplabv3_mobilenet_v2_1.0_513"}},
        "n_classes": 5, "channels": [1, 2, 3]}
    m = create_model(cfg)
    assert isinstance(m, MobileNetV2Seg)
    assert m.depth_multiplier == 1.0 and m.classes == 5


def test_mobilevit_dispatch(rng):
    """Production converter dispatch + factory name parsing."""
    from flairtpu.models.convert import any_state_dict_to_flax
    from flairtpu.models.factory import create_model

    tm = _torch_mobilevit(16)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    got = any_state_dict_to_flax(sd)
    want = hf_mobilevit_torch_to_flax(dict(sd))
    assert set(got["params"]) == set(want["params"])

    cfg = {"model_framework": {
        "model_provider": "HuggingFace",
        "HuggingFace": {"org_model": "apple/deeplabv3-mobilevit-x-small"}},
        "n_classes": 5, "channels": [1, 2, 3]}
    m = create_model(cfg)
    assert isinstance(m, MobileViTSeg)
    assert m.spec == "x-small" and m.classes == 5
