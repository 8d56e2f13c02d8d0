"""timm-mobilenetv3 smp encoders: Flax vs torch-mirror parity (large/small,
width 0.75, minimal), converter structure, out_channels cross-check against
smp's published table, os-16 dilated deeplabv3plus, factory e2e."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models import convert
from flairtpu.models.factory import (FlairSegmentationModel, create_model,
                                     init_model)
from flairtpu.models.timm_mobilenetv3 import (TIMM_MOBILENETV3_SPECS,
                                              TimmMobileNetV3Encoder)
from tests import torch_ref_timm_mnv3 as tm3


def _randomize_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


# smp/encoders/timm_mobilenetv3.py _get_channels published values
SMP_OUT_CHANNELS = {
    "timm-mobilenetv3_large_100": (3, 16, 24, 40, 112, 960),
    "timm-mobilenetv3_large_075": (3, 16, 24, 32, 88, 720),
    "timm-mobilenetv3_large_minimal_100": (3, 16, 24, 40, 112, 960),
    "timm-mobilenetv3_small_100": (3, 16, 16, 24, 48, 576),
    "timm-mobilenetv3_small_075": (3, 16, 16, 24, 40, 432),
    "timm-mobilenetv3_small_minimal_100": (3, 16, 16, 24, 48, 576),
}


@pytest.mark.parametrize("name", sorted(TIMM_MOBILENETV3_SPECS))
def test_out_channels_match_smp(name):
    assert TimmMobileNetV3Encoder(
        name_spec=name).out_channels == SMP_OUT_CHANNELS[name]
    assert (3,) + tm3.mnv3_out_channels(name) == SMP_OUT_CHANNELS[name]


CASES = {
    "timm-mobilenetv3_large_100_unet": (
        lambda: tm3.MNV3Unet("timm-mobilenetv3_large_100", 5, classes=6),
        "timm-mobilenetv3_large_100", "unet", 64, 5),
    "timm-mobilenetv3_small_075_unet": (
        lambda: tm3.MNV3Unet("timm-mobilenetv3_small_075", 4, classes=6),
        "timm-mobilenetv3_small_075", "unet", 64, 4),
    "timm-mobilenetv3_large_minimal_100_unet": (
        lambda: tm3.MNV3Unet("timm-mobilenetv3_large_minimal_100", 3,
                             classes=6),
        "timm-mobilenetv3_large_minimal_100", "unet", 64, 3),
    "timm-mobilenetv3_small_100_fpn": (
        lambda: tm3.MNV3FPN("timm-mobilenetv3_small_100", classes=6),
        "timm-mobilenetv3_small_100", "fpn", 64, 3),
    "timm-mobilenetv3_large_100_deeplabv3plus": (
        lambda: tm3.MNV3DeepLabV3Plus("timm-mobilenetv3_large_100",
                                      classes=6),
        "timm-mobilenetv3_large_100", "deeplabv3plus", 64, 3),
}


@pytest.fixture(scope="module", params=sorted(CASES))
def case(request):
    builder, enc, arch, size, in_ch = CASES[request.param]
    torch.manual_seed(19)
    tm = _randomize_bn(builder())
    return enc, arch, size, in_ch, tm


def test_logit_parity(case, rng):
    enc, arch, size, in_ch, tm = case
    x = rng.standard_normal((2, size, size, in_ch), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert.torch_to_flax(convert.normalize_keys(sd))
    fm = FlairSegmentationModel(encoder_name=enc, arch=arch, classes=6,
                                dtype=jnp.float32)
    got = fm.apply(variables, jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)

    assert got.shape == want.shape == (2, 6, size, size)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_converter_structure(case):
    enc, arch, size, in_ch, tm = case
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert.torch_to_flax(convert.normalize_keys(sd))
    fm = FlairSegmentationModel(encoder_name=enc, arch=arch, classes=6)
    params, stats = init_model(fm, (1, size, size, in_ch))
    problems = convert.validate_against(
        variables, {"params": params, "batch_stats": stats}, strict=False)
    assert problems == []


def test_factory_dispatch_and_forward():
    cfg = {"model_framework": {
        "model_provider": "SegmentationModelsPytorch",
        "SegmentationModelsPytorch": {
            "encoder_decoder": "timm-mobilenetv3_large_100_unet"}},
        "n_classes": 5, "channels": [1, 2, 3]}
    m = create_model(cfg)
    params, stats = init_model(m, (1, 64, 64, 3))
    out = m.apply({"params": params, "batch_stats": stats},
                  jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 5)
