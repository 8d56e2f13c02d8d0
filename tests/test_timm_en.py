"""timm-efficientnet smp encoders: Flax vs torch-mirror parity, converter
structure, out_channels cross-check against smp's published table, factory
e2e. Covers the native flavor (b0/b4), the tf_ lite flavor (dynamic SAME
padding, ReLU6, no SE), fpn, and the os-16 dilated deeplabv3plus path.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models import convert
from flairtpu.models.factory import (FlairSegmentationModel, create_model,
                                     init_model)
from flairtpu.models.timm_efficientnet import (TIMM_EFFICIENTNET_SPECS,
                                               TimmEfficientNetEncoder)
from tests import torch_ref_timm_en as ttn


def _randomize_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


# smp/encoders/timm_efficientnet.py published out_channels
SMP_OUT_CHANNELS = {
    "timm-efficientnet-b0": (3, 32, 24, 40, 112, 320),
    "timm-efficientnet-b1": (3, 32, 24, 40, 112, 320),
    "timm-efficientnet-b2": (3, 32, 24, 48, 120, 352),
    "timm-efficientnet-b3": (3, 40, 32, 48, 136, 384),
    "timm-efficientnet-b4": (3, 48, 32, 56, 160, 448),
    "timm-efficientnet-b5": (3, 48, 40, 64, 176, 512),
    "timm-efficientnet-b6": (3, 56, 40, 72, 200, 576),
    "timm-efficientnet-b7": (3, 64, 48, 80, 224, 640),
    "timm-efficientnet-b8": (3, 72, 56, 88, 248, 704),
    "timm-efficientnet-l2": (3, 136, 104, 176, 480, 1376),
    "timm-tf_efficientnet_lite0": (3, 32, 24, 40, 112, 320),
    "timm-tf_efficientnet_lite1": (3, 32, 24, 40, 112, 320),
    "timm-tf_efficientnet_lite2": (3, 32, 24, 48, 120, 352),
    "timm-tf_efficientnet_lite3": (3, 32, 32, 48, 136, 384),
    "timm-tf_efficientnet_lite4": (3, 32, 32, 56, 160, 448),
}


@pytest.mark.parametrize("name", sorted(TIMM_EFFICIENTNET_SPECS))
def test_out_channels_match_smp(name):
    assert TimmEfficientNetEncoder(
        name_spec=name).out_channels == SMP_OUT_CHANNELS[name]
    assert (3,) + ttn.timm_en_out_channels(name) == SMP_OUT_CHANNELS[name]


CASES = {
    "timm-efficientnet-b0_unet": (
        lambda: ttn.TimmENUnet("timm-efficientnet-b0", 5, classes=6),
        "timm-efficientnet-b0", "unet", 64, 5),
    "timm-efficientnet-b4_unet": (
        lambda: ttn.TimmENUnet("timm-efficientnet-b4", 4, classes=6),
        "timm-efficientnet-b4", "unet", 64, 4),
    "timm-tf_efficientnet_lite0_unet": (
        lambda: ttn.TimmENUnet("timm-tf_efficientnet_lite0", 5, classes=6),
        "timm-tf_efficientnet_lite0", "unet", 64, 5),
    "timm-efficientnet-b0_fpn": (
        lambda: ttn.TimmENFPN("timm-efficientnet-b0", classes=6),
        "timm-efficientnet-b0", "fpn", 64, 3),
    "timm-efficientnet-b0_deeplabv3plus": (
        lambda: ttn.TimmENDeepLabV3Plus("timm-efficientnet-b0", classes=6),
        "timm-efficientnet-b0", "deeplabv3plus", 64, 3),
    "timm-tf_efficientnet_lite1_deeplabv3plus": (
        lambda: ttn.TimmENDeepLabV3Plus("timm-tf_efficientnet_lite1",
                                        classes=6),
        "timm-tf_efficientnet_lite1", "deeplabv3plus", 64, 3),
}


@pytest.fixture(scope="module", params=sorted(CASES))
def case(request):
    builder, enc, arch, size, in_ch = CASES[request.param]
    torch.manual_seed(11)
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
            "encoder_decoder": "timm-efficientnet-b0_unet"}},
        "n_classes": 5, "channels": [1, 2, 3]}
    m = create_model(cfg)
    params, stats = init_model(m, (1, 64, 64, 3))
    out = m.apply({"params": params, "batch_stats": stats},
                  jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 5)
