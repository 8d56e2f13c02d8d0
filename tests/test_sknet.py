"""timm-sknet smp encoders: Flax vs torch-mirror parity, converter
structure, factory e2e."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models import convert
from flairtpu.models.factory import (FlairSegmentationModel, create_model,
                                     init_model)
from flairtpu.models.sknet import SKNET_SPECS, SKNetEncoder
from tests import torch_ref_sknet as tsk


def _randomize_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


def test_out_channels_match_smp():
    # smp/encoders/timm_sknet.py published values
    assert SKNetEncoder(name_spec="timm-skresnet18").out_channels == (
        3, 64, 64, 128, 256, 512)
    assert SKNetEncoder(name_spec="timm-skresnet34").out_channels == (
        3, 64, 64, 128, 256, 512)
    assert SKNetEncoder(
        name_spec="timm-skresnext50_32x4d").out_channels == (
        3, 64, 256, 512, 1024, 2048)


CASES = {
    "timm-skresnet18_unet": (
        lambda: tsk.SKNetUnet("timm-skresnet18", 5, classes=6),
        "timm-skresnet18", "unet", 64, 5),
    "timm-skresnet34_unet": (
        lambda: tsk.SKNetUnet("timm-skresnet34", 4, classes=6),
        "timm-skresnet34", "unet", 64, 4),
    "timm-skresnext50_32x4d_unet": (
        lambda: tsk.SKNetUnet("timm-skresnext50_32x4d", 3, classes=6),
        "timm-skresnext50_32x4d", "unet", 64, 3),
    "timm-skresnet18_fpn": (
        lambda: tsk.SKNetFPN("timm-skresnet18", classes=6),
        "timm-skresnet18", "fpn", 64, 3),
}


@pytest.fixture(scope="module", params=sorted(CASES))
def case(request):
    builder, enc, arch, size, in_ch = CASES[request.param]
    torch.manual_seed(23)
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
            "encoder_decoder": "timm-skresnet18_unet"}},
        "n_classes": 5, "channels": [1, 2, 3]}
    m = create_model(cfg)
    params, stats = init_model(m, (1, 64, 64, 3))
    out = m.apply({"params": params, "batch_stats": stats},
                  jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 5)
