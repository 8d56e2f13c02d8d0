"""timm-resnest smp encoders: Flax vs torch-mirror parity (incl. the radix-4
and radix-1/sigmoid variants), converter structure, out_channels cross-check
against smp's published values, factory e2e, dilated rejection (deviation
#16)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models import convert
from flairtpu.models.factory import (FlairSegmentationModel, create_model,
                                     init_model)
from flairtpu.models.resnest import RESNEST_SPECS, ResNestEncoder
from tests import torch_ref_resnest as trn


def _randomize_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


# smp/encoders/timm_resnest.py published out_channels
SMP_OUT_CHANNELS = {
    "timm-resnest14d": (3, 64, 256, 512, 1024, 2048),
    "timm-resnest26d": (3, 64, 256, 512, 1024, 2048),
    "timm-resnest50d": (3, 64, 256, 512, 1024, 2048),
    "timm-resnest101e": (3, 128, 256, 512, 1024, 2048),
    "timm-resnest200e": (3, 128, 256, 512, 1024, 2048),
    "timm-resnest269e": (3, 128, 256, 512, 1024, 2048),
    "timm-resnest50d_4s2x40d": (3, 64, 256, 512, 1024, 2048),
    "timm-resnest50d_1s4x24d": (3, 64, 256, 512, 1024, 2048),
}


@pytest.mark.parametrize("name", sorted(RESNEST_SPECS))
def test_out_channels_match_smp(name):
    assert ResNestEncoder(name_spec=name).out_channels == SMP_OUT_CHANNELS[name]
    assert (3,) + trn.resnest_out_channels(name) == SMP_OUT_CHANNELS[name]


CASES = {
    "timm-resnest14d_unet": (
        lambda: trn.ResNestUnet("timm-resnest14d", 5, classes=6),
        "timm-resnest14d", "unet", 64, 5),
    "timm-resnest26d_unet": (
        lambda: trn.ResNestUnet("timm-resnest26d", 4, classes=6),
        "timm-resnest26d", "unet", 64, 4),
    "timm-resnest50d_4s2x40d_unet": (
        lambda: trn.ResNestUnet("timm-resnest50d_4s2x40d", 3, classes=6),
        "timm-resnest50d_4s2x40d", "unet", 64, 3),
    "timm-resnest50d_1s4x24d_unet": (
        lambda: trn.ResNestUnet("timm-resnest50d_1s4x24d", 3, classes=6),
        "timm-resnest50d_1s4x24d", "unet", 64, 3),
    "timm-resnest14d_fpn": (
        lambda: trn.ResNestFPN("timm-resnest14d", classes=6),
        "timm-resnest14d", "fpn", 64, 3),
    "timm-resnest101e_pspnet": (
        lambda: trn.ResNestPSPNet("timm-resnest101e", classes=6),
        "timm-resnest101e", "pspnet", 64, 3),
}


@pytest.fixture(scope="module", params=sorted(CASES))
def case(request):
    builder, enc, arch, size, in_ch = CASES[request.param]
    torch.manual_seed(13)
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
            "encoder_decoder": "timm-resnest14d_unet"}},
        "n_classes": 5, "channels": [1, 2, 3]}
    m = create_model(cfg)
    params, stats = init_model(m, (1, 64, 64, 3))
    out = m.apply({"params": params, "batch_stats": stats},
                  jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 5)


@pytest.mark.parametrize("name", ["timm-resnest14d_deeplabv3plus",
                                  "timm-resnest50d_pan"])
def test_dilated_archs_rejected(name):
    from flairtpu.models import registry

    with pytest.raises(ValueError, match="dilated"):
        registry.check_smp(name)
