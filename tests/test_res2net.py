"""timm-res2net/res2next smp encoders: Flax vs torch-mirror parity,
converter structure, factory e2e, dilated rejection (deviation #16
family)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models import convert
from flairtpu.models.factory import (FlairSegmentationModel, create_model,
                                     init_model)
from flairtpu.models.res2net import RES2NET_SPECS, Res2NetEncoder
from tests import torch_ref_res2net as tr2


def _randomize_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


@pytest.mark.parametrize("name", sorted(RES2NET_SPECS))
def test_out_channels_match_smp(name):
    # smp/encoders/timm_res2net.py: all variants share the resnet50 table
    assert Res2NetEncoder(name_spec=name).out_channels == (
        3, 64, 256, 512, 1024, 2048)


CASES = {
    "timm-res2net50_26w_4s_unet": (
        lambda: tr2.Res2NetUnet("timm-res2net50_26w_4s", 5, classes=6),
        "timm-res2net50_26w_4s", "unet", 64, 5),
    "timm-res2net50_48w_2s_unet": (
        lambda: tr2.Res2NetUnet("timm-res2net50_48w_2s", 4, classes=6),
        "timm-res2net50_48w_2s", "unet", 64, 4),
    "timm-res2net50_14w_8s_unet": (
        lambda: tr2.Res2NetUnet("timm-res2net50_14w_8s", 3, classes=6),
        "timm-res2net50_14w_8s", "unet", 64, 3),
    "timm-res2next50_fpn": (
        lambda: tr2.Res2NetFPN("timm-res2next50", classes=6),
        "timm-res2next50", "fpn", 64, 3),
}


@pytest.fixture(scope="module", params=sorted(CASES))
def case(request):
    builder, enc, arch, size, in_ch = CASES[request.param]
    torch.manual_seed(17)
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
            "encoder_decoder": "timm-res2net50_26w_4s_unet"}},
        "n_classes": 5, "channels": [1, 2, 3]}
    m = create_model(cfg)
    params, stats = init_model(m, (1, 64, 64, 3))
    out = m.apply({"params": params, "batch_stats": stats},
                  jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 5)


@pytest.mark.parametrize("name", ["timm-res2net50_26w_4s_deeplabv3",
                                  "timm-res2next50_pan"])
def test_dilated_archs_rejected(name):
    from flairtpu.models import registry

    with pytest.raises(ValueError, match="dilated"):
        registry.check_smp(name)
