"""timm-regnet smp encoders: generated stage tables vs the paper's
published widths, Flax vs torch-mirror parity (X and Y flavors), converter
structure, factory e2e."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models import convert
from flairtpu.models.factory import (FlairSegmentationModel, create_model,
                                     init_model)
from flairtpu.models.regnet import (REGNET_SPECS, RegNetEncoder,
                                    regnet_stages)
from tests import torch_ref_regnet as trg


def _randomize_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


# the paper's stage-width tables (Radosavovic et al. 2020, Tables), which
# smp's published out_channels reproduce as (3, 32, *widths)
PAPER_WIDTHS = {
    "timm-regnetx_002": ([24, 56, 152, 368], [1, 1, 4, 7]),
    "timm-regnetx_016": ([72, 168, 408, 912], [2, 4, 10, 2]),
    "timm-regnetx_064": ([168, 392, 784, 1624], [2, 4, 10, 1]),
    "timm-regnetx_160": ([256, 512, 896, 2048], [2, 6, 13, 1]),
    "timm-regnetx_320": ([336, 672, 1344, 2520], [2, 7, 13, 1]),
    "timm-regnety_002": ([24, 56, 152, 368], [1, 1, 4, 7]),
    "timm-regnety_016": ([48, 120, 336, 888], [2, 6, 17, 2]),
    "timm-regnety_064": ([144, 288, 576, 1296], [2, 7, 14, 2]),
    "timm-regnety_160": ([224, 448, 1232, 3024], [2, 4, 11, 1]),
    "timm-regnety_320": ([232, 696, 1392, 3712], [2, 5, 12, 1]),
}


@pytest.mark.parametrize("name", sorted(PAPER_WIDTHS))
def test_generated_stages_match_paper(name):
    sw, sd, _ = regnet_stages(name)
    assert (sw, sd) == PAPER_WIDTHS[name]


@pytest.mark.parametrize("name", sorted(REGNET_SPECS))
def test_depths_sum_and_out_channels(name):
    sw, sd, groups = regnet_stages(name)
    assert sum(sd) == REGNET_SPECS[name][4]
    assert all(w % g == 0 for w, g in zip(sw, groups))
    assert RegNetEncoder(name_spec=name).out_channels == (3, 32) + tuple(sw)


CASES = {
    "timm-regnetx_002_unet": (
        lambda: trg.RegNetUnet("timm-regnetx_002", 5, classes=6),
        "timm-regnetx_002", "unet", 64, 5),
    "timm-regnety_002_unet": (
        lambda: trg.RegNetUnet("timm-regnety_002", 4, classes=6),
        "timm-regnety_002", "unet", 64, 4),
    "timm-regnety_016_unet": (
        lambda: trg.RegNetUnet("timm-regnety_016", 3, classes=6),
        "timm-regnety_016", "unet", 64, 3),
    "timm-regnetx_008_fpn": (
        lambda: trg.RegNetFPN("timm-regnetx_008", classes=6),
        "timm-regnetx_008", "fpn", 64, 3),
}


@pytest.fixture(scope="module", params=sorted(CASES))
def case(request):
    builder, enc, arch, size, in_ch = CASES[request.param]
    torch.manual_seed(29)
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
            "encoder_decoder": "timm-regnety_002_unet"}},
        "n_classes": 5, "channels": [1, 2, 3]}
    m = create_model(cfg)
    params, stats = init_model(m, (1, 64, 64, 3))
    out = m.apply({"params": params, "batch_stats": stats},
                  jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 5)
