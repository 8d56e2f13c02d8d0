"""Flax DeepLabV3+ parity vs the smp-topology torch mirror."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models import convert
from flairtpu.models.factory import FlairSegmentationModel, create_model, init_model
from tests import torch_ref


@pytest.fixture(scope="module")
def torch_dlv3p():
    torch.manual_seed(3)
    m = torch_ref.ResNet34DeepLabV3Plus(in_channels=5, classes=7)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


def test_deeplab_logit_parity(torch_dlv3p, rng):
    x = rng.standard_normal((2, 64, 64, 5), dtype=np.float32)
    with torch.no_grad():
        want = torch_dlv3p(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()

    sd = {k: v.detach().numpy() for k, v in torch_dlv3p.state_dict().items()}
    variables = convert.torch_to_flax(convert.normalize_keys(sd))
    fm = FlairSegmentationModel(encoder_name="resnet34", arch="deeplabv3plus",
                                classes=7, dtype=jnp.float32)
    got = fm.apply(variables, jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)

    assert got.shape == want.shape == (2, 7, 64, 64)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_deeplab_converter_structure(torch_dlv3p):
    sd = {k: v.detach().numpy() for k, v in torch_dlv3p.state_dict().items()}
    variables = convert.torch_to_flax(convert.normalize_keys(sd))
    fm = FlairSegmentationModel(encoder_name="resnet34", arch="deeplabv3plus",
                                classes=7)
    params, stats = init_model(fm, (1, 64, 64, 5))
    problems = convert.validate_against(
        variables, {"params": params, "batch_stats": stats}, strict=False)
    assert problems == []


def test_deeplab_factory_dispatch():
    cfg = {"model_framework": {
        "model_provider": "SegmentationModelsPytorch",
        "SegmentationModelsPytorch": {"encoder_decoder": "resnet50_deeplabv3plus"}},
        "n_classes": 19, "channels": [1, 2, 3, 4, 5]}
    m = create_model(cfg)
    assert m.arch == "deeplabv3plus" and m.encoder_name == "resnet50"
    params, stats = init_model(m, (1, 32, 32, 5))
    x = jnp.zeros((1, 32, 32, 5))
    out = m.apply({"params": params, "batch_stats": stats}, x, train=False)
    assert out.shape == (1, 32, 32, 19)


def test_align_corners_upsample_matches_torch(rng):
    from flairtpu.models.deeplab import upsample_align_corners

    x = rng.standard_normal((2, 7, 9, 3), dtype=np.float32)
    want = torch.nn.UpsamplingBilinear2d(scale_factor=4)(
        torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()
    got = np.moveaxis(np.asarray(upsample_align_corners(jnp.asarray(x), (28, 36))),
                      -1, 1)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


# --- U-Net++ (same mirror-oracle approach) ---

@pytest.fixture(scope="module")
def torch_unetpp():
    torch.manual_seed(5)
    m = torch_ref.ResNet34UnetPlusPlus(in_channels=5, classes=6)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


def test_unetplusplus_logit_parity(torch_unetpp, rng):
    x = rng.standard_normal((2, 64, 64, 5), dtype=np.float32)
    with torch.no_grad():
        want = torch_unetpp(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()

    sd = {k: v.detach().numpy() for k, v in torch_unetpp.state_dict().items()}
    variables = convert.torch_to_flax(convert.normalize_keys(sd))
    fm = FlairSegmentationModel(encoder_name="resnet34", arch="unetplusplus",
                                classes=6, dtype=jnp.float32)
    got = fm.apply(variables, jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)
    assert got.shape == want.shape == (2, 6, 64, 64)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_unetplusplus_converter_structure(torch_unetpp):
    sd = {k: v.detach().numpy() for k, v in torch_unetpp.state_dict().items()}
    variables = convert.torch_to_flax(convert.normalize_keys(sd))
    fm = FlairSegmentationModel(encoder_name="resnet34", arch="unetplusplus",
                                classes=6)
    params, stats = init_model(fm, (1, 64, 64, 5))
    problems = convert.validate_against(
        variables, {"params": params, "batch_stats": stats}, strict=False)
    assert problems == []
