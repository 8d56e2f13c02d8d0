"""Parity tests for the remaining smp architectures: FPN, PSPNet, LinkNet,
DeepLabV3 (non-plus) — Flax vs the smp-topology torch mirrors."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models import convert
from flairtpu.models.factory import FlairSegmentationModel, create_model, init_model
from tests import torch_ref


def _randomize_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


MIRRORS = {
    "fpn": (torch_ref.ResNet34FPN, 7),
    "pspnet": (torch_ref.ResNet34PSPNet, 6),
    "linknet": (torch_ref.ResNet34Linknet, 5),
    "deeplabv3": (torch_ref.ResNet34DeepLabV3, 8),
}


@pytest.fixture(scope="module", params=sorted(MIRRORS))
def arch_and_torch(request):
    arch = request.param
    cls, classes = MIRRORS[arch]
    torch.manual_seed(11)
    return arch, classes, _randomize_bn(cls(in_channels=5, classes=classes))


def test_logit_parity(arch_and_torch, rng):
    arch, classes, tm = arch_and_torch
    x = rng.standard_normal((2, 64, 64, 5), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert.torch_to_flax(convert.normalize_keys(sd))
    fm = FlairSegmentationModel(encoder_name="resnet34", arch=arch,
                                classes=classes, dtype=jnp.float32)
    got = fm.apply(variables, jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)

    assert got.shape == want.shape == (2, classes, 64, 64)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_converter_structure(arch_and_torch):
    arch, classes, tm = arch_and_torch
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert.torch_to_flax(convert.normalize_keys(sd))
    fm = FlairSegmentationModel(encoder_name="resnet34", arch=arch,
                                classes=classes)
    params, stats = init_model(fm, (1, 64, 64, 5))
    problems = convert.validate_against(
        variables, {"params": params, "batch_stats": stats}, strict=False)
    assert problems == []


@pytest.mark.parametrize("ed,arch,enc", [
    ("resnet50_fpn", "fpn", "resnet50"),
    ("resnet18_pspnet", "pspnet", "resnet18"),
    ("resnet34_linknet", "linknet", "resnet34"),
    ("resnet101_deeplabv3", "deeplabv3", "resnet101"),
])
def test_factory_dispatch(ed, arch, enc):
    cfg = {"model_framework": {
        "model_provider": "SegmentationModelsPytorch",
        "SegmentationModelsPytorch": {"encoder_decoder": ed}},
        "n_classes": 19, "channels": [1, 2, 3, 4, 5]}
    m = create_model(cfg)
    assert m.arch == arch and m.encoder_name == enc
    params, stats = init_model(m, (1, 64, 64, 5))
    x = jnp.zeros((1, 64, 64, 5))
    out = m.apply({"params": params, "batch_stats": stats}, x, train=False)
    assert out.shape == (1, 64, 64, 19)


def test_adaptive_pool_matches_torch(rng):
    from flairtpu.models.smp_extra import adaptive_avg_pool

    x = rng.standard_normal((2, 8, 8, 3), dtype=np.float32)
    for size in (1, 2, 3, 6):
        want = torch.nn.AdaptiveAvgPool2d(size)(
            torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()
        got = np.moveaxis(
            np.asarray(adaptive_avg_pool(jnp.asarray(x), (size, size))), -1, 1)
        np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


def test_transpose_conv_matches_torch(rng):
    from flairtpu.models.smp_extra import TorchConvTranspose

    torch.manual_seed(7)
    tconv = torch.nn.ConvTranspose2d(12, 8, kernel_size=4, stride=2, padding=1)
    x = rng.standard_normal((2, 9, 11, 12), dtype=np.float32)
    with torch.no_grad():
        want = tconv(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()

    w = tconv.weight.detach().numpy()  # (I, O, kH, kW)
    kernel = np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()
    mod = TorchConvTranspose(8)
    got = mod.apply({"params": {"kernel": jnp.asarray(kernel),
                                "bias": jnp.asarray(tconv.bias.detach().numpy())}},
                    jnp.asarray(x))
    got = np.moveaxis(np.asarray(got), -1, 1)
    assert got.shape == want.shape == (2, 8, 18, 22)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_resnext50_unet_logit_parity(rng):
    torch.manual_seed(13)
    tm = _randomize_bn(torch_ref.ResNeXt50Unet(in_channels=5, classes=4))
    x = rng.standard_normal((1, 64, 64, 5), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert.torch_to_flax(convert.normalize_keys(sd))
    fm = FlairSegmentationModel(encoder_name="resnext50_32x4d", arch="unet",
                                classes=4, dtype=jnp.float32)
    got = fm.apply(variables, jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)
    assert got.shape == want.shape == (1, 4, 64, 64)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_underscore_encoder_dispatch():
    cfg = {"model_framework": {
        "model_provider": "SegmentationModelsPytorch",
        "SegmentationModelsPytorch": {"encoder_decoder": "resnext50_32x4d_unet"}},
        "n_classes": 19, "channels": [1, 2, 3, 4, 5]}
    m = create_model(cfg)
    assert m.encoder_name == "resnext50_32x4d" and m.arch == "unet"
