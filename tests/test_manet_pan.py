"""Parity tests for the MAnet and PAN smp architectures — Flax vs the
smp-topology torch mirrors (tests/torch_ref.py), completing all 9 smp archs.
"""

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


# PAN's FPA pyramid max-pools the stride-16 map three times, so it needs
# inputs >= 128^2; MAnet runs full-stride and 64^2 suffices
MIRRORS = {
    "manet": (torch_ref.ResNet34MAnet, 7, 64),
    "pan": (torch_ref.ResNet34PAN, 5, 128),
}


@pytest.fixture(scope="module", params=sorted(MIRRORS))
def arch_and_torch(request):
    arch = request.param
    cls, classes, size = MIRRORS[arch]
    torch.manual_seed(7)
    return arch, classes, size, _randomize_bn(cls(in_channels=5, classes=classes))


def test_logit_parity(arch_and_torch, rng):
    arch, classes, size, tm = arch_and_torch
    x = rng.standard_normal((2, size, size, 5), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert.torch_to_flax(convert.normalize_keys(sd))
    fm = FlairSegmentationModel(encoder_name="resnet34", arch=arch,
                                classes=classes, dtype=jnp.float32)
    got = fm.apply(variables, jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)

    assert got.shape == want.shape == (2, classes, size, size)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_converter_structure(arch_and_torch):
    arch, classes, size, tm = arch_and_torch
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert.torch_to_flax(convert.normalize_keys(sd))
    fm = FlairSegmentationModel(encoder_name="resnet34", arch=arch,
                                classes=classes)
    params, stats = init_model(fm, (1, size, size, 5))
    problems = convert.validate_against(
        variables, {"params": params, "batch_stats": stats}, strict=False)
    assert problems == []


@pytest.mark.parametrize("ed,arch,enc,size", [
    ("resnet34_manet", "manet", "resnet34", 64),
    ("resnet50_pan", "pan", "resnet50", 128),
])
def test_factory_dispatch(ed, arch, enc, size):
    cfg = {"model_framework": {
        "model_provider": "SegmentationModelsPytorch",
        "SegmentationModelsPytorch": {"encoder_decoder": ed}},
        "n_classes": 19, "channels": [1, 2, 3, 4, 5]}
    m = create_model(cfg)
    assert m.arch == arch and m.encoder_name == enc
    params, stats = init_model(m, (1, size, size, 5))
    out = m.apply({"params": params, "batch_stats": stats},
                  jnp.zeros((1, size, size, 5)), train=False)
    assert out.shape == (1, size, size, 19)


def test_pan_encoder_resolution_chain():
    """PAN runs its encoder at output_stride 16 (smp hardcodes it), making
    gau3 a same-resolution merge; lock the feature-stride chain."""
    from flairtpu.models.resnet import ResNetEncoder

    enc = ResNetEncoder(name_spec="resnet34", output_stride=16)
    import jax

    variables = jax.jit(lambda rng, x: enc.init(rng, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    feats = enc.apply(variables, jnp.zeros((1, 128, 128, 3)), train=False)
    assert [f.shape[1] for f in feats] == [128, 64, 32, 16, 8, 8]
