"""inception smp encoders (inceptionv4, inceptionresnetv2): Flax vs
torch-mirror parity, converter structure, out_channels cross-check against
smp's published values, factory e2e, dilated-mode rejection.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models import convert
from flairtpu.models.inception import (InceptionResNetV2Encoder,
                                       InceptionV4Encoder)
from flairtpu.models.factory import (FlairSegmentationModel, create_model,
                                     init_model)
from tests import torch_ref_inception as tin


def _randomize_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


def test_out_channels_match_smp():
    # smp/encoders/inceptionv4.py / inceptionresnetv2.py published values
    assert InceptionV4Encoder().out_channels == (3, 64, 192, 384, 1024, 1536)
    assert InceptionResNetV2Encoder().out_channels == (
        3, 64, 192, 320, 1088, 1536)
    assert (3,) + tin.INCEPTIONV4_OUT == (3, 64, 192, 384, 1024, 1536)
    assert (3,) + tin.INCEPTIONRESNETV2_OUT == (3, 64, 192, 320, 1088, 1536)


CASES = {
    "inceptionv4_unet": (
        lambda: tin.InceptionUnet("inceptionv4", 5, classes=6),
        "inceptionv4", "unet", 64, 5),
    "inceptionresnetv2_unet": (
        lambda: tin.InceptionUnet("inceptionresnetv2", 5, classes=6),
        "inceptionresnetv2", "unet", 64, 5),
    "inceptionv4_fpn": (
        lambda: tin.InceptionFPN("inceptionv4", classes=6),
        "inceptionv4", "fpn", 64, 3),
    "inceptionresnetv2_pspnet": (
        lambda: tin.InceptionPSPNet("inceptionresnetv2", classes=6),
        "inceptionresnetv2", "pspnet", 64, 3),
}


@pytest.fixture(scope="module", params=sorted(CASES))
def case(request):
    builder, enc, arch, size, in_ch = CASES[request.param]
    torch.manual_seed(7)
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
        "SegmentationModelsPytorch": {"encoder_decoder": "inceptionv4_unet"}},
        "n_classes": 5, "channels": [1, 2, 3]}
    m = create_model(cfg)
    params, stats = init_model(m, (1, 64, 64, 3))
    out = m.apply({"params": params, "batch_stats": stats},
                  jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 5)


@pytest.mark.parametrize("name", ["inceptionv4_deeplabv3plus",
                                  "inceptionresnetv2_pan"])
def test_dilated_archs_rejected(name):
    # smp make_dilated raises for both inception encoders
    from flairtpu.models import registry

    with pytest.raises(ValueError, match="dilated"):
        registry.check_smp(name)
