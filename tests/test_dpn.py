"""dpn smp encoders: Flax vs torch-mirror parity, converter structure,
width-formula cross-check against smp's published out_channels, factory e2e.

Covers full-stride (unet incl. the dpn68b "b" flavor and the large dpn92),
depth-3 (pspnet), os-16 dilated (deeplabv3plus), and fpn.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models import convert
from flairtpu.models.dpn import DPN_SPECS, DPNEncoder
from flairtpu.models.factory import FlairSegmentationModel, create_model, init_model
from tests import torch_ref_dpn as tdp


def _randomize_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


# smp/encoders/dpn.py published out_channels — the width formula in both the
# Flax encoder and the torch mirror must reproduce these exactly
SMP_OUT_CHANNELS = {
    "dpn68": (3, 10, 144, 320, 704, 832),
    "dpn68b": (3, 10, 144, 320, 704, 832),
    "dpn92": (3, 64, 336, 704, 1552, 2688),
    "dpn98": (3, 96, 336, 768, 1728, 2688),
    "dpn107": (3, 128, 376, 1152, 2432, 2688),
    "dpn131": (3, 128, 352, 832, 1984, 2688),
}


@pytest.mark.parametrize("name", sorted(DPN_SPECS))
def test_width_formula_matches_smp(name):
    assert DPNEncoder(name_spec=name).out_channels == SMP_OUT_CHANNELS[name]
    assert (3,) + tdp.dpn_out_channels(name) == SMP_OUT_CHANNELS[name]


CASES = {
    "dpn68_unet": (lambda: tdp.DPNUnet("dpn68", 5, classes=6), "dpn68",
                   "unet", 64, 5),
    "dpn68b_unet": (lambda: tdp.DPNUnet("dpn68b", 5, classes=6), "dpn68b",
                    "unet", 64, 5),
    "dpn92_unet": (lambda: tdp.DPNUnet("dpn92", 5, classes=6), "dpn92",
                   "unet", 64, 5),
    "dpn68_fpn": (lambda: tdp.DPNFPN("dpn68", classes=6), "dpn68",
                  "fpn", 64, 3),
    "dpn68_pspnet": (lambda: tdp.DPNPSPNet("dpn68", classes=6), "dpn68",
                     "pspnet", 64, 3),
    "dpn68_deeplabv3plus": (lambda: tdp.DPNDeepLabV3Plus("dpn68", classes=6),
                            "dpn68", "deeplabv3plus", 64, 3),
}


@pytest.fixture(scope="module", params=sorted(CASES))
def case(request):
    builder, enc, arch, size, in_ch = CASES[request.param]
    torch.manual_seed(5)
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
        "SegmentationModelsPytorch": {"encoder_decoder": "dpn68_unet"}},
        "n_classes": 5, "channels": [1, 2, 3]}
    m = create_model(cfg)
    params, stats = init_model(m, (1, 64, 64, 3))
    out = m.apply({"params": params, "batch_stats": stats},
                  jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 5)
