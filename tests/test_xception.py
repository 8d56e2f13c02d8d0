"""xception smp encoder: Flax vs torch-mirror parity, converter structure,
registry compat rules, factory e2e.

Covers full-stride (unet/fpn), depth-3 (pspnet), and the smp behavior that
xception REJECTS the dilated archs (registry mirrors smp's make_dilated
ValueError). Quirks locked: block1's missing leading relu, block12's
grow-last separable, no relu after residual adds or after bn4.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models import convert
from flairtpu.models.factory import FlairSegmentationModel, create_model, init_model
from flairtpu.models.registry import check_smp
from flairtpu.models.xception import xception_rep_layout
from tests import torch_ref_ptm as tpm


def _randomize_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


CASES = {
    "xception_unet": (lambda: tpm.XceptionUnet(5, classes=6), "unet", 64),
    "xception_fpn": (lambda: tpm.XceptionFPN(5, classes=6), "fpn", 64),
    "xception_pspnet": (lambda: tpm.XceptionPSPNet(5, classes=6), "pspnet", 64),
}


@pytest.fixture(scope="module", params=sorted(CASES))
def case(request):
    builder, arch, size = CASES[request.param]
    torch.manual_seed(7)
    tm = _randomize_bn(builder())
    return arch, size, tm


def test_logit_parity(case, rng):
    arch, size, tm = case
    x = rng.standard_normal((2, size, size, 5), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert.torch_to_flax(convert.normalize_keys(sd))
    fm = FlairSegmentationModel(encoder_name="xception", arch=arch, classes=6,
                                dtype=jnp.float32)
    got = fm.apply(variables, jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)

    assert got.shape == want.shape == (2, 6, size, size)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_converter_structure(case):
    arch, size, tm = case
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert.torch_to_flax(convert.normalize_keys(sd))
    fm = FlairSegmentationModel(encoder_name="xception", arch=arch, classes=6)
    params, stats = init_model(fm, (1, size, size, 5))
    problems = convert.validate_against(
        variables, {"params": params, "batch_stats": stats}, strict=False)
    assert problems == []


def test_rep_layout_matches_torch_indices():
    """rep{j} names line up with pretrainedmodels' Sequential positions."""
    # block1: start_with_relu=False -> sep at 0, 3; bn at 1, 4
    l1 = xception_rep_layout(64, 128, 2, False, True)
    assert [e[0] for e in l1] == ["sep", "bn", "relu", "sep", "bn"]
    # middle blocks: reps=3 -> sep at 1, 4, 7
    lm = xception_rep_layout(728, 728, 3, True, True)
    assert [e[0] for e in lm] == ["relu", "sep", "bn"] * 3
    # block12: grow_first=False -> the LAST sep grows 728->1024
    l12 = xception_rep_layout(728, 1024, 2, True, False)
    assert l12[1] == ("sep", 728, 728) and l12[4] == ("sep", 728, 1024)


@pytest.mark.parametrize("encoder_decoder", [
    "xception_deeplabv3", "xception_deeplabv3plus", "xception_pan"])
def test_no_dilation_archs_rejected(encoder_decoder):
    with pytest.raises(ValueError, match="dilated"):
        check_smp(encoder_decoder)


def test_factory_dispatch_and_forward():
    cfg = {"model_framework": {
        "model_provider": "SegmentationModelsPytorch",
        "SegmentationModelsPytorch": {"encoder_decoder": "xception_unet"}},
        "n_classes": 5, "channels": [1, 2, 3]}
    m = create_model(cfg)
    params, stats = init_model(m, (1, 64, 64, 3))
    out = m.apply({"params": params, "batch_stats": stats},
                  jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 5)
