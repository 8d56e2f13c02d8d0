"""mobileone_s0..s4 smp encoders: Flax vs torch-mirror parity (training-mode
branch topology), paper-pinned fused sizes, converter structure, factory
e2e."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models import convert
from flairtpu.models.factory import (FlairSegmentationModel, create_model,
                                     init_model)
from flairtpu.models.mobileone import MobileOneEncoder, mobileone_out_channels
from tests import torch_ref_mobileone as tmo


def _randomize_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


def test_out_channels_match_smp():
    # smp/encoders/mobileone.py published out_channels
    want = {
        "mobileone_s0": (3, 48, 48, 128, 256, 1024),
        "mobileone_s1": (3, 64, 96, 192, 512, 1280),
        "mobileone_s2": (3, 64, 96, 256, 640, 2048),
        "mobileone_s3": (3, 64, 128, 320, 768, 2048),
        "mobileone_s4": (3, 64, 192, 448, 896, 2048),
    }
    for name, chans in want.items():
        assert mobileone_out_channels(name) == chans
        assert MobileOneEncoder(name_spec=name).out_channels == chans


def test_fused_param_totals_match_paper():
    """Reparameterized (inference) sizes incl. the 1000-way fc equal the
    MobileOne paper's published totals (arXiv:2206.04040 Table 4:
    2.1 / 4.8 / 7.8 / 10.1 / 14.8 M) — pins widths, block plan and SE."""
    want = {"mobileone_s0": 2.08, "mobileone_s1": 4.76, "mobileone_s2": 7.81,
            "mobileone_s3": 10.08, "mobileone_s4": 14.84}
    for name, total_m in want.items():
        enc = tmo.MobileOneEncoderTorch(name)
        fc = mobileone_out_channels(name)[-1] * 1000 + 1000
        got = (enc.fused_param_count() + fc) / 1e6
        assert abs(got - total_m) < 0.01, (name, got)


CASES = {
    "mobileone_s0_unet": (
        lambda: tmo.MobileOneUnet("mobileone_s0", 5, classes=6),
        "mobileone_s0", "unet", 64, 5),
    "mobileone_s1_unet": (
        lambda: tmo.MobileOneUnet("mobileone_s1", 4, classes=6),
        "mobileone_s1", "unet", 64, 4),
    "mobileone_s4_fpn": (
        lambda: tmo.MobileOneFPN("mobileone_s4", classes=6),
        "mobileone_s4", "fpn", 64, 3),
    "mobileone_s0_deeplabv3plus": (
        lambda: tmo.MobileOneDeepLabV3Plus("mobileone_s0", classes=6),
        "mobileone_s0", "deeplabv3plus", 64, 3),
}


@pytest.fixture(scope="module", params=sorted(CASES))
def case(request):
    builder, enc, arch, size, in_ch = CASES[request.param]
    torch.manual_seed(37)
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
            "encoder_decoder": "mobileone_s0_unet"}},
        "n_classes": 5, "channels": [1, 2, 3]}
    m = create_model(cfg)
    params, stats = init_model(m, (1, 64, 64, 3))
    out = m.apply({"params": params, "batch_stats": stats},
                  jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 5)


def test_train_step(rng):
    """mobileone_s4_unet trains through the jitted step (branch sums, bare-BN
    skip branches and SE all receive gradients and batch-stat updates)."""
    import jax

    from flairtpu.train.loop import SegmentationTrainer

    config = {
        "model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {
                "encoder_decoder": "mobileone_s4_unet"}},
        "use_metadata": False, "use_augmentation": True, "use_weights": True,
        "channels": [1, 2, 3], "norm_type": "scaling",
        "norm_means": [], "norm_stds": [],
        "classes": {i: [1, f"c{i}"] for i in range(1, 5)},
        "batch_size": 2, "learning_rate": 0.01, "seed": 0,
    }
    t = SegmentationTrainer(config)
    step = t.train_step()
    batch = {"img": rng.integers(0, 255, size=(2, 64, 64, 3)).astype(np.uint8),
             "msk": rng.integers(0, 4, size=(2, 64, 64)).astype(np.int32)}
    img, msk, mtd = t._put(batch)
    p, s, o, loss, cm, _ = step(t.params, t.batch_stats, t.opt_state,
                                img, msk, mtd, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert np.asarray(cm).sum() == 2 * 64 * 64
