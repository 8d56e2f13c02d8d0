"""timm-gernet smp encoders: Flax vs torch-mirror parity, converter
structure, factory e2e (the last smp 0.3.3 encoder family)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models import convert
from flairtpu.models.factory import (FlairSegmentationModel, create_model,
                                     init_model)
from flairtpu.models.gernet import GERNET_SPECS, GERNetEncoder
from tests import torch_ref_gernet as tg


def _randomize_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


def test_out_channels_match_smp():
    # smp/encoders/timm_gernet.py published values
    assert GERNetEncoder(name_spec="timm-gernet_s").out_channels == (
        3, 13, 48, 48, 384, 1920)
    assert GERNetEncoder(name_spec="timm-gernet_m").out_channels == (
        3, 32, 128, 192, 640, 2560)
    assert GERNetEncoder(name_spec="timm-gernet_l").out_channels == (
        3, 32, 128, 192, 640, 2560)


def test_param_counts_match_genet_paper():
    """Independent oracle for the cfg tables: encoder + 1000-way fc param
    totals equal the GENet paper's published model sizes (arXiv:2006.14090:
    8.17M / 21.1M / 31.0M) — pins depths/widths/ratios/groups without timm."""
    want = {"timm-gernet_s": 8.17, "timm-gernet_m": 21.14,
            "timm-gernet_l": 31.08}
    for name, total_m in want.items():
        enc = tg.GERNetEncoderTorch(name, in_channels=3)
        n = sum(p.numel() for p in enc.parameters())
        fc = GERNET_SPECS[name][2] * 1000 + 1000
        assert abs((n + fc) / 1e6 - total_m) < 0.01, (name, (n + fc) / 1e6)


CASES = {
    "timm-gernet_s_unet": (
        lambda: tg.GERNetUnet("timm-gernet_s", 5, classes=6),
        "timm-gernet_s", "unet", 64, 5),
    "timm-gernet_m_unet": (
        lambda: tg.GERNetUnet("timm-gernet_m", 4, classes=6),
        "timm-gernet_m", "unet", 64, 4),
    "timm-gernet_l_fpn": (
        lambda: tg.GERNetFPN("timm-gernet_l", classes=6),
        "timm-gernet_l", "fpn", 64, 3),
    "timm-gernet_s_deeplabv3plus": (
        lambda: tg.GERNetDeepLabV3Plus("timm-gernet_s", classes=6),
        "timm-gernet_s", "deeplabv3plus", 64, 3),
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
            "encoder_decoder": "timm-gernet_s_unet"}},
        "n_classes": 5, "channels": [1, 2, 3]}
    m = create_model(cfg)
    params, stats = init_model(m, (1, 64, 64, 3))
    out = m.apply({"params": params, "batch_stats": stats},
                  jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 5)


def test_train_step(rng):
    """timm-gernet_s_unet trains through the jitted step (depthwise br=3
    bottlenecks + BN stats through every branch)."""
    import jax

    from flairtpu.train.loop import SegmentationTrainer

    config = {
        "model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {
                "encoder_decoder": "timm-gernet_s_unet"}},
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
