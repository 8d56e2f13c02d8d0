"""senet smp encoders (se_resnet/se_resnext/senet154): Flax vs torch-mirror
parity, converter structure, registry, factory e2e.

Covers full-stride (unet/fpn), depth-3 (pspnet), dilated output-stride 16
(deeplabv3plus) and the pretrainedmodels quirks: stride-on-conv1
(SEResNetBottleneck), ceil-mode stem pool, senet154's 3x3 stem triplet and
3x3 downsample convs.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models import convert
from flairtpu.models.factory import FlairSegmentationModel, create_model, init_model
from flairtpu.models.registry import check_smp
from flairtpu.models.senet import SENET_SPECS, max_pool_3x3_s2_ceil
from tests import torch_ref_senet as tsn


def _randomize_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


CASES = {
    # id -> (mirror builder, encoder, arch, input size)
    "se_resnet50_unet": (lambda: tsn.SENetUnet("se_resnet50", 5, classes=6),
                         "se_resnet50", "unet", 64),
    "se_resnext50_unet": (lambda: tsn.SENetUnet("se_resnext50_32x4d", 5,
                                                classes=6),
                          "se_resnext50_32x4d", "unet", 64),
    "senet154_unet": (lambda: tsn.SENetUnet("senet154", 5, classes=6),
                      "senet154", "unet", 64),
    "se_resnext50_fpn": (lambda: tsn.SENetFPN("se_resnext50_32x4d", 5,
                                              classes=6),
                         "se_resnext50_32x4d", "fpn", 64),
    "se_resnet50_pspnet": (lambda: tsn.SENetPSPNet("se_resnet50", 5,
                                                   classes=6),
                           "se_resnet50", "pspnet", 64),
    "se_resnet50_deeplabv3plus": (lambda: tsn.SENetDeepLabV3Plus(
        "se_resnet50", 5, classes=6),
        "se_resnet50", "deeplabv3plus", 64),
}


@pytest.fixture(scope="module", params=sorted(CASES))
def case(request):
    builder, enc, arch, size = CASES[request.param]
    torch.manual_seed(7)
    tm = _randomize_bn(builder())
    return enc, arch, size, tm


def test_logit_parity(case, rng):
    enc, arch, size, tm = case
    x = rng.standard_normal((2, size, size, 5), dtype=np.float32)
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
    enc, arch, size, tm = case
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert.torch_to_flax(convert.normalize_keys(sd))
    fm = FlairSegmentationModel(encoder_name=enc, arch=arch, classes=6)
    params, stats = init_model(fm, (1, size, size, 5))
    problems = convert.validate_against(
        variables, {"params": params, "batch_stats": stats}, strict=False)
    assert problems == []


@pytest.mark.parametrize("h", [64, 63, 61, 50])
def test_ceil_mode_pool_matches_torch(h, rng):
    """reduce_window with (0,1) right-pad == MaxPool2d(3,2,ceil_mode=True)
    for even and odd sizes."""
    x = rng.standard_normal((1, h, h, 3), dtype=np.float32)
    want = torch.nn.functional.max_pool2d(
        torch.from_numpy(np.moveaxis(x, -1, 1).copy()), 3, 2,
        ceil_mode=True).numpy()
    got = np.moveaxis(np.asarray(max_pool_3x3_s2_ceil(jnp.asarray(x))), -1, 1)
    np.testing.assert_array_equal(got, want)


def test_out_channels_match_smp():
    """smp's published out_channels tables for the senet family."""
    from flairtpu.models.senet import SENetEncoder

    smp_table = {
        "senet154": (0, 128, 256, 512, 1024, 2048),
        "se_resnet50": (0, 64, 256, 512, 1024, 2048),
        "se_resnext101_32x4d": (0, 64, 256, 512, 1024, 2048),
    }
    for name, want in smp_table.items():
        assert SENetEncoder(name_spec=name).out_channels == want, name


@pytest.mark.parametrize("encoder_decoder", [
    "se_resnet101_unet", "se_resnext101_32x4d_deeplabv3", "senet154_pan",
    "se_resnet152_linknet"])
def test_registry_accepts(encoder_decoder):
    enc, arch = check_smp(encoder_decoder)
    assert encoder_decoder == f"{enc}_{arch}"
    assert enc in SENET_SPECS


def test_factory_dispatch_and_forward():
    cfg = {"model_framework": {
        "model_provider": "SegmentationModelsPytorch",
        "SegmentationModelsPytorch": {"encoder_decoder": "se_resnet50_unet"}},
        "n_classes": 5, "channels": [1, 2, 3]}
    m = create_model(cfg)
    params, stats = init_model(m, (1, 64, 64, 3))
    out = m.apply({"params": params, "batch_stats": stats},
                  jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 5)


def test_train_step():
    """se_resnext50_32x4d_unet trains through the jitted step."""
    import jax

    from flairtpu.train.loop import SegmentationTrainer

    rng = np.random.default_rng(0)
    config = {
        "model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {
                "encoder_decoder": "se_resnext50_32x4d_unet"},
        },
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
