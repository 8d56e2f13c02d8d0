"""torchvision-backed smp encoders (mobilenet_v2/vgg/densenet): Flax vs
torch-mirror parity, converter structure, registry compat rules, factory e2e.

Covers the modes the smp surface exercises: full-stride (unet/fpn), depth-3
(pspnet), dilated output-stride 16 (mobilenet_v2 deeplabv3plus) — and the
smp behavior that vgg/densenet REJECT the dilated archs (registry mirrors
smp's make_dilated ValueError).
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models import convert
from flairtpu.models.factory import FlairSegmentationModel, create_model, init_model
from flairtpu.models.registry import check_smp
from flairtpu.models.tv_encoders import densenet_out_channels, mobilenet_v2_plan
from tests import torch_ref_tv as ttv


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
    "mnv2_unet": (lambda: ttv.TVUnet(ttv.MobileNetV2EncoderTorch(5),
                                     ttv.MNV2_OUT, classes=6),
                  "mobilenet_v2", "unet", 64),
    "mnv2_deeplabv3plus": (lambda: ttv.MobileNetV2DeepLabV3Plus(5, classes=6),
                           "mobilenet_v2", "deeplabv3plus", 64),
    "mnv2_pspnet": (lambda: ttv.TVPSPNet(
        ttv.MobileNetV2EncoderTorch(5, depth=3), in_ch=32, classes=6),
        "mobilenet_v2", "pspnet", 64),
    "vgg11_unet": (lambda: ttv.TVUnet(ttv.VGGEncoderTorch("vgg11", 5),
                                      ttv.VGG_OUT, classes=6),
                   "vgg11", "unet", 64),
    "vgg16_bn_unet": (lambda: ttv.TVUnet(ttv.VGGEncoderTorch("vgg16_bn", 5),
                                         ttv.VGG_OUT, classes=6),
                      "vgg16_bn", "unet", 64),
    "vgg13_fpn": (lambda: ttv.TVFPN(ttv.VGGEncoderTorch("vgg13", 5),
                                    ttv.VGG_OUT, classes=6),
                  "vgg13", "fpn", 64),
    "densenet121_unet": (lambda: ttv.TVUnet(
        ttv.DenseNetEncoderTorch("densenet121", 5),
        ttv.dn_out_channels("densenet121"), classes=6),
        "densenet121", "unet", 64),
    "densenet169_fpn": (lambda: ttv.TVFPN(
        ttv.DenseNetEncoderTorch("densenet169", 5),
        ttv.dn_out_channels("densenet169"), classes=6),
        "densenet169", "fpn", 64),
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


def test_densenet_out_channels_match_smp():
    """Channel math reproduces smp's published out_channels tables."""
    smp_table = {
        "densenet121": (0, 64, 256, 512, 1024, 1024),
        "densenet161": (0, 96, 384, 768, 2112, 2208),
        "densenet169": (0, 64, 256, 512, 1280, 1664),
        "densenet201": (0, 64, 256, 512, 1792, 1920),
    }
    for name, want in smp_table.items():
        assert densenet_out_channels(name) == want, name


def test_mnv2_plan_dilation():
    """os16 dilates features[14:] rate 2; os8 adds features[7:14] rate 2 and
    bumps [14:] to rate 4 — strides become 1, residual gates unchanged."""
    full = mobilenet_v2_plan(32)
    os16 = mobilenet_v2_plan(16)
    os8 = mobilenet_v2_plan(8)
    assert [b["stride"] for b in full[:6]] == [1, 2, 1, 2, 1, 1]
    for b32, b16, b8 in zip(full, os16, os8):
        i = b32["index"]
        if i >= 14:
            assert (b16["stride"], b16["dilation"]) == (1, 2)
            assert (b8["stride"], b8["dilation"]) == (1, 4)
        elif i >= 7:
            assert (b16["stride"], b16["dilation"]) == (b32["stride"], 1)
            assert (b8["stride"], b8["dilation"]) == (1, 2)
        assert b32["skip"] == b16["skip"] == b8["skip"]


@pytest.mark.parametrize("encoder_decoder", [
    "vgg11_deeplabv3", "vgg16_bn_deeplabv3plus", "vgg19_pan",
    "densenet121_deeplabv3plus", "densenet201_pan"])
def test_no_dilation_archs_rejected(encoder_decoder):
    """smp's VGG/DenseNet make_dilated ValueError, surfaced at config time."""
    with pytest.raises(ValueError, match="dilated"):
        check_smp(encoder_decoder)


@pytest.mark.parametrize("encoder_decoder", [
    "vgg19_bn_unet", "densenet201_linknet", "mobilenet_v2_manet"])
def test_registry_accepts(encoder_decoder):
    enc, arch = check_smp(encoder_decoder)
    assert (enc, arch) == tuple(encoder_decoder.rsplit("_", 1))


@pytest.mark.parametrize("encoder_decoder,classes", [
    ("mobilenet_v2_unet", 5), ("vgg11_unet", 4), ("densenet121_unet", 3)])
def test_factory_dispatch_and_forward(encoder_decoder, classes):
    cfg = {"model_framework": {
        "model_provider": "SegmentationModelsPytorch",
        "SegmentationModelsPytorch": {"encoder_decoder": encoder_decoder}},
        "n_classes": classes, "channels": [1, 2, 3]}
    m = create_model(cfg)
    params, stats = init_model(m, (1, 64, 64, 3))
    out = m.apply({"params": params, "batch_stats": stats},
                  jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, classes)


def test_mnv2_train_step(rng):
    """mobilenet_v2_unet trains through the jitted step (BN update path)."""
    import jax

    from flairtpu.train.loop import SegmentationTrainer

    config = {
        "model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {"encoder_decoder": "mobilenet_v2_unet"},
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
