"""Mirror fidelity: parameter totals vs published model-zoo values.

The smp encoder mirrors (tests/torch_ref*.py) are hand reconstructions —
smp/timm/torchvision/pretrainedmodels are not installed (caveat at
tests/torch_ref.py:1-8). The committed key/shape manifests pin the
*surface*; this module pins the *architecture constants* with a fully
independent oracle: each canonical classifier model's published parameter
total (torchvision docs, timm results tables, the RegNet/GENet/ResNeSt/
Res2Net papers, pretrainedmodels README). Reconstructing the classifier
total = mirror-encoder params + the documented head (global-pool fc, and
the families' conv_head/classifier blocks) and matching the published
number to ~0.01M pins depths, widths, bottleneck ratios, group sizes,
SE reductions and stem shapes — a wrong constant anywhere shifts the
total. (MiT is grounded against installed transformers by key-rename and
gernet against the GENet paper in their own test modules.)

All expected values are published totals; none were derived from the
mirrors themselves.
"""

import pytest
import torch


def _count(m: torch.nn.Module) -> int:
    return sum(p.numel() for p in m.parameters())


def _fc(in_ch: int, classes: int = 1000) -> int:
    return in_ch * classes + classes


# torchvision's published totals (docs "Number of parameters")
RESNET_TOTALS = {
    "resnet34": 21.797, "resnet50": 25.557,
    "resnext50_32x4d": 25.029, "resnext101_32x8d": 88.791,
}

# torchvision totals; VGG's 3-layer 4096 classifier reconstructed exactly
VGG_CLASSIFIER = 25088 * 4096 + 4096 + 4096 * 4096 + 4096 + _fc(4096)
TV_TOTALS = {
    "mobilenet_v2": 3.505,
    "vgg11": 132.863, "vgg11_bn": 132.869, "vgg13": 133.048,
    "vgg16": 138.358, "vgg16_bn": 138.366, "vgg19": 143.667,
    "vgg19_bn": 143.678,
    "densenet121": 7.979, "densenet161": 28.681, "densenet169": 14.149,
    "densenet201": 20.014,
}
DENSENET_FC = {"densenet121": 1024, "densenet161": 2208,
               "densenet169": 1664, "densenet201": 1920}

# EfficientNet paper / efficientnet-pytorch totals; head = 1x1 conv_head
# (no bias) + BN + fc
EFFICIENTNET_TOTALS = {  # name -> (last_block_ch, head_ch, published M)
    "efficientnet-b0": (320, 1280, 5.289),
    "efficientnet-b1": (320, 1280, 7.794),
    "efficientnet-b2": (352, 1408, 9.110),
    "efficientnet-b3": (384, 1536, 12.233),
    "efficientnet-b4": (448, 1792, 19.342),
    "efficientnet-b5": (512, 2048, 30.390),
    "efficientnet-b6": (576, 2304, 43.040),
    "efficientnet-b7": (640, 2560, 66.348),
}

# pretrainedmodels README totals (conv classifier for DPN)
DPN_TOTALS = {  # name -> (concat_features, published M)
    "dpn68": (832, 12.61), "dpn68b": (832, 12.61), "dpn92": (2688, 37.67),
    "dpn98": (2688, 61.57), "dpn107": (2688, 86.92), "dpn131": (2688, 79.25),
}
SENET_TOTALS = {
    "se_resnet50": 28.09, "se_resnet101": 49.33, "se_resnet152": 66.82,
    "se_resnext50_32x4d": 27.56, "se_resnext101_32x4d": 48.96,
    "senet154": 115.09,
}
PTM_TOTALS = {"xception": (2048, 22.86), "inceptionv4": (1536, 42.68),
              "inceptionresnetv2": (1536, 55.84)}

# timm results tables / papers
RESNEST_TOTALS = {
    "timm-resnest14d": 10.61, "timm-resnest26d": 17.07,
    "timm-resnest50d": 27.48, "timm-resnest101e": 48.28,
    "timm-resnest200e": 70.20, "timm-resnest269e": 110.93,
    "timm-resnest50d_4s2x40d": 30.42, "timm-resnest50d_1s4x24d": 25.68,
}
RES2NET_TOTALS = {
    "timm-res2net50_26w_4s": 25.70, "timm-res2net101_26w_4s": 45.21,
    "timm-res2net50_26w_6s": 37.05, "timm-res2net50_26w_8s": 48.40,
    "timm-res2net50_48w_2s": 25.29, "timm-res2net50_14w_8s": 25.06,
    "timm-res2next50": 24.67,
}
SKNET_TOTALS = {"timm-skresnet18": 11.96, "timm-skresnet34": 22.28,
                "timm-skresnext50_32x4d": 27.48}
# RegNet paper Table (params in M) for all 24 variants
REGNET_TOTALS = {
    "timm-regnetx_002": 2.68, "timm-regnetx_004": 5.16,
    "timm-regnetx_006": 6.20, "timm-regnetx_008": 7.26,
    "timm-regnetx_016": 9.19, "timm-regnetx_032": 15.30,
    "timm-regnetx_040": 22.12, "timm-regnetx_064": 26.21,
    "timm-regnetx_080": 39.57, "timm-regnetx_120": 46.11,
    "timm-regnetx_160": 54.28, "timm-regnetx_320": 107.81,
    "timm-regnety_002": 3.16, "timm-regnety_004": 4.34,
    "timm-regnety_006": 6.06, "timm-regnety_008": 6.26,
    "timm-regnety_016": 11.20, "timm-regnety_032": 19.44,
    "timm-regnety_040": 20.65, "timm-regnety_064": 30.58,
    "timm-regnety_080": 39.18, "timm-regnety_120": 51.82,
    "timm-regnety_160": 83.59, "timm-regnety_320": 145.05,
}
# timm totals; mnv3 head = biased 1x1 conv_head (no BN) + fc
TIMM_EN_TOTALS = {  # name -> (last_ch, head_ch, published M)
    "timm-efficientnet-b0": (320, 1280, 5.29),
    "timm-efficientnet-b4": (448, 1792, 19.34),
    "timm-efficientnet-b7": (640, 2560, 66.35),
}
MNV3_TOTALS = {  # name -> (last_ch, head_ch, published M)
    "timm-mobilenetv3_large_100": (960, 1280, 5.48),
    "timm-mobilenetv3_small_100": (576, 1024, 2.54),
}


def _close(total_params: int, want_m: float, tol_m: float = 0.015):
    got_m = total_params / 1e6
    assert abs(got_m - want_m) < tol_m, f"got {got_m:.3f}M want {want_m}M"


@pytest.mark.parametrize("name", sorted(RESNET_TOTALS))
def test_resnet_family(name):
    from tests import torch_ref as tr

    if name == "resnet34":
        enc = tr.ResNet34Encoder(3)
        out = 512
    else:
        units = (3, 4, 23, 3) if "101" in name else (3, 4, 6, 3)
        g, bw = ((32, 4) if name == "resnext50_32x4d" else
                 (32, 8) if name == "resnext101_32x8d" else (1, 64))
        enc = tr.BottleneckEncoder(3, units, groups=g, base_width=bw)
        out = 2048
    _close(_count(enc) + _fc(out), RESNET_TOTALS[name])


@pytest.mark.parametrize("name", sorted(TV_TOTALS))
def test_torchvision_family(name):
    from tests import torch_ref_tv as tv

    if name == "mobilenet_v2":
        head = _fc(1280)
        enc = tv.MobileNetV2EncoderTorch(3)
    elif name.startswith("vgg"):
        head = VGG_CLASSIFIER
        enc = tv.VGGEncoderTorch(name, 3)
    else:
        head = _fc(DENSENET_FC[name])
        enc = tv.DenseNetEncoderTorch(name, 3)
    _close(_count(enc) + head, TV_TOTALS[name])


@pytest.mark.parametrize("name", sorted(EFFICIENTNET_TOTALS))
def test_efficientnet_family(name):
    from tests.torch_ref_efficientnet import EfficientNetEncoderTorch

    ci, co, want = EFFICIENTNET_TOTALS[name]
    head = ci * co + 2 * co + _fc(co)
    _close(_count(EfficientNetEncoderTorch(name, 3)) + head, want)


@pytest.mark.parametrize("name", sorted(DPN_TOTALS))
def test_dpn_family(name):
    from tests.torch_ref_dpn import DPNEncoderTorch

    feats, want = DPN_TOTALS[name]
    _close(_count(DPNEncoderTorch(name)) + _fc(feats), want)


@pytest.mark.parametrize("name", sorted(SENET_TOTALS))
def test_senet_family(name):
    from tests.torch_ref_senet import SENetEncoderTorch

    _close(_count(SENetEncoderTorch(name)) + _fc(2048), SENET_TOTALS[name])


@pytest.mark.parametrize("name", sorted(PTM_TOTALS))
def test_pretrainedmodels_family(name):
    from tests import torch_ref_inception as tin
    from tests import torch_ref_ptm as tpm

    feats, want = PTM_TOTALS[name]
    enc = (tpm.XceptionEncoderTorch() if name == "xception" else
           tin.InceptionV4EncoderTorch() if name == "inceptionv4" else
           tin.InceptionResNetV2EncoderTorch())
    _close(_count(enc) + _fc(feats), want)


@pytest.mark.parametrize("name", sorted(RESNEST_TOTALS))
def test_resnest_family(name):
    from tests.torch_ref_resnest import ResNestEncoderTorch

    _close(_count(ResNestEncoderTorch(name, 3)) + _fc(2048),
           RESNEST_TOTALS[name])


@pytest.mark.parametrize("name", sorted(RES2NET_TOTALS))
def test_res2net_family(name):
    from tests.torch_ref_res2net import Res2NetEncoderTorch

    _close(_count(Res2NetEncoderTorch(name, 3)) + _fc(2048),
           RES2NET_TOTALS[name])


@pytest.mark.parametrize("name", sorted(SKNET_TOTALS))
def test_sknet_family(name):
    from tests.torch_ref_sknet import SKNetEncoderTorch

    out = 2048 if "ext" in name else 512
    _close(_count(SKNetEncoderTorch(name, 3)) + _fc(out), SKNET_TOTALS[name])


@pytest.mark.parametrize("name", sorted(REGNET_TOTALS))
def test_regnet_family(name):
    from flairtpu.models.regnet import regnet_stages
    from tests.torch_ref_regnet import RegNetEncoderTorch

    sw, _, _ = regnet_stages(name)
    _close(_count(RegNetEncoderTorch(name, 3)) + _fc(sw[-1]),
           REGNET_TOTALS[name])


@pytest.mark.parametrize("name", sorted(TIMM_EN_TOTALS))
def test_timm_efficientnet_family(name):
    from tests.torch_ref_timm_en import TimmEfficientNetEncoderTorch

    ci, co, want = TIMM_EN_TOTALS[name]
    head = ci * co + 2 * co + _fc(co)
    _close(_count(TimmEfficientNetEncoderTorch(name, 3)) + head, want)


@pytest.mark.parametrize("name", sorted(MNV3_TOTALS))
def test_timm_mobilenetv3_family(name):
    from tests.torch_ref_timm_mnv3 import TimmMobileNetV3EncoderTorch

    ci, co, want = MNV3_TOTALS[name]
    head = ci * co + co + _fc(co)  # biased conv_head, no BN
    _close(_count(TimmMobileNetV3EncoderTorch(name, 3)) + head, want)
