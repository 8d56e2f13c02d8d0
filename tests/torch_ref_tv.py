"""Test-only torch mirrors of smp's torchvision-backed encoders.

smp wraps torchvision's MobileNetV2 / VGG / DenseNet (smp/encoders/
mobilenet.py, vgg.py, densenet.py); neither torchvision nor smp is
installed here, so these mirrors reconstruct the exact torchvision
state-dict surface (``encoder.features.*``) and numerics, plus smp's
stage-tapping and ``make_dilated`` rewriting (encoders/_utils.py
replace_strides_with_dilation — applied verbatim below so the mirror
dilates exactly like smp, including stride-1 convs inside the stage).

Like the other smp mirrors (tests/torch_ref.py:1-8), a deviation from real
torchvision would pass parity silently — the committed key/shape manifests
(tests/smp_manifests) pin the state-dict surface against regressions.
"""

from __future__ import annotations

from collections import OrderedDict

import torch
import torch.nn as nn
import torch.nn.functional as F

from tests import torch_ref


def replace_strides_with_dilation(module: nn.Module, rate: int) -> None:
    """smp/encoders/_utils.py: every conv in the stage gets stride 1, the
    dilation rate, and symmetric (k//2)*rate padding."""
    for mod in module.modules():
        if isinstance(mod, nn.Conv2d):
            mod.stride = (1, 1)
            mod.dilation = (rate, rate)
            kh, kw = mod.kernel_size
            mod.padding = ((kh // 2) * rate, (kw // 2) * rate)


# ---------------------------------------------------------------------------
# MobileNetV2 (torchvision width 1.0)
# ---------------------------------------------------------------------------

def _conv_bn_relu6(cin, cout, k, stride=1, groups=1):
    """torchvision ConvBNReLU: Sequential(conv, bn, relu6)."""
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, stride, (k - 1) // 2, groups=groups,
                  bias=False),
        nn.BatchNorm2d(cout), nn.ReLU6(inplace=False))


class TVInvertedResidual(nn.Module):
    def __init__(self, cin, cout, stride, expand):
        super().__init__()
        self.use_res_connect = stride == 1 and cin == cout
        mid = cin * expand
        layers = []
        if expand != 1:
            layers.append(_conv_bn_relu6(cin, mid, 1))
        layers += [_conv_bn_relu6(mid, mid, 3, stride, groups=mid),
                   nn.Conv2d(mid, cout, 1, bias=False),
                   nn.BatchNorm2d(cout)]
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        y = self.conv(x)
        return x + y if self.use_res_connect else y


_MNV2_SETTING = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                 (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))


class MobileNetV2EncoderTorch(nn.Module):
    """smp MobileNetV2Encoder mirror: torchvision `features` + stage taps
    at [:2], [2:4], [4:7], [7:14], [14:], with smp make_dilated."""

    def __init__(self, in_channels: int = 5, depth: int = 5,
                 output_stride: int = 32):
        super().__init__()
        self.depth = depth
        feats: list[nn.Module] = [_conv_bn_relu6(in_channels, 32, 3, 2)]
        cin = 32
        for t, c, n, s in _MNV2_SETTING:
            for j in range(n):
                feats.append(TVInvertedResidual(cin, c, s if j == 0 else 1, t))
                cin = c
        feats.append(_conv_bn_relu6(320, 1280, 1))
        # like the efficientnet mirror: truncate so the key set matches what
        # flairtpu instantiates at reduced depth (real smp keeps the unused
        # stages; real checkpoints load with strict=False)
        stop = {1: 2, 2: 4, 3: 7, 4: 14, 5: 19}[depth]
        self.features = nn.Sequential(*feats[:stop])
        if output_stride == 16:
            replace_strides_with_dilation(self.features[14:], 2)
        elif output_stride == 8:
            replace_strides_with_dilation(self.features[7:14], 2)
            replace_strides_with_dilation(self.features[14:], 4)

    def forward(self, x):
        stages = [nn.Identity(), self.features[:2], self.features[2:4],
                  self.features[4:7], self.features[7:14], self.features[14:]]
        feats = []
        for stage in stages[: self.depth + 1]:
            x = stage(x)
            feats.append(x)
        return feats


MNV2_OUT = (16, 24, 32, 96, 1280)  # out_channels[1:]


# ---------------------------------------------------------------------------
# VGG
# ---------------------------------------------------------------------------

VGG_CFGS = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg13": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
              512, 512, "M"),
    "vgg16": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
              "M", 512, 512, 512, "M"),
    "vgg19": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
}
VGG_OUT = (128, 256, 512, 512, 512)  # out_channels[1:]


class VGGEncoderTorch(nn.Module):
    """smp VGGEncoder mirror: torchvision make_layers + pool-boundary stages
    (each stage after the first STARTS with the boundary pool)."""

    def __init__(self, name: str = "vgg11", in_channels: int = 5,
                 depth: int = 5):
        super().__init__()
        base = name[:-3] if name.endswith("_bn") else name
        use_bn = name.endswith("_bn")
        layers: list[nn.Module] = []
        cin = in_channels
        for v in VGG_CFGS[base]:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.Conv2d(cin, v, 3, padding=1))
                if use_bn:
                    layers.append(nn.BatchNorm2d(v))
                layers.append(nn.ReLU(inplace=False))
                cin = v
        self.features = nn.Sequential(*layers)
        self.depth = depth

    def forward(self, x):
        stages, current = [], []
        for mod in self.features:
            if isinstance(mod, nn.MaxPool2d):
                stages.append(current)
                current = []
            current.append(mod)
        stages.append(current)
        feats = []
        for stage in stages[: self.depth + 1]:
            for mod in stage:
                x = mod(x)
            feats.append(x)
        return feats


# ---------------------------------------------------------------------------
# DenseNet
# ---------------------------------------------------------------------------

DN_SPECS = {
    "densenet121": (64, 32, (6, 12, 24, 16)),
    "densenet161": (96, 48, (6, 12, 36, 24)),
    "densenet169": (64, 32, (6, 12, 32, 32)),
    "densenet201": (64, 32, (6, 12, 48, 32)),
}


class _DenseLayer(nn.Module):
    def __init__(self, in_ch, growth, bn_size=4):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(in_ch)
        self.conv1 = nn.Conv2d(in_ch, bn_size * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(bn_size * growth)
        self.conv2 = nn.Conv2d(bn_size * growth, growth, 3, padding=1,
                               bias=False)

    def forward(self, x):
        y = self.conv1(F.relu(self.norm1(x)))
        return self.conv2(F.relu(self.norm2(y)))


class _DenseBlock(nn.Module):
    def __init__(self, n, in_ch, growth):
        super().__init__()
        for i in range(n):
            self.add_module(f"denselayer{i + 1}",
                            _DenseLayer(in_ch + i * growth, growth))

    def forward(self, x):
        for layer in self.children():
            x = torch.cat([x, layer(x)], dim=1)
        return x


def _transition(in_ch):
    return nn.Sequential(OrderedDict([
        ("norm", nn.BatchNorm2d(in_ch)), ("relu", nn.ReLU(inplace=False)),
        ("conv", nn.Conv2d(in_ch, in_ch // 2, 1, bias=False)),
        ("pool", nn.AvgPool2d(2, 2))]))


class DenseNetEncoderTorch(nn.Module):
    """smp DenseNetEncoder mirror: transitions tapped after their relu
    (TransitionWithSkip); final stage is denseblock4 + norm5, no relu."""

    def __init__(self, name: str = "densenet121", in_channels: int = 5,
                 depth: int = 5):
        super().__init__()
        init, growth, blocks = DN_SPECS[name]
        mods: list[tuple[str, nn.Module]] = [
            ("conv0", nn.Conv2d(in_channels, init, 7, 2, 3, bias=False)),
            ("norm0", nn.BatchNorm2d(init)),
            ("relu0", nn.ReLU(inplace=False)),
            ("pool0", nn.MaxPool2d(3, 2, 1))]
        ch = init
        for b, n in enumerate(blocks):
            mods.append((f"denseblock{b + 1}", _DenseBlock(n, ch, growth)))
            ch += n * growth
            if b < 3:
                mods.append((f"transition{b + 1}", _transition(ch)))
                ch //= 2
        mods.append(("norm5", nn.BatchNorm2d(ch)))
        self.features = nn.Sequential(OrderedDict(mods))
        self.depth = depth

    def forward(self, x):
        f = self.features
        feats = [x]
        y = f.relu0(f.norm0(f.conv0(x)))
        feats.append(y)
        y = f.pool0(y)
        for b in range(min(self.depth - 1, 4)):
            y = getattr(f, f"denseblock{b + 1}")(y)
            if b < 3:
                tr = getattr(f, f"transition{b + 1}")
                skip = tr.relu(tr.norm(y))
                feats.append(skip)
                y = tr.pool(tr.conv(skip))
            else:
                feats.append(f.norm5(y))
        return feats


def dn_out_channels(name: str) -> tuple[int, ...]:
    init, growth, blocks = DN_SPECS[name]
    out, ch = [init], init
    for b, n in enumerate(blocks):
        ch += n * growth
        out.append(ch)
        if b < 3:
            ch //= 2
    return tuple(out)  # out_channels[1:]


# ---------------------------------------------------------------------------
# full-model mirrors (encoder + shared torch_ref decoders)
# ---------------------------------------------------------------------------

class TVUnet(nn.Module):
    """smp.create_model('unet', <tv encoder>, ...) mirror."""

    def __init__(self, encoder: nn.Module, enc_channels, classes=7):
        super().__init__()
        self.encoder = encoder
        self.decoder = torch_ref.UnetDecoder(encoder_channels=enc_channels)
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(16, classes, 3, padding=1))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class TVFPN(nn.Module):
    def __init__(self, encoder: nn.Module, enc_channels, classes=7):
        super().__init__()
        self.encoder = encoder
        self.decoder = torch_ref.FPNDecoder(encoder_channels=enc_channels)
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(128, classes, 1), nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class TVPSPNet(nn.Module):
    def __init__(self, encoder: nn.Module, in_ch, classes=7):
        super().__init__()
        self.encoder = encoder
        self.decoder = torch_ref.PSPDecoder(in_ch=in_ch)
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(512, classes, 3, padding=1),
            nn.UpsamplingBilinear2d(scale_factor=8))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class MobileNetV2Unet(TVUnet):
    """smp.create_model('unet', 'mobilenet_v2', ...) mirror (manifest shape)."""

    def __init__(self, in_channels=5, classes=13):
        super().__init__(MobileNetV2EncoderTorch(in_channels), MNV2_OUT,
                         classes=classes)


class VGGUnet(TVUnet):
    def __init__(self, name="vgg16_bn", in_channels=5, classes=13):
        super().__init__(VGGEncoderTorch(name, in_channels), VGG_OUT,
                         classes=classes)


class DenseNetUnet(TVUnet):
    def __init__(self, name="densenet121", in_channels=5, classes=13):
        super().__init__(DenseNetEncoderTorch(name, in_channels),
                         dn_out_channels(name), classes=classes)


class MobileNetV2DeepLabV3Plus(nn.Module):
    """os=16 dilated mobilenet_v2 + smp DeepLabV3Plus decoder."""

    def __init__(self, in_channels=5, classes=7):
        super().__init__()
        self.encoder = MobileNetV2EncoderTorch(in_channels, output_stride=16)
        self.decoder = torch_ref.DeepLabV3PlusDecoder(encoder_channels=MNV2_OUT)
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(256, classes, 1), nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))
