"""Test-only torch mirror of smp's senet encoder family.

smp/encoders/senet.py wraps pretrainedmodels' SENet (Hu et al.,
arXiv:1709.01507); neither pretrainedmodels nor smp is installed here, so
this mirror reconstructs the exact pretrainedmodels state-dict surface
(``encoder.layer0.*`` named stem, ``encoder.layer{1..4}.{u}.*`` blocks
with ``se_module.fc1/fc2`` gates and ``downsample.0/.1``) and numerics,
plus smp's stage-tapping (``get_stages()``: layer0-sans-pool, then
pool+layer1, layer2..4) and ``make_dilated`` rewriting.

Like the other smp mirrors (tests/torch_ref.py:1-8), a deviation from
real pretrainedmodels would pass parity silently — the committed
key/shape manifests (tests/smp_manifests) pin the state-dict surface
against regressions.
"""

from __future__ import annotations

import math
from collections import OrderedDict

import torch.nn as nn

from tests import torch_ref
from tests.torch_ref_tv import replace_strides_with_dilation


class SEModule(nn.Module):
    def __init__(self, channels, reduction):
        super().__init__()
        self.avg_pool = nn.AdaptiveAvgPool2d(1)
        self.fc1 = nn.Conv2d(channels, channels // reduction, 1, padding=0)
        self.relu = nn.ReLU(inplace=False)
        self.fc2 = nn.Conv2d(channels // reduction, channels, 1, padding=0)
        self.sigmoid = nn.Sigmoid()

    def forward(self, x):
        s = self.sigmoid(self.fc2(self.relu(self.fc1(self.avg_pool(x)))))
        return x * s


class _Bottleneck(nn.Module):
    """pretrainedmodels Bottleneck base: SE gate before the residual add."""

    def forward(self, x):
        residual = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            residual = self.downsample(x)
        return self.relu(self.se_module(out) + residual)


class SEBottleneck(_Bottleneck):
    """senet154 block: 1x1 -> 2p, grouped 3x3 (stride) -> 4p, 1x1 -> 4p."""

    expansion = 4

    def __init__(self, inplanes, planes, groups, reduction, stride=1,
                 downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes * 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes * 2)
        self.conv2 = nn.Conv2d(planes * 2, planes * 4, 3, stride=stride,
                               padding=1, groups=groups, bias=False)
        self.bn2 = nn.BatchNorm2d(planes * 4)
        self.conv3 = nn.Conv2d(planes * 4, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=False)
        self.se_module = SEModule(planes * 4, reduction)
        self.downsample = downsample


class SEResNetBottleneck(_Bottleneck):
    """se_resnet block: the STRIDE sits on the 1x1 conv1 (pretrainedmodels
    quirk, unlike torchvision)."""

    expansion = 4

    def __init__(self, inplanes, planes, groups, reduction, stride=1,
                 downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False, stride=stride)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, groups=groups,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=False)
        self.se_module = SEModule(planes * 4, reduction)
        self.downsample = downsample


class SEResNeXtBottleneck(_Bottleneck):
    expansion = 4

    def __init__(self, inplanes, planes, groups, reduction, stride=1,
                 downsample=None, base_width=4):
        super().__init__()
        width = math.floor(planes * (base_width / 64)) * groups
        self.conv1 = nn.Conv2d(inplanes, width, 1, bias=False, stride=1)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1,
                               groups=groups, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=False)
        self.se_module = SEModule(planes * 4, reduction)
        self.downsample = downsample


SENET_CONFIGS = {
    # block, layers, groups, reduction, inplanes, input_3x3, ds_kernel, ds_pad
    "senet154": (SEBottleneck, (3, 8, 36, 3), 64, 16, 128, True, 3, 1),
    "se_resnet50": (SEResNetBottleneck, (3, 4, 6, 3), 1, 16, 64, False, 1, 0),
    "se_resnet101": (SEResNetBottleneck, (3, 4, 23, 3), 1, 16, 64, False, 1, 0),
    "se_resnet152": (SEResNetBottleneck, (3, 8, 36, 3), 1, 16, 64, False, 1, 0),
    "se_resnext50_32x4d": (SEResNeXtBottleneck, (3, 4, 6, 3), 32, 16, 64,
                           False, 1, 0),
    "se_resnext101_32x4d": (SEResNeXtBottleneck, (3, 4, 23, 3), 32, 16, 64,
                            False, 1, 0),
}
SENET_OUT = {name: (cfg[4] if cfg[5] else 64, 256, 512, 1024, 2048)
             for name, cfg in SENET_CONFIGS.items()}  # out_channels[1:]


class SENetEncoderTorch(nn.Module):
    """smp SENetEncoder mirror: pretrainedmodels SENet + smp stage taps."""

    def __init__(self, name: str = "se_resnet50", in_channels: int = 5,
                 depth: int = 5, output_stride: int = 32):
        super().__init__()
        block, layers, groups, reduction, inplanes, input_3x3, dsk, dsp = \
            SENET_CONFIGS[name]
        self.depth = depth
        if input_3x3:
            stem = [
                ("conv1", nn.Conv2d(in_channels, 64, 3, 2, 1, bias=False)),
                ("bn1", nn.BatchNorm2d(64)),
                ("relu1", nn.ReLU(inplace=False)),
                ("conv2", nn.Conv2d(64, 64, 3, 1, 1, bias=False)),
                ("bn2", nn.BatchNorm2d(64)),
                ("relu2", nn.ReLU(inplace=False)),
                ("conv3", nn.Conv2d(64, inplanes, 3, 1, 1, bias=False)),
                ("bn3", nn.BatchNorm2d(inplanes)),
                ("relu3", nn.ReLU(inplace=False)),
            ]
        else:
            stem = [
                ("conv1", nn.Conv2d(in_channels, inplanes, 7, 2, 3,
                                    bias=False)),
                ("bn1", nn.BatchNorm2d(inplanes)),
                ("relu1", nn.ReLU(inplace=False)),
            ]
        stem.append(("pool", nn.MaxPool2d(3, stride=2, ceil_mode=True)))
        self.layer0 = nn.Sequential(OrderedDict(stem))
        self.inplanes = inplanes
        # like the efficientnet/mobilenet mirrors: build only the stages the
        # reduced depth uses, so the key set matches what flairtpu
        # instantiates (real smp keeps the unused stages; real checkpoints
        # load with strict=False)
        self.layer1 = self._make_layer(block, 64, layers[0], groups, reduction,
                                       stride=1, ds_kernel=1, ds_pad=0)
        for i, planes in enumerate((128, 256, 512), start=2):
            if depth - 1 >= i:
                self.add_module(f"layer{i}", self._make_layer(
                    block, planes, layers[i - 1], groups, reduction, 2,
                    dsk, dsp))
        if output_stride == 16:
            replace_strides_with_dilation(self.layer4, 2)
        elif output_stride == 8:
            replace_strides_with_dilation(self.layer3, 2)
            replace_strides_with_dilation(self.layer4, 4)

    def _make_layer(self, block, planes, blocks, groups, reduction, stride,
                    ds_kernel, ds_pad):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, ds_kernel,
                          stride=stride, padding=ds_pad, bias=False),
                nn.BatchNorm2d(planes * block.expansion))
        layers = [block(self.inplanes, planes, groups, reduction, stride,
                        downsample)]
        self.inplanes = planes * block.expansion
        layers += [block(self.inplanes, planes, groups, reduction)
                   for _ in range(1, blocks)]
        return nn.Sequential(*layers)

    def forward(self, x):
        stages = [nn.Identity(), self.layer0[:-1],
                  nn.Sequential(self.layer0[-1], self.layer1)]
        stages += [getattr(self, f"layer{i}") for i in range(2, self.depth)]
        feats = []
        for stage in stages[: self.depth + 1]:
            x = stage(x)
            feats.append(x)
        return feats


class SENetUnet(nn.Module):
    """smp.create_model('unet', <senet encoder>, ...) mirror."""

    def __init__(self, name="se_resnet50", in_channels=5, classes=13):
        super().__init__()
        self.encoder = SENetEncoderTorch(name, in_channels)
        self.decoder = torch_ref.UnetDecoder(encoder_channels=SENET_OUT[name])
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(16, classes, 3, padding=1))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class SENetFPN(nn.Module):
    def __init__(self, name="se_resnext50_32x4d", in_channels=5, classes=7):
        super().__init__()
        self.encoder = SENetEncoderTorch(name, in_channels)
        self.decoder = torch_ref.FPNDecoder(encoder_channels=SENET_OUT[name])
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(128, classes, 1), nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class SENetPSPNet(nn.Module):
    def __init__(self, name="se_resnet50", in_channels=5, classes=7):
        super().__init__()
        self.encoder = SENetEncoderTorch(name, in_channels, depth=3)
        self.decoder = torch_ref.PSPDecoder(in_ch=512)
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(512, classes, 3, padding=1),
            nn.UpsamplingBilinear2d(scale_factor=8))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class SENetDeepLabV3Plus(nn.Module):
    """os=16 dilated senet + smp DeepLabV3Plus decoder."""

    def __init__(self, name="se_resnet50", in_channels=5, classes=7):
        super().__init__()
        self.encoder = SENetEncoderTorch(name, in_channels, output_stride=16)
        self.decoder = torch_ref.DeepLabV3PlusDecoder(
            encoder_channels=SENET_OUT[name])
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(256, classes, 1), nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))
