"""Test-only torch mirror of smp's timm-resnest encoders.

smp/encoders/timm_resnest.py wraps timm's ResNet + ResNestBottleneck; timm
is not installed here, so this mirror reconstructs the exact state-dict
surface (deep ``conv1.{0,1,3,4,6}`` stem + outer ``bn1``,
``layer{s}.{i}.conv1/bn1``, ``conv2.{conv,bn0,fc1,bn1,fc2}`` split-attention
module, ``conv3/bn3``, ``downsample.{0 avgpool,1 conv,2 bn}`` avg_down
shortcuts) and numerics (radix softmax, avd_last stride pool). Caveat as
tests/torch_ref.py:1-8; the committed key/shape manifests pin the surface.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

from flairtpu.models.resnest import RESNEST_SPECS
from tests import torch_ref


class SplAtConv2d(nn.Module):
    def __init__(self, gw, radix, cardinality):
        super().__init__()
        self.radix, self.cardinality, self.gw = radix, cardinality, gw
        self.conv = nn.Conv2d(gw, gw * radix, 3, padding=1,
                              groups=cardinality * radix, bias=False)
        self.bn0 = nn.BatchNorm2d(gw * radix)
        inter = max(gw * radix // 4, 32)
        self.fc1 = nn.Conv2d(gw, inter, 1, groups=cardinality)
        self.bn1 = nn.BatchNorm2d(inter)
        self.fc2 = nn.Conv2d(inter, gw * radix, 1, groups=cardinality)

    def forward(self, x):
        x = F.relu(self.bn0(self.conv(x)))
        B, RC, H, W = x.shape
        if self.radix > 1:
            x = x.reshape(B, self.radix, RC // self.radix, H, W)
            gap = x.sum(dim=1)
        else:
            gap = x
        gap = gap.mean((2, 3), keepdim=True)
        gap = F.relu(self.bn1(self.fc1(gap)))
        attn = self.fc2(gap)
        if self.radix > 1:
            a = attn.view(B, self.cardinality, self.radix, -1).transpose(1, 2)
            a = F.softmax(a, dim=1).reshape(B, -1)
            return (x * a.view(B, self.radix, RC // self.radix, 1, 1)).sum(1)
        return x * torch.sigmoid(attn)


class ResNestBottleneckTorch(nn.Module):
    def __init__(self, in_ch, planes, stride, radix, cardinality, base_width):
        super().__init__()
        gw = int(planes * (base_width / 64.0)) * cardinality
        out_ch = planes * 4
        self.stride = stride
        self.conv1 = nn.Conv2d(in_ch, gw, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(gw)
        self.conv2 = SplAtConv2d(gw, radix, cardinality)
        if stride > 1:
            self.avd_last = nn.AvgPool2d(3, stride, padding=1)
        self.conv3 = nn.Conv2d(gw, out_ch, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_ch)
        if stride != 1 or in_ch != out_ch:
            pool = (nn.AvgPool2d(2, stride, ceil_mode=True,
                                 count_include_pad=False)
                    if stride > 1 else nn.Identity())
            self.downsample = nn.Sequential(
                pool, nn.Conv2d(in_ch, out_ch, 1, bias=False),
                nn.BatchNorm2d(out_ch))
        else:
            self.downsample = None

    def forward(self, x):
        shortcut = self.downsample(x) if self.downsample is not None else x
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.conv2(y)
        if self.stride > 1:
            y = self.avd_last(y)
        y = self.bn3(self.conv3(y))
        return F.relu(y + shortcut)


class ResNestEncoderTorch(nn.Module):
    """smp TimmResNestEncoder mirror, truncated at ``depth``."""

    def __init__(self, name="timm-resnest14d", in_channels=3, depth=5):
        super().__init__()
        layers, sw, radix, card, bw = RESNEST_SPECS[name]
        self.depth = depth
        self.conv1 = nn.Sequential(
            nn.Conv2d(in_channels, sw, 3, 2, 1, bias=False),
            nn.BatchNorm2d(sw), nn.ReLU(inplace=False),
            nn.Conv2d(sw, sw, 3, 1, 1, bias=False),
            nn.BatchNorm2d(sw), nn.ReLU(inplace=False),
            nn.Conv2d(sw, sw * 2, 3, 1, 1, bias=False))
        self.bn1 = nn.BatchNorm2d(sw * 2)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        in_ch = sw * 2
        for s, n in enumerate(layers):
            if depth < s + 2:
                break
            planes = 64 * (2 ** s)
            stride = 1 if s == 0 else 2
            blocks = []
            for i in range(n):
                blocks.append(ResNestBottleneckTorch(
                    in_ch if i == 0 else planes * 4, planes,
                    stride if i == 0 else 1, radix, card, bw))
            self.add_module(f"layer{s + 1}", nn.Sequential(*blocks))
            in_ch = planes * 4

    def forward(self, x):
        feats = [x]
        y = F.relu(self.bn1(self.conv1(x)))
        feats.append(y)
        if self.depth >= 2:
            y = self.maxpool(y)
            for s in range(4):
                if not hasattr(self, f"layer{s + 1}"):
                    break
                y = getattr(self, f"layer{s + 1}")(y)
                feats.append(y)
        return feats


def resnest_out_channels(name):
    _, sw, *_ = RESNEST_SPECS[name]
    return (sw * 2, 256, 512, 1024, 2048)


class ResNestUnet(nn.Module):
    """smp.create_model('unet', 'timm-resnest*', ...) mirror."""

    def __init__(self, name="timm-resnest14d", in_channels=3, classes=13):
        super().__init__()
        self.encoder = ResNestEncoderTorch(name, in_channels)
        self.decoder = torch_ref.UnetDecoder(
            encoder_channels=resnest_out_channels(name))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(16, classes, 3, padding=1))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class ResNestFPN(nn.Module):
    def __init__(self, name="timm-resnest14d", in_channels=3, classes=7):
        super().__init__()
        self.encoder = ResNestEncoderTorch(name, in_channels)
        self.decoder = torch_ref.FPNDecoder(
            encoder_channels=resnest_out_channels(name))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(128, classes, 1), nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class ResNestPSPNet(nn.Module):
    def __init__(self, name="timm-resnest14d", in_channels=3, classes=7):
        super().__init__()
        self.encoder = ResNestEncoderTorch(name, in_channels, depth=3)
        self.decoder = torch_ref.PSPDecoder(in_ch=512)
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(512, classes, 3, padding=1),
            nn.UpsamplingBilinear2d(scale_factor=8))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))
