"""Test-only torch mirror of smp's timm-res2net/res2next encoders.

smp/encoders/timm_res2net.py wraps timm's ResNet with Bottle2neck; timm is
not installed here, so this mirror reconstructs the exact state-dict
surface (standard conv1/bn1 stem, ``layer{s}.{i}.conv1/bn1``,
``convs.{j}``/``bns.{j}`` ModuleLists, ``conv3/bn3``,
``downsample.{0 conv,1 bn}``) and numerics (hierarchical splits, the
is_first stride pool / stride-1 blur on layer1's first block). Caveat as
tests/torch_ref.py:1-8; the committed key/shape manifests pin the surface.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from flairtpu.models.res2net import RES2NET_SPECS
from tests import torch_ref


class Bottle2neckTorch(nn.Module):
    def __init__(self, in_ch, planes, stride, base_width, scale, cardinality):
        super().__init__()
        width = int(math.floor(planes * (base_width / 64.0))) * cardinality
        out_ch = planes * 4
        self.width, self.scale, self.stride = width, scale, stride
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride, bias=False),
                nn.BatchNorm2d(out_ch))
        else:
            self.downsample = None
        self.is_first = stride > 1 or self.downsample is not None
        self.conv1 = nn.Conv2d(in_ch, width * scale, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width * scale)
        self.convs = nn.ModuleList(
            [nn.Conv2d(width, width, 3, stride, 1, groups=cardinality,
                       bias=False) for _ in range(max(1, scale - 1))])
        self.bns = nn.ModuleList(
            [nn.BatchNorm2d(width) for _ in range(max(1, scale - 1))])
        self.pool = (nn.AvgPool2d(3, stride, padding=1)
                     if self.is_first else None)
        self.conv3 = nn.Conv2d(width * scale, out_ch, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        shortcut = self.downsample(x) if self.downsample is not None else x
        y = F.relu(self.bn1(self.conv1(x)))
        spx = torch.split(y, self.width, 1)
        spo = []
        sp = spx[0]
        for i, (conv, bn) in enumerate(zip(self.convs, self.bns)):
            sp = spx[i] if (i == 0 or self.is_first) else sp + spx[i]
            sp = F.relu(bn(conv(sp)))
            spo.append(sp)
        if self.scale > 1:
            spo.append(self.pool(spx[-1]) if self.pool is not None
                       else spx[-1])
        y = torch.cat(spo, 1)
        y = self.bn3(self.conv3(y))
        return F.relu(y + shortcut)


class Res2NetEncoderTorch(nn.Module):
    """smp TimmRes2NetEncoder mirror, truncated at ``depth``."""

    def __init__(self, name="timm-res2net50_26w_4s", in_channels=3, depth=5):
        super().__init__()
        layers, bw, scale, card = RES2NET_SPECS[name]
        self.depth = depth
        self.conv1 = nn.Conv2d(in_channels, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        in_ch = 64
        for s, n in enumerate(layers):
            if depth < s + 2:
                break
            planes = 64 * (2 ** s)
            stride = 1 if s == 0 else 2
            blocks = [Bottle2neckTorch(in_ch if i == 0 else planes * 4,
                                       planes, stride if i == 0 else 1,
                                       bw, scale, card) for i in range(n)]
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


RES2NET_OUT = (64, 256, 512, 1024, 2048)


class Res2NetUnet(nn.Module):
    """smp.create_model('unet', 'timm-res2net*', ...) mirror."""

    def __init__(self, name="timm-res2net50_26w_4s", in_channels=3,
                 classes=13):
        super().__init__()
        self.encoder = Res2NetEncoderTorch(name, in_channels)
        self.decoder = torch_ref.UnetDecoder(encoder_channels=RES2NET_OUT)
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(16, classes, 3, padding=1))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class Res2NetFPN(nn.Module):
    def __init__(self, name="timm-res2net50_26w_4s", in_channels=3,
                 classes=7):
        super().__init__()
        self.encoder = Res2NetEncoderTorch(name, in_channels)
        self.decoder = torch_ref.FPNDecoder(encoder_channels=RES2NET_OUT)
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(128, classes, 1), nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))
