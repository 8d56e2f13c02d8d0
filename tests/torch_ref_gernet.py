"""Test-only torch mirror of smp's timm-gernet encoders (gernet_s/m/l).

smp/encoders/timm_gernet.py wraps timm's ByobNet build of GENet
(arXiv:2006.14090); timm is not installed here, so this mirror reconstructs
the exact state-dict surface (``stem.{conv,bn}``,
``stages.{s}.{i}.{conv1_kxk,conv2_kxk,conv1_1x1,conv3_1x1,shortcut}.{conv,
bn}``, ``final_conv.{conv,bn}``) and numerics (post-residual relu,
projection 1x1 shortcut, depthwise br=3 bottlenecks). Caveat as
tests/torch_ref.py:1-8; the committed key/shape manifests pin the surface.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

from flairtpu.models.gernet import GERNET_SPECS, gernet_mid_chs
from tests import torch_ref
from tests.torch_ref_sknet import ConvNormTorch


class GERNetBlockTorch(nn.Module):
    """timm byobnet BasicBlock / BottleneckBlock (gernet subset)."""

    def __init__(self, kind, in_ch, out_ch, stride, group_size, br):
        super().__init__()
        self.kind = kind
        mid = gernet_mid_chs(out_ch, br)
        groups = mid if group_size == 1 else 1
        if stride != 1 or in_ch != out_ch:
            self.shortcut = ConvNormTorch(in_ch, out_ch, 1, stride, act=False)
        else:
            self.shortcut = nn.Identity()
        if kind == "basic":
            self.conv1_kxk = ConvNormTorch(in_ch, mid, 3, stride)
            self.conv2_kxk = ConvNormTorch(mid, out_ch, 3, act=False)
        else:
            self.conv1_1x1 = ConvNormTorch(in_ch, mid, 1)
            self.conv2_kxk = ConvNormTorch(mid, mid, 3, stride, groups=groups)
            self.conv3_1x1 = ConvNormTorch(mid, out_ch, 1, act=False)

    def forward(self, x):
        shortcut = self.shortcut(x)
        if self.kind == "basic":
            y = self.conv2_kxk(self.conv1_kxk(x))
        else:
            y = self.conv3_1x1(self.conv2_kxk(self.conv1_1x1(x)))
        return F.relu(y + shortcut)


class GERNetEncoderTorch(nn.Module):
    """smp GERNetEncoder mirror; stages 3+4+final_conv form the last
    feature stage (smp get_stages)."""

    def __init__(self, name="timm-gernet_s", in_channels=3, depth=5,
                 output_stride=32):
        super().__init__()
        stem_chs, blocks, num_features = GERNET_SPECS[name]
        self.depth = depth
        self.stem = ConvNormTorch(in_channels, stem_chs, 3, 2)
        stages = []
        in_ch = stem_chs
        for kind, d, c, s0, gs, br in blocks:
            stage = [GERNetBlockTorch(kind, in_ch if i == 0 else c, c,
                                      s0 if i == 0 else 1, gs, br)
                     for i in range(d)]
            in_ch = c
            stages.append(nn.Sequential(*stage))
        self.stages = nn.Sequential(*stages)
        self.final_conv = ConvNormTorch(in_ch, num_features, 1)
        dil = {32: (1, 1), 16: (1, 2), 8: (2, 4)}[output_stride]
        if dil[0] > 1:
            torch_ref._dilate_stage(self.stages[2], dil[0])
        if dil[1] > 1:
            torch_ref._dilate_stage(self.stages[3], dil[1])
            torch_ref._dilate_stage(self.stages[4], dil[1])

    def forward(self, x):
        feats = [x, self.stem(x)]
        if self.depth < 2:
            return feats
        y = feats[-1]
        for s in range(3):
            y = self.stages[s](y)
            feats.append(y)
            if self.depth < len(feats):
                return feats
        y = self.final_conv(self.stages[4](self.stages[3](y)))
        feats.append(y)
        return feats


def gernet_out_channels(name):
    stem_chs, blocks, num_features = GERNET_SPECS[name]
    return (stem_chs, blocks[0][2], blocks[1][2], blocks[2][2], num_features)


class GERNetUnet(nn.Module):
    """smp.create_model('unet', 'timm-gernet_*', ...) mirror."""

    def __init__(self, name="timm-gernet_s", in_channels=3, classes=13):
        super().__init__()
        self.encoder = GERNetEncoderTorch(name, in_channels)
        self.decoder = torch_ref.UnetDecoder(
            encoder_channels=gernet_out_channels(name))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(16, classes, 3, padding=1))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class GERNetFPN(nn.Module):
    def __init__(self, name="timm-gernet_s", in_channels=3, classes=7):
        super().__init__()
        self.encoder = GERNetEncoderTorch(name, in_channels)
        self.decoder = torch_ref.FPNDecoder(
            encoder_channels=gernet_out_channels(name))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(128, classes, 1), nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class GERNetDeepLabV3Plus(nn.Module):
    """output_stride 16: the last smp stage (timm 3+4+final) is dilated."""

    def __init__(self, name="timm-gernet_s", in_channels=3, classes=7):
        super().__init__()
        self.encoder = GERNetEncoderTorch(name, in_channels, output_stride=16)
        self.decoder = torch_ref.DeepLabV3PlusDecoder(
            encoder_channels=gernet_out_channels(name))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(256, classes, 1), nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))
