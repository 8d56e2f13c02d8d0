"""Test-only torch mirror of smp's timm-regnet encoders.

smp/encoders/timm_regnet.py wraps timm's RegNet; timm is not installed
here, so this mirror reconstructs the exact state-dict surface
(``stem.{conv,bn}``, ``s{k}.b{i}.conv{1,2,3}.{conv,bn}``, regnety
``se.fc1/fc2``, ``downsample.{conv,bn}``) and numerics. The stage
widths/depths/groups come from the shared generation rule
(flairtpu/models/regnet.py regnet_stages) — the parity tests check
numerics while the committed key/shape manifests + the published-width
spot checks (tests/test_regnet.py) pin the surface. Caveat as
tests/torch_ref.py:1-8.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

from flairtpu.models.regnet import REGNET_SPECS, regnet_stages
from tests import torch_ref
from tests.torch_ref_sknet import ConvNormTorch


class SETorch(nn.Module):
    def __init__(self, channels, rd):
        super().__init__()
        self.fc1 = nn.Conv2d(channels, rd, 1)
        self.fc2 = nn.Conv2d(rd, channels, 1)

    def forward(self, x):
        g = x.mean((2, 3), keepdim=True)
        return x * torch.sigmoid(self.fc2(F.relu(self.fc1(g))))


class RegNetBlockTorch(nn.Module):
    def __init__(self, in_ch, width, stride, group_size, se):
        super().__init__()
        if stride != 1 or in_ch != width:
            self.downsample = ConvNormTorch(in_ch, width, 1, stride,
                                            act=False)
        else:
            self.downsample = None
        self.conv1 = ConvNormTorch(in_ch, width, 1)
        self.conv2 = ConvNormTorch(width, width, 3, stride,
                                   groups=width // min(group_size, width))
        if se:
            self.se = SETorch(width, int(round(in_ch * 0.25)))
        self.conv3 = ConvNormTorch(width, width, 1, act=False)

    def forward(self, x):
        shortcut = self.downsample(x) if self.downsample is not None else x
        y = self.conv2(self.conv1(x))
        if hasattr(self, "se"):
            y = self.se(y)
        y = self.conv3(y)
        return F.relu(y + shortcut)


class RegNetEncoderTorch(nn.Module):
    """smp TimmRegNetEncoder mirror, truncated at ``depth``."""

    def __init__(self, name="timm-regnetx_002", in_channels=3, depth=5):
        super().__init__()
        self.depth = depth
        use_se = REGNET_SPECS[name][5]
        sw, sd, groups = regnet_stages(name)
        self.stem = ConvNormTorch(in_channels, 32, 3, 2)
        in_ch = 32
        for s, (w, d, g) in enumerate(zip(sw, sd, groups)):
            if depth < s + 2:
                break
            stage = nn.Module()
            for i in range(d):
                stage.add_module(f"b{i + 1}", RegNetBlockTorch(
                    in_ch, w, 2 if i == 0 else 1, g, use_se))
                in_ch = w
            self.add_module(f"s{s + 1}", stage)

    def forward(self, x):
        feats = [x, self.stem(x)]
        y = feats[-1]
        for s in range(4):
            if not hasattr(self, f"s{s + 1}"):
                break
            stage = getattr(self, f"s{s + 1}")
            for _, blk in stage.named_children():
                y = blk(y)
            feats.append(y)
        return feats


def regnet_out_channels(name):
    sw, _, _ = regnet_stages(name)
    return (32,) + tuple(sw)


class RegNetUnet(nn.Module):
    """smp.create_model('unet', 'timm-regnet*', ...) mirror."""

    def __init__(self, name="timm-regnetx_002", in_channels=3, classes=13):
        super().__init__()
        self.encoder = RegNetEncoderTorch(name, in_channels)
        self.decoder = torch_ref.UnetDecoder(
            encoder_channels=regnet_out_channels(name))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(16, classes, 3, padding=1))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class RegNetFPN(nn.Module):
    def __init__(self, name="timm-regnetx_002", in_channels=3, classes=7):
        super().__init__()
        self.encoder = RegNetEncoderTorch(name, in_channels)
        self.decoder = torch_ref.FPNDecoder(
            encoder_channels=regnet_out_channels(name))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(128, classes, 1), nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))
