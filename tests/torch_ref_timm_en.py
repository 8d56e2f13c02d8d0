"""Test-only torch mirror of smp's timm-EfficientNet encoders
(timm-efficientnet-b0..b8/l2, timm-tf_efficientnet_lite0..4).

smp/encoders/timm_efficientnet.py wraps timm's EfficientNet; timm is not
installed here, so this mirror reconstructs the exact state-dict surface
(``encoder.conv_stem``/``encoder.bn1`` stem, ``encoder.blocks.{stage}.{i}``
nested Sequential with ``conv_pw/conv_dw/conv_pwl``, ``bn1/bn2/bn3``,
``se.conv_reduce``/``se.conv_expand``) and numerics: native variants use
symmetric torch padding + BN 1e-5 + SiLU, the tf_ lite variants dynamic TF
SAME padding + BN 1e-3 + ReLU6 and no SE (flavor table in
flairtpu/models/timm_efficientnet.py).

The plan arithmetic here reuses the Flax module's
``timm_efficientnet_plan`` deliberately — the parity tests check the
numerics, while the committed key/shape manifests + the out_channels
cross-check against smp's published table (tests/test_timm_en.py) pin the
surface. Caveat as tests/torch_ref.py:1-8.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from flairtpu.models.timm_efficientnet import timm_efficientnet_plan
from tests import torch_ref


class Conv2dSame(nn.Conv2d):
    """timm Conv2dSame: TF SAME padding computed from the runtime size."""

    def forward(self, x):
        ih, iw = x.shape[-2:]
        pads = []
        for n, k, s, d in ((iw, self.kernel_size[1], self.stride[1],
                            self.dilation[1]),
                           (ih, self.kernel_size[0], self.stride[0],
                            self.dilation[0])):
            p = max((math.ceil(n / s) - 1) * s + (k - 1) * d + 1 - n, 0)
            pads += [p // 2, p - p // 2]
        x = F.pad(x, pads)
        return F.conv2d(x, self.weight, self.bias, self.stride, (0, 0),
                        self.dilation, self.groups)


class SqueezeExcite(nn.Module):
    """timm SqueezeExcite (conv_reduce/conv_expand, silu + sigmoid gate)."""

    def __init__(self, channels, rd):
        super().__init__()
        self.conv_reduce = nn.Conv2d(channels, rd, 1)
        self.conv_expand = nn.Conv2d(rd, channels, 1)

    def forward(self, x):
        g = x.mean((2, 3), keepdim=True)
        g = self.conv_expand(F.silu(self.conv_reduce(g)))
        return x * torch.sigmoid(g)


def _conv(cin, cout, k, stride=1, dilation=1, groups=1, lite=False):
    if lite and k > 1:
        return Conv2dSame(cin, cout, k, stride, 0, dilation, groups,
                          bias=False)
    return nn.Conv2d(cin, cout, k, stride, (k // 2) * dilation, dilation,
                     groups, bias=False)


class TimmBlock(nn.Module):
    """timm DepthwiseSeparableConv (ds) / InvertedResidual, eval semantics."""

    def __init__(self, b, lite, bn_eps):
        super().__init__()
        act = nn.ReLU6 if lite else nn.SiLU
        bn = lambda ch: nn.BatchNorm2d(ch, eps=bn_eps)
        self.has_skip = b["skip"]
        self.ds = b["ds"]
        k, s, d = b["kernel"], b["stride"], b["dilation"]
        if self.ds:
            self.conv_dw = _conv(b["cin"], b["cin"], k, s, d, b["cin"], lite)
            self.bn1 = bn(b["cin"])
            self.act1 = act()
            if b["se"]:
                self.se = SqueezeExcite(b["cin"], b["se"])
            self.conv_pw = nn.Conv2d(b["cin"], b["cout"], 1, bias=False)
            self.bn2 = bn(b["cout"])
        else:
            mid = b["cin"] * b["expand"]
            self.conv_pw = nn.Conv2d(b["cin"], mid, 1, bias=False)
            self.bn1 = bn(mid)
            self.act1 = act()
            self.conv_dw = _conv(mid, mid, k, s, d, mid, lite)
            self.bn2 = bn(mid)
            self.act2 = act()
            if b["se"]:
                self.se = SqueezeExcite(mid, b["se"])
            self.conv_pwl = nn.Conv2d(mid, b["cout"], 1, bias=False)
            self.bn3 = bn(b["cout"])

    def forward(self, x):
        shortcut = x
        if self.ds:
            x = self.act1(self.bn1(self.conv_dw(x)))
            if hasattr(self, "se"):
                x = self.se(x)
            x = self.bn2(self.conv_pw(x))
        else:
            x = self.act1(self.bn1(self.conv_pw(x)))
            x = self.act2(self.bn2(self.conv_dw(x)))
            if hasattr(self, "se"):
                x = self.se(x)
            x = self.bn3(self.conv_pwl(x))
        return x + shortcut if self.has_skip else x


class TimmEfficientNetEncoderTorch(nn.Module):
    """smp TimmEfficientNetEncoder mirror (get_stages taps, stage_idxs
    (2, 3, 5)), truncated at ``depth``."""

    def __init__(self, name="timm-efficientnet-b0", in_channels=3, depth=5,
                 output_stride=32):
        super().__init__()
        self.depth = depth
        plan = timm_efficientnet_plan(name, output_stride)
        self.lite = plan["lite"]
        self.conv_stem = _conv(in_channels, plan["stem_ch"], 3, 2,
                               lite=plan["lite"])
        self.bn1 = nn.BatchNorm2d(plan["stem_ch"], eps=plan["bn_eps"])
        self.act1 = (nn.ReLU6 if plan["lite"] else nn.SiLU)()
        # stage groups present up to the depth-truncated tap
        n_stages = {1: 0, 2: 2, 3: 3, 4: 5, 5: 7}[depth]
        self.blocks = nn.Sequential(*[
            nn.Sequential(*[TimmBlock(b, plan["lite"], plan["bn_eps"])
                            for b in stage])
            for stage in plan["stages"][:n_stages]])

    def forward(self, x):
        feats = [x]
        y = self.act1(self.bn1(self.conv_stem(x)))
        feats.append(y)
        taps = {1, 2, 4, 6}
        for si, stage in enumerate(self.blocks):
            y = stage(y)
            if si in taps and len(feats) < self.depth + 1:
                feats.append(y)
        return feats


def timm_en_out_channels(name):
    return tuple(timm_efficientnet_plan(name)["out_channels"])


class TimmENUnet(nn.Module):
    """smp.create_model('unet', 'timm-efficientnet-*', ...) mirror."""

    def __init__(self, name="timm-efficientnet-b0", in_channels=3,
                 classes=13):
        super().__init__()
        self.encoder = TimmEfficientNetEncoderTorch(name, in_channels)
        self.decoder = torch_ref.UnetDecoder(
            encoder_channels=timm_en_out_channels(name))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(16, classes, 3, padding=1))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class TimmENFPN(nn.Module):
    def __init__(self, name="timm-efficientnet-b0", in_channels=3, classes=7):
        super().__init__()
        self.encoder = TimmEfficientNetEncoderTorch(name, in_channels)
        self.decoder = torch_ref.FPNDecoder(
            encoder_channels=timm_en_out_channels(name))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(128, classes, 1), nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class TimmENDeepLabV3Plus(nn.Module):
    """output_stride 16 dilated encoder + ASPP."""

    def __init__(self, name="timm-efficientnet-b0", in_channels=3, classes=7):
        super().__init__()
        out = timm_en_out_channels(name)
        self.encoder = TimmEfficientNetEncoderTorch(name, in_channels,
                                                    output_stride=16)
        self.decoder = torch_ref.DeepLabV3PlusDecoder(
            encoder_channels=out)
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(256, classes, 1), nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))
