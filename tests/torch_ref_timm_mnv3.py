"""Test-only torch mirror of smp's timm-mobilenetv3 encoders.

smp/encoders/timm_mobilenetv3.py holds ``timm.create_model(...)`` under
``self.model``, so checkpoint keys carry the extra ``model.`` prefix
(``encoder.model.conv_stem.weight``, ``encoder.model.blocks.{s}.{i}.*``).
This mirror reconstructs that surface and the numerics (hard-swish /
hard-sigmoid SE over the expanded channels with divisor-8 rounding, the
fractional expansions, the minimal ReLU/k3/no-SE flavor) from the plan
table shared with the Flax module. Caveat as tests/torch_ref.py:1-8; the
committed key/shape manifests pin the surface.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

from flairtpu.models.timm_mobilenetv3 import (TIMM_MOBILENETV3_SPECS,
                                              timm_mobilenetv3_plan)
from tests import torch_ref


class SqueezeExciteMNV3(nn.Module):
    """timm SqueezeExcite with relu inner act + hard-sigmoid gate."""

    def __init__(self, channels, rd):
        super().__init__()
        self.conv_reduce = nn.Conv2d(channels, rd, 1)
        self.conv_expand = nn.Conv2d(rd, channels, 1)

    def forward(self, x):
        g = x.mean((2, 3), keepdim=True)
        g = self.conv_expand(F.relu(self.conv_reduce(g)))
        return x * F.hardsigmoid(g)


class MNV3TorchBlock(nn.Module):
    def __init__(self, b):
        super().__init__()
        self.kind, self.skip = b["kind"], b["skip"]
        act = nn.ReLU if b["relu"] else nn.Hardswish
        k, s = b["k_eff"], b["stride"]
        if b["kind"] == "cn":
            self.conv = nn.Conv2d(b["cin"], b["cout"], 1, bias=False)
            self.bn1 = nn.BatchNorm2d(b["cout"])
            self.act1 = act()
        elif b["kind"] == "ds":
            self.conv_dw = nn.Conv2d(b["cin"], b["cin"], k, s, k // 2,
                                     groups=b["cin"], bias=False)
            self.bn1 = nn.BatchNorm2d(b["cin"])
            self.act1 = act()
            if b["se"]:
                self.se = SqueezeExciteMNV3(b["cin"], b["se"])
            self.conv_pw = nn.Conv2d(b["cin"], b["cout"], 1, bias=False)
            self.bn2 = nn.BatchNorm2d(b["cout"])
        else:
            mid = b["mid"]
            self.conv_pw = nn.Conv2d(b["cin"], mid, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(mid)
            self.act1 = act()
            self.conv_dw = nn.Conv2d(mid, mid, k, s, k // 2, groups=mid,
                                     bias=False)
            self.bn2 = nn.BatchNorm2d(mid)
            self.act2 = act()
            if b["se"]:
                self.se = SqueezeExciteMNV3(mid, b["se"])
            self.conv_pwl = nn.Conv2d(mid, b["cout"], 1, bias=False)
            self.bn3 = nn.BatchNorm2d(b["cout"])

    def forward(self, x):
        if self.kind == "cn":
            return self.act1(self.bn1(self.conv(x)))
        shortcut = x
        if self.kind == "ds":
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
        return x + shortcut if self.skip else x


class _TimmMNV3(nn.Module):
    """The inner timm model (conv_stem/bn1/act1/blocks)."""

    def __init__(self, name, in_channels):
        super().__init__()
        plan = timm_mobilenetv3_plan(name)
        _, _, minimal = TIMM_MOBILENETV3_SPECS[name]
        self.conv_stem = nn.Conv2d(in_channels, plan["stem_ch"], 3, 2, 1,
                                   bias=False)
        self.bn1 = nn.BatchNorm2d(plan["stem_ch"])
        self.act1 = nn.ReLU() if minimal else nn.Hardswish()
        self.blocks = nn.Sequential(*[
            nn.Sequential(*[MNV3TorchBlock(b) for b in stage])
            for stage in plan["stages"]])


class TimmMobileNetV3EncoderTorch(nn.Module):
    """smp MobileNetV3Encoder mirror (mode-dependent get_stages taps)."""

    def __init__(self, name="timm-mobilenetv3_large_100", in_channels=3,
                 depth=5):
        super().__init__()
        self.depth = depth
        self.plan = timm_mobilenetv3_plan(name)
        self.model = _TimmMNV3(name, in_channels)

    def forward(self, x):
        feats = [x]
        m = self.model
        y = m.act1(m.bn1(m.conv_stem(x)))
        large = self.plan["mode"] == "large"
        if not large:
            feats.append(y)
        for si, stage in enumerate(m.blocks):
            y = stage(y)
            if (large and si == 0) or si in self.plan["taps"]:
                feats.append(y)
            if len(feats) == self.depth + 1:
                return feats
        return feats


def mnv3_out_channels(name):
    return tuple(timm_mobilenetv3_plan(name)["out_channels"])


class MNV3Unet(nn.Module):
    """smp.create_model('unet', 'timm-mobilenetv3_*', ...) mirror."""

    def __init__(self, name="timm-mobilenetv3_large_100", in_channels=3,
                 classes=13):
        super().__init__()
        self.encoder = TimmMobileNetV3EncoderTorch(name, in_channels)
        self.decoder = torch_ref.UnetDecoder(
            encoder_channels=mnv3_out_channels(name))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(16, classes, 3, padding=1))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class MNV3FPN(nn.Module):
    def __init__(self, name="timm-mobilenetv3_large_100", in_channels=3,
                 classes=7):
        super().__init__()
        self.encoder = TimmMobileNetV3EncoderTorch(name, in_channels)
        self.decoder = torch_ref.FPNDecoder(
            encoder_channels=mnv3_out_channels(name))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(128, classes, 1), nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class MNV3DeepLabV3Plus(nn.Module):
    def __init__(self, name="timm-mobilenetv3_large_100", in_channels=3,
                 classes=7):
        super().__init__()
        out = mnv3_out_channels(name)
        self.encoder = TimmMobileNetV3EncoderTorch(name, in_channels)
        # os-16: rebuild the encoder plan dilated
        self.encoder.plan = timm_mobilenetv3_plan(name, output_stride=16)
        self.encoder.model = _DilatedMNV3(name, in_channels)
        self.decoder = torch_ref.DeepLabV3PlusDecoder(encoder_channels=out)
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(256, classes, 1), nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class _DilatedMNV3(_TimmMNV3):
    """os-16 variant: rebuilt from the dilated plan (strides 1 + dilated
    depthwise convs, as smp's replace_strides_with_dilation produces)."""

    def __init__(self, name, in_channels):
        nn.Module.__init__(self)
        plan = timm_mobilenetv3_plan(name, output_stride=16)
        _, _, minimal = TIMM_MOBILENETV3_SPECS[name]
        self.conv_stem = nn.Conv2d(in_channels, plan["stem_ch"], 3, 2, 1,
                                   bias=False)
        self.bn1 = nn.BatchNorm2d(plan["stem_ch"])
        self.act1 = nn.ReLU() if minimal else nn.Hardswish()
        stages = []
        for stage in plan["stages"]:
            mods = []
            for b in stage:
                blk = MNV3TorchBlock(b)
                if b["dilation"] > 1:
                    dw = getattr(blk, "conv_dw", None)
                    if dw is not None:
                        dw.dilation = (b["dilation"], b["dilation"])
                        dw.padding = ((b["k_eff"] // 2) * b["dilation"],) * 2
                mods.append(blk)
            stages.append(nn.Sequential(*mods))
        self.blocks = nn.Sequential(*stages)
