"""Test-only torch mirror of smp's mobileone_s0..s4 encoders.

smp 0.3.3 vendors Apple's MobileOne training-mode (unfused) topology
(smp/encoders/mobileone.py, from arXiv:2206.04040); smp is not installed
here, so this mirror reconstructs the exact state-dict surface
(``stage0.rbr_conv.{j}.{conv,bn}``, ``stage{n}.{i}.{rbr_conv.{j},
rbr_scale,rbr_skip,se.{reduce,expand}}``) and numerics (branch sum ->
SE -> ReLU). Caveat as tests/torch_ref.py:1-8; the committed key/shape
manifests pin the surface and ``reparameterize()`` reproduces Apple's
branch fusion so the fused totals can be checked against the paper's
published model sizes.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

from flairtpu.models.mobileone import (MOBILEONE_SPECS, _BASE_PLANES,
                                       _NUM_BLOCKS, mobileone_out_channels)
from tests import torch_ref


class SEBlockTorch(nn.Module):
    def __init__(self, in_ch, rd_ratio=0.0625):
        super().__init__()
        self.reduce = nn.Conv2d(in_ch, int(in_ch * rd_ratio), 1, bias=True)
        self.expand = nn.Conv2d(int(in_ch * rd_ratio), in_ch, 1, bias=True)

    def forward(self, x):
        g = x.mean((2, 3), keepdim=True)
        return x * torch.sigmoid(self.expand(F.relu(self.reduce(g))))


def _conv_bn(cin, cout, k, stride, groups):
    mod = nn.Sequential()
    mod.add_module("conv", nn.Conv2d(cin, cout, k, stride, k // 2,
                                     groups=groups, bias=False))
    mod.add_module("bn", nn.BatchNorm2d(cout))
    return mod


class MobileOneBlockTorch(nn.Module):
    def __init__(self, cin, cout, k, stride, groups=1, use_se=False,
                 n_branches=1):
        super().__init__()
        self.groups, self.k, self.cin, self.cout = groups, k, cin, cout
        self.se = SEBlockTorch(cout) if use_se else nn.Identity()
        self.rbr_skip = (nn.BatchNorm2d(cin)
                         if cout == cin and stride == 1 else None)
        self.rbr_conv = nn.ModuleList(
            [_conv_bn(cin, cout, k, stride, groups) for _ in range(n_branches)])
        self.rbr_scale = (_conv_bn(cin, cout, 1, stride, groups)
                          if k > 1 else None)

    def forward(self, x):
        out = 0 if self.rbr_scale is None else self.rbr_scale(x)
        if self.rbr_skip is not None:
            out = out + self.rbr_skip(x)
        for branch in self.rbr_conv:
            out = out + branch(x)
        return F.relu(self.se(out))

    def fused_param_count(self) -> int:
        """Post-fusion size: one biased k×k conv (Apple reparameterize)
        plus the SE block, which fusion keeps."""
        return self.cout * (self.cin // self.groups) * self.k * self.k \
            + self.cout + sum(p.numel() for p in self.se.parameters())


class MobileOneEncoderTorch(nn.Module):
    """smp MobileOneEncoder mirror (training-mode branches)."""

    def __init__(self, name="mobileone_s0", in_channels=3, depth=5):
        super().__init__()
        w, n_branches, use_se_variant = MOBILEONE_SPECS[name]
        chans = mobileone_out_channels(name)
        self.depth = depth
        self.stage0 = MobileOneBlockTorch(in_channels, chans[1], 3, 2)
        in_ch = chans[1]
        for s in range(4):
            planes, n = chans[s + 2], _NUM_BLOCKS[s]
            n_se = (n // 2 if s == 2 else n if s == 3 else 0) \
                if use_se_variant else 0
            blocks = []
            for ix in range(n):
                se = ix >= n - n_se
                stride = 2 if ix == 0 else 1
                blocks.append(MobileOneBlockTorch(
                    in_ch, in_ch, 3, stride, groups=in_ch, use_se=se,
                    n_branches=n_branches))
                blocks.append(MobileOneBlockTorch(
                    in_ch, planes, 1, 1, use_se=se, n_branches=n_branches))
                in_ch = planes
            self.add_module(f"stage{s + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        feats = [x, self.stage0(x)]
        if self.depth < 2:
            return feats
        y = feats[-1]
        for s in range(4):
            y = getattr(self, f"stage{s + 1}")(y)
            feats.append(y)
            if self.depth < len(feats):
                break
        return feats

    def fused_param_count(self) -> int:
        return sum(m.fused_param_count() for m in self.modules()
                   if isinstance(m, MobileOneBlockTorch))


class MobileOneUnet(nn.Module):
    """smp.create_model('unet', 'mobileone_s*', ...) mirror."""

    def __init__(self, name="mobileone_s0", in_channels=3, classes=13):
        super().__init__()
        self.encoder = MobileOneEncoderTorch(name, in_channels)
        self.decoder = torch_ref.UnetDecoder(
            encoder_channels=mobileone_out_channels(name)[1:])
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(16, classes, 3, padding=1))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class MobileOneFPN(nn.Module):
    def __init__(self, name="mobileone_s0", in_channels=3, classes=7):
        super().__init__()
        self.encoder = MobileOneEncoderTorch(name, in_channels)
        self.decoder = torch_ref.FPNDecoder(
            encoder_channels=mobileone_out_channels(name)[1:])
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(128, classes, 1), nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class MobileOneDeepLabV3Plus(nn.Module):
    """output_stride 16: stage4 dilated (smp make_dilated)."""

    def __init__(self, name="mobileone_s0", in_channels=3, classes=7):
        super().__init__()
        self.encoder = MobileOneEncoderTorch(name, in_channels)
        torch_ref._dilate_stage(self.encoder.stage4, 2)
        self.decoder = torch_ref.DeepLabV3PlusDecoder(
            encoder_channels=mobileone_out_channels(name)[1:])
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(256, classes, 1), nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))
