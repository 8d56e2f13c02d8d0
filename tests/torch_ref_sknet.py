"""Test-only torch mirror of smp's timm-sknet encoders (skresnet18/34,
skresnext50_32x4d).

smp/encoders/timm_sknet.py wraps timm's ResNet with SelectiveKernel
blocks; timm is not installed here, so this mirror reconstructs the exact
state-dict surface (``layer{s}.{i}.conv{n}.paths.{j}.{conv,bn}``,
``conv{n}.attn.{fc_reduce,bn,fc_select}``, ConvNormAct ``conv{n}.{conv,
bn}``, standard conv1/bn1 stem and downsample.{0,1}) and numerics
(split_input on the basic blocks, path-axis softmax attention). Caveat as
tests/torch_ref.py:1-8; the committed key/shape manifests pin the surface.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

from flairtpu.models.sknet import SKNET_SPECS, _make_divisible
from tests import torch_ref


class ConvNormTorch(nn.Module):
    def __init__(self, cin, cout, k=3, stride=1, dilation=1, groups=1,
                 act=True):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride, (k // 2) * dilation,
                              dilation, groups, bias=False)
        self.bn = nn.BatchNorm2d(cout)
        self.act = act

    def forward(self, x):
        y = self.bn(self.conv(x))
        return F.relu(y) if self.act else y


class SKAttnTorch(nn.Module):
    def __init__(self, channels, attn_ch, n_paths=2):
        super().__init__()
        self.n_paths = n_paths
        self.fc_reduce = nn.Conv2d(channels, attn_ch, 1, bias=False)
        self.bn = nn.BatchNorm2d(attn_ch)
        self.fc_select = nn.Conv2d(attn_ch, channels * n_paths, 1, bias=False)

    def forward(self, x):  # (B, paths, C, H, W)
        g = x.sum(1).mean((2, 3), keepdim=True)
        g = self.fc_select(F.relu(self.bn(self.fc_reduce(g))))
        B, C, H, W = g.shape
        return torch.softmax(
            g.view(B, self.n_paths, C // self.n_paths, H, W), dim=1)


class SelectiveKernelTorch(nn.Module):
    def __init__(self, cin, cout, stride=1, groups=1, rd_ratio=1 / 16,
                 rd_divisor=32, split_input=True):
        super().__init__()
        self.split_input = split_input
        pin = cin // 2 if split_input else cin
        self.paths = nn.ModuleList([
            ConvNormTorch(pin, cout, 3, stride, dilation=d,
                          groups=min(cout, groups)) for d in (1, 2)])
        self.attn = SKAttnTorch(cout,
                                _make_divisible(cout * rd_ratio, rd_divisor))

    def forward(self, x):
        if self.split_input:
            half = x.shape[1] // 2
            xs = [x[:, :half], x[:, half:]]
        else:
            xs = [x, x]
        stacked = torch.stack([p(xi) for p, xi in zip(self.paths, xs)], 1)
        return (stacked * self.attn(stacked)).sum(1)


class SKBlockTorch(nn.Module):
    def __init__(self, kind, in_ch, planes, stride, card, bw, rd_ratio,
                 rd_div, split):
        super().__init__()
        self.kind = kind
        out_ch = planes * (1 if kind == "basic" else 4)
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride, bias=False),
                nn.BatchNorm2d(out_ch))
        else:
            self.downsample = None
        sk = lambda ci, co, g: SelectiveKernelTorch(
            ci, co, stride, g, rd_ratio, rd_div, split)
        if kind == "basic":
            self.conv1 = sk(in_ch, planes, 1)
            self.conv2 = ConvNormTorch(planes, planes, 3, act=False)
        else:
            width = int(planes * (bw / 64.0)) * card
            self.conv1 = ConvNormTorch(in_ch, width, 1)
            self.conv2 = sk(width, width, card)
            self.conv3 = ConvNormTorch(width, out_ch, 1, act=False)

    def forward(self, x):
        shortcut = self.downsample(x) if self.downsample is not None else x
        y = self.conv2(self.conv1(x))
        if self.kind != "basic":
            y = self.conv3(y)
        return F.relu(y + shortcut)


class SKNetEncoderTorch(nn.Module):
    """smp TimmSkNetEncoder mirror, truncated at ``depth``."""

    def __init__(self, name="timm-skresnet18", in_channels=3, depth=5):
        super().__init__()
        kind, layers, card, bw, rd_ratio, rd_div, split = SKNET_SPECS[name]
        self.depth = depth
        self.conv1 = nn.Conv2d(in_channels, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        e = 1 if kind == "basic" else 4
        in_ch = 64
        for s, n in enumerate(layers):
            if depth < s + 2:
                break
            planes = 64 * (2 ** s)
            stride = 1 if s == 0 else 2
            blocks = [SKBlockTorch(kind, in_ch if i == 0 else planes * e,
                                   planes, stride if i == 0 else 1,
                                   card, bw, rd_ratio, rd_div, split)
                      for i in range(n)]
            self.add_module(f"layer{s + 1}", nn.Sequential(*blocks))
            in_ch = planes * e

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


def sknet_out_channels(name):
    e = 1 if SKNET_SPECS[name][0] == "basic" else 4
    return (64, 64 * e, 128 * e, 256 * e, 512 * e)


class SKNetUnet(nn.Module):
    """smp.create_model('unet', 'timm-skresnet*', ...) mirror."""

    def __init__(self, name="timm-skresnet18", in_channels=3, classes=13):
        super().__init__()
        self.encoder = SKNetEncoderTorch(name, in_channels)
        self.decoder = torch_ref.UnetDecoder(
            encoder_channels=sknet_out_channels(name))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(16, classes, 3, padding=1))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class SKNetFPN(nn.Module):
    def __init__(self, name="timm-skresnet18", in_channels=3, classes=7):
        super().__init__()
        self.encoder = SKNetEncoderTorch(name, in_channels)
        self.decoder = torch_ref.FPNDecoder(
            encoder_channels=sknet_out_channels(name))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(128, classes, 1), nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))
