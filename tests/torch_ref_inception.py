"""Test-only torch mirrors of smp's inception encoders
(InceptionV4, InceptionResNetV2 — pretrainedmodels topology).

smp/encoders/inceptionv4.py and inceptionresnetv2.py wrap pretrainedmodels'
nets; neither library is installed here, so these mirrors reconstruct the
exact state-dict surface (``encoder.features.{i}.*`` for v4;
``encoder.conv2d_1a/mixed_5b/repeat.{j}/...`` for resnetv2) and numerics,
including smp's padding patch (every 3x3 conv -> padding 1, every maxpool
-> padding 1), the count_include_pad=False branch avg-pools, the residual
blocks' biased 1x1 ``conv2d`` with scale, and the stage taps.

Like the other smp mirrors (tests/torch_ref.py:1-8), a deviation from real
pretrainedmodels would pass parity silently — the committed key/shape
manifests (tests/smp_manifests) pin the state-dict surface.
"""

from __future__ import annotations

import torch
import torch.nn as nn

from tests import torch_ref


class BasicConv2d(nn.Module):
    def __init__(self, cin, cout, kernel_size=1, stride=1, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, kernel_size, stride, padding,
                              bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)
        self.relu = nn.ReLU(inplace=False)

    def forward(self, x):
        return self.relu(self.bn(self.conv(x)))


def _bc3(cin, cout, stride=1):
    # smp's "correct paddings" patch: all 3x3 convs get padding 1
    return BasicConv2d(cin, cout, 3, stride, 1)


def _avg():
    return nn.AvgPool2d(3, stride=1, padding=1, count_include_pad=False)


def _pool():
    # smp's patch: all MaxPool2d get padding 1
    return nn.MaxPool2d(3, stride=2, padding=1)


# ---------------------------------------------------------------- InceptionV4


class Mixed_3a(nn.Module):
    def __init__(self):
        super().__init__()
        self.maxpool = _pool()
        self.conv = _bc3(64, 96, 2)

    def forward(self, x):
        return torch.cat((self.maxpool(x), self.conv(x)), 1)


class Mixed_4a(nn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = nn.Sequential(BasicConv2d(160, 64), _bc3(64, 96))
        self.branch1 = nn.Sequential(
            BasicConv2d(160, 64),
            BasicConv2d(64, 64, (1, 7), 1, (0, 3)),
            BasicConv2d(64, 64, (7, 1), 1, (3, 0)),
            _bc3(64, 96))

    def forward(self, x):
        return torch.cat((self.branch0(x), self.branch1(x)), 1)


class Mixed_5a(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = _bc3(192, 192, 2)
        self.maxpool = _pool()

    def forward(self, x):
        return torch.cat((self.conv(x), self.maxpool(x)), 1)


class Inception_A(nn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = BasicConv2d(384, 96)
        self.branch1 = nn.Sequential(BasicConv2d(384, 64), _bc3(64, 96))
        self.branch2 = nn.Sequential(BasicConv2d(384, 64), _bc3(64, 96),
                                     _bc3(96, 96))
        self.branch3 = nn.Sequential(_avg(), BasicConv2d(384, 96))

    def forward(self, x):
        return torch.cat((self.branch0(x), self.branch1(x), self.branch2(x),
                          self.branch3(x)), 1)


class Reduction_A(nn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = _bc3(384, 384, 2)
        self.branch1 = nn.Sequential(BasicConv2d(384, 192), _bc3(192, 224),
                                     _bc3(224, 256, 2))
        self.branch2 = _pool()

    def forward(self, x):
        return torch.cat((self.branch0(x), self.branch1(x),
                          self.branch2(x)), 1)


class Inception_B(nn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = BasicConv2d(1024, 384)
        self.branch1 = nn.Sequential(
            BasicConv2d(1024, 192),
            BasicConv2d(192, 224, (1, 7), 1, (0, 3)),
            BasicConv2d(224, 256, (7, 1), 1, (3, 0)))
        self.branch2 = nn.Sequential(
            BasicConv2d(1024, 192),
            BasicConv2d(192, 192, (7, 1), 1, (3, 0)),
            BasicConv2d(192, 224, (1, 7), 1, (0, 3)),
            BasicConv2d(224, 224, (7, 1), 1, (3, 0)),
            BasicConv2d(224, 256, (1, 7), 1, (0, 3)))
        self.branch3 = nn.Sequential(_avg(), BasicConv2d(1024, 128))

    def forward(self, x):
        return torch.cat((self.branch0(x), self.branch1(x), self.branch2(x),
                          self.branch3(x)), 1)


class Reduction_B(nn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = nn.Sequential(BasicConv2d(1024, 192),
                                     _bc3(192, 192, 2))
        self.branch1 = nn.Sequential(
            BasicConv2d(1024, 256),
            BasicConv2d(256, 256, (1, 7), 1, (0, 3)),
            BasicConv2d(256, 320, (7, 1), 1, (3, 0)),
            _bc3(320, 320, 2))
        self.branch2 = _pool()

    def forward(self, x):
        return torch.cat((self.branch0(x), self.branch1(x),
                          self.branch2(x)), 1)


class Inception_C(nn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = BasicConv2d(1536, 256)
        self.branch1_0 = BasicConv2d(1536, 384)
        self.branch1_1a = BasicConv2d(384, 256, (1, 3), 1, (0, 1))
        self.branch1_1b = BasicConv2d(384, 256, (3, 1), 1, (1, 0))
        self.branch2_0 = BasicConv2d(1536, 384)
        self.branch2_1 = BasicConv2d(384, 448, (3, 1), 1, (1, 0))
        self.branch2_2 = BasicConv2d(448, 512, (1, 3), 1, (0, 1))
        self.branch2_3a = BasicConv2d(512, 256, (1, 3), 1, (0, 1))
        self.branch2_3b = BasicConv2d(512, 256, (3, 1), 1, (1, 0))
        self.branch3 = nn.Sequential(_avg(), BasicConv2d(1536, 256))

    def forward(self, x):
        x0 = self.branch0(x)
        y1 = self.branch1_0(x)
        x1 = torch.cat((self.branch1_1a(y1), self.branch1_1b(y1)), 1)
        y2 = self.branch2_2(self.branch2_1(self.branch2_0(x)))
        x2 = torch.cat((self.branch2_3a(y2), self.branch2_3b(y2)), 1)
        return torch.cat((x0, x1, x2, self.branch3(x)), 1)


INCEPTIONV4_OUT = (64, 192, 384, 1024, 1536)  # out_channels[1:]


class InceptionV4EncoderTorch(nn.Module):
    """smp InceptionV4Encoder mirror: the 22-module ``features`` Sequential
    sliced at stage_idxs (3, 5, 9, 15); truncated at ``depth`` like the
    other mirrors so reduced-depth key sets match."""

    def __init__(self, in_channels: int = 3, depth: int = 5):
        super().__init__()
        self.depth = depth
        self.stage_idxs = (3, 5, 9, 15)
        mods = [_bc3(in_channels, 32, 2), _bc3(32, 32), _bc3(32, 64)]
        if depth >= 2:
            mods += [Mixed_3a(), Mixed_4a()]
        if depth >= 3:
            mods += [Mixed_5a(), Inception_A(), Inception_A(), Inception_A()]
        if depth >= 4:
            mods += [Inception_A(), Reduction_A(), Inception_B(),
                     Inception_B(), Inception_B(), Inception_B()]
        if depth >= 5:
            mods += [Inception_B(), Inception_B(), Inception_B(),
                     Reduction_B(), Inception_C(), Inception_C(),
                     Inception_C()]
        self.features = nn.Sequential(*mods)

    def forward(self, x):
        feats = [x]
        idxs = (0,) + self.stage_idxs[: self.depth - 1] + (len(self.features),)
        y = x
        for a, b in zip(idxs[:-1], idxs[1:]):
            y = self.features[a:b](y)
            feats.append(y)
        return feats


# --------------------------------------------------------- InceptionResNetV2


class Mixed_5b(nn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = BasicConv2d(192, 96)
        self.branch1 = nn.Sequential(BasicConv2d(192, 48),
                                     BasicConv2d(48, 64, 5, 1, 2))
        self.branch2 = nn.Sequential(BasicConv2d(192, 64), _bc3(64, 96),
                                     _bc3(96, 96))
        self.branch3 = nn.Sequential(_avg(), BasicConv2d(192, 64))

    def forward(self, x):
        return torch.cat((self.branch0(x), self.branch1(x), self.branch2(x),
                          self.branch3(x)), 1)


class Block35(nn.Module):
    def __init__(self, scale=1.0):
        super().__init__()
        self.scale = scale
        self.branch0 = BasicConv2d(320, 32)
        self.branch1 = nn.Sequential(BasicConv2d(320, 32), _bc3(32, 32))
        self.branch2 = nn.Sequential(BasicConv2d(320, 32), _bc3(32, 48),
                                     _bc3(48, 64))
        self.conv2d = nn.Conv2d(128, 320, 1)
        self.relu = nn.ReLU(inplace=False)

    def forward(self, x):
        out = torch.cat((self.branch0(x), self.branch1(x),
                         self.branch2(x)), 1)
        return self.relu(x + self.scale * self.conv2d(out))


class Mixed_6a(nn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = _bc3(320, 384, 2)
        self.branch1 = nn.Sequential(BasicConv2d(320, 256), _bc3(256, 256),
                                     _bc3(256, 384, 2))
        self.branch2 = _pool()

    def forward(self, x):
        return torch.cat((self.branch0(x), self.branch1(x),
                          self.branch2(x)), 1)


class Block17(nn.Module):
    def __init__(self, scale=1.0):
        super().__init__()
        self.scale = scale
        self.branch0 = BasicConv2d(1088, 192)
        self.branch1 = nn.Sequential(
            BasicConv2d(1088, 128),
            BasicConv2d(128, 160, (1, 7), 1, (0, 3)),
            BasicConv2d(160, 192, (7, 1), 1, (3, 0)))
        self.conv2d = nn.Conv2d(384, 1088, 1)
        self.relu = nn.ReLU(inplace=False)

    def forward(self, x):
        out = torch.cat((self.branch0(x), self.branch1(x)), 1)
        return self.relu(x + self.scale * self.conv2d(out))


class Mixed_7a(nn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = nn.Sequential(BasicConv2d(1088, 256),
                                     _bc3(256, 384, 2))
        self.branch1 = nn.Sequential(BasicConv2d(1088, 256),
                                     _bc3(256, 288, 2))
        self.branch2 = nn.Sequential(BasicConv2d(1088, 256), _bc3(256, 288),
                                     _bc3(288, 320, 2))
        self.branch3 = _pool()

    def forward(self, x):
        return torch.cat((self.branch0(x), self.branch1(x), self.branch2(x),
                          self.branch3(x)), 1)


class Block8(nn.Module):
    def __init__(self, scale=1.0, noReLU=False):
        super().__init__()
        self.scale = scale
        self.noReLU = noReLU
        self.branch0 = BasicConv2d(2080, 192)
        self.branch1 = nn.Sequential(
            BasicConv2d(2080, 192),
            BasicConv2d(192, 224, (1, 3), 1, (0, 1)),
            BasicConv2d(224, 256, (3, 1), 1, (1, 0)))
        self.conv2d = nn.Conv2d(448, 2080, 1)
        if not noReLU:
            self.relu = nn.ReLU(inplace=False)

    def forward(self, x):
        out = torch.cat((self.branch0(x), self.branch1(x)), 1)
        out = x + self.scale * self.conv2d(out)
        return out if self.noReLU else self.relu(out)


INCEPTIONRESNETV2_OUT = (64, 192, 320, 1088, 1536)  # out_channels[1:]


class InceptionResNetV2EncoderTorch(nn.Module):
    """smp InceptionResNetV2Encoder mirror (get_stages() taps), truncated at
    ``depth``."""

    def __init__(self, in_channels: int = 3, depth: int = 5):
        super().__init__()
        self.depth = depth
        self.conv2d_1a = _bc3(in_channels, 32, 2)
        self.conv2d_2a = _bc3(32, 32)
        self.conv2d_2b = _bc3(32, 64)
        if depth >= 2:
            self.maxpool_3a = _pool()
            self.conv2d_3b = BasicConv2d(64, 80)
            self.conv2d_4a = _bc3(80, 192)
        if depth >= 3:
            self.maxpool_5a = _pool()
            self.mixed_5b = Mixed_5b()
            self.repeat = nn.Sequential(*[Block35(0.17) for _ in range(10)])
        if depth >= 4:
            self.mixed_6a = Mixed_6a()
            self.repeat_1 = nn.Sequential(*[Block17(0.10) for _ in range(20)])
        if depth >= 5:
            self.mixed_7a = Mixed_7a()
            self.repeat_2 = nn.Sequential(*[Block8(0.20) for _ in range(9)])
            self.block8 = Block8(noReLU=True)
            self.conv2d_7b = BasicConv2d(2080, 1536)

    def forward(self, x):
        feats = [x]
        y = self.conv2d_2b(self.conv2d_2a(self.conv2d_1a(x)))
        feats.append(y)
        if self.depth >= 2:
            y = self.conv2d_4a(self.conv2d_3b(self.maxpool_3a(y)))
            feats.append(y)
        if self.depth >= 3:
            y = self.repeat(self.mixed_5b(self.maxpool_5a(y)))
            feats.append(y)
        if self.depth >= 4:
            y = self.repeat_1(self.mixed_6a(y))
            feats.append(y)
        if self.depth >= 5:
            y = self.conv2d_7b(self.block8(self.repeat_2(self.mixed_7a(y))))
            feats.append(y)
        return feats


# ------------------------------------------------------------- full models


_ENCODERS = {
    "inceptionv4": (InceptionV4EncoderTorch, INCEPTIONV4_OUT),
    "inceptionresnetv2": (InceptionResNetV2EncoderTorch,
                          INCEPTIONRESNETV2_OUT),
}


class InceptionUnet(nn.Module):
    """smp.create_model('unet', 'inception*', ...) mirror."""

    def __init__(self, name="inceptionv4", in_channels=3, classes=13):
        super().__init__()
        cls, out = _ENCODERS[name]
        self.encoder = cls(in_channels)
        self.decoder = torch_ref.UnetDecoder(encoder_channels=out)
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(16, classes, 3, padding=1))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class InceptionFPN(nn.Module):
    def __init__(self, name="inceptionv4", in_channels=3, classes=7):
        super().__init__()
        cls, out = _ENCODERS[name]
        self.encoder = cls(in_channels)
        self.decoder = torch_ref.FPNDecoder(encoder_channels=out)
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(128, classes, 1), nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class InceptionPSPNet(nn.Module):
    def __init__(self, name="inceptionv4", in_channels=3, classes=7):
        super().__init__()
        cls, out = _ENCODERS[name]
        self.encoder = cls(in_channels, depth=3)
        self.decoder = torch_ref.PSPDecoder(in_ch=out[2])
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(512, classes, 3, padding=1),
            nn.UpsamplingBilinear2d(scale_factor=8))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))
