"""Test-only torch mirrors of smp's pretrainedmodels-backed encoders
(xception; senet lives in torch_ref_senet.py).

smp/encoders/xception.py wraps pretrainedmodels' Xception; neither is
installed here, so this mirror reconstructs the exact state-dict surface
(``encoder.conv1/bn1/conv2/bn2``, ``encoder.block{1..12}.rep.{j}.*`` with
``conv1``/``pointwise`` separable pairs, ``skip``/``skipbn`` residuals,
``conv3``/``conv4`` exit separables) and numerics, including smp's
padding patch (conv1/conv2 padding 0 -> 1) and stage taps.

Like the other smp mirrors (tests/torch_ref.py:1-8), a deviation from
real pretrainedmodels would pass parity silently — the committed
key/shape manifests (tests/smp_manifests) pin the state-dict surface.
"""

from __future__ import annotations

import torch.nn as nn

from tests import torch_ref


class SeparableConv2d(nn.Module):
    def __init__(self, cin, cout, kernel=3, stride=1, padding=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cin, kernel, stride, padding,
                               groups=cin, bias=False)
        self.pointwise = nn.Conv2d(cin, cout, 1, bias=False)

    def forward(self, x):
        return self.pointwise(self.conv1(x))


class XceptionTorchBlock(nn.Module):
    def __init__(self, in_f, out_f, reps, strides=1, start_with_relu=True,
                 grow_first=True):
        super().__init__()
        if out_f != in_f or strides != 1:
            self.skip = nn.Conv2d(in_f, out_f, 1, stride=strides, bias=False)
            self.skipbn = nn.BatchNorm2d(out_f)
        else:
            self.skip = None
        rep = []
        filters = in_f
        if grow_first:
            rep += [nn.ReLU(inplace=False), SeparableConv2d(in_f, out_f),
                    nn.BatchNorm2d(out_f)]
            filters = out_f
        for _ in range(reps - 1):
            rep += [nn.ReLU(inplace=False), SeparableConv2d(filters, filters),
                    nn.BatchNorm2d(filters)]
        if not grow_first:
            rep += [nn.ReLU(inplace=False), SeparableConv2d(in_f, out_f),
                    nn.BatchNorm2d(out_f)]
        if not start_with_relu:
            rep = rep[1:]
        if strides != 1:
            rep.append(nn.MaxPool2d(3, strides, 1))
        self.rep = nn.Sequential(*rep)

    def forward(self, x):
        y = self.rep(x)
        skip = self.skipbn(self.skip(x)) if self.skip is not None else x
        return y + skip


XCEPTION_OUT = (64, 128, 256, 728, 2048)  # out_channels[1:]


class XceptionEncoderTorch(nn.Module):
    """smp XceptionEncoder mirror: pretrainedmodels Xception with smp's
    padding patch and get_stages() taps; stages truncated at ``depth`` like
    the other mirrors so reduced-depth key sets match."""

    def __init__(self, in_channels: int = 5, depth: int = 5):
        super().__init__()
        self.depth = depth
        # smp patches pretrainedmodels' padding-0 stem convs to padding 1
        self.conv1 = nn.Conv2d(in_channels, 32, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(32)
        self.conv2 = nn.Conv2d(32, 64, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=False)
        if depth >= 2:
            self.block1 = XceptionTorchBlock(64, 128, 2, 2,
                                             start_with_relu=False)
        if depth >= 3:
            self.block2 = XceptionTorchBlock(128, 256, 2, 2)
        if depth >= 4:
            self.block3 = XceptionTorchBlock(256, 728, 2, 2)
            for i in range(4, 12):
                self.add_module(f"block{i}",
                                XceptionTorchBlock(728, 728, 3, 1))
        if depth >= 5:
            self.block12 = XceptionTorchBlock(728, 1024, 2, 2,
                                              grow_first=False)
            self.conv3 = SeparableConv2d(1024, 1536)
            self.bn3 = nn.BatchNorm2d(1536)
            self.conv4 = SeparableConv2d(1536, 2048)
            self.bn4 = nn.BatchNorm2d(2048)

    def forward(self, x):
        feats = [x]
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        feats.append(y)
        if self.depth >= 2:
            y = self.block1(y)
            feats.append(y)
        if self.depth >= 3:
            y = self.block2(y)
            feats.append(y)
        if self.depth >= 4:
            y = self.block3(y)
            for i in range(4, 12):
                y = getattr(self, f"block{i}")(y)
            feats.append(y)
        if self.depth >= 5:
            y = self.block12(y)
            y = self.relu(self.bn3(self.conv3(y)))
            y = self.bn4(self.conv4(y))  # no trailing relu (smp stage 5)
            feats.append(y)
        return feats


class XceptionUnet(nn.Module):
    """smp.create_model('unet', 'xception', ...) mirror (manifest shape)."""

    def __init__(self, in_channels=5, classes=13):
        super().__init__()
        self.encoder = XceptionEncoderTorch(in_channels)
        self.decoder = torch_ref.UnetDecoder(encoder_channels=XCEPTION_OUT)
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(16, classes, 3, padding=1))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class XceptionFPN(nn.Module):
    def __init__(self, in_channels=5, classes=7):
        super().__init__()
        self.encoder = XceptionEncoderTorch(in_channels)
        self.decoder = torch_ref.FPNDecoder(encoder_channels=XCEPTION_OUT)
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(128, classes, 1), nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class XceptionPSPNet(nn.Module):
    def __init__(self, in_channels=5, classes=7):
        super().__init__()
        self.encoder = XceptionEncoderTorch(in_channels, depth=3)
        self.decoder = torch_ref.PSPDecoder(in_ch=256)
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(512, classes, 3, padding=1),
            nn.UpsamplingBilinear2d(scale_factor=8))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))
