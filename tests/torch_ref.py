"""Test-only torch mirror of the smp 0.3.3 ResNet34-U-Net.

Used as the numerical ground truth for converter/parity tests: it produces a
state dict with exactly the key names segmentation-models-pytorch emits
(encoder.conv1.*, encoder.layerS.U.*, decoder.blocks.I.convK.{0,1}.*,
segmentation_head.0.*), so tests can validate flairtpu's converter and logit
parity without the smp package (not installed in this image).
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class BasicBlock(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, stride: int = 1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(out_ch)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch)
        self.downsample = None
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride, bias=False),
                nn.BatchNorm2d(out_ch),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + identity)


class ResNet34Encoder(nn.Module):
    def __init__(self, in_channels: int):
        super().__init__()
        self.conv1 = nn.Conv2d(in_channels, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)

        def stage(in_ch, out_ch, n, stride):
            blocks = [BasicBlock(in_ch, out_ch, stride)]
            blocks += [BasicBlock(out_ch, out_ch) for _ in range(n - 1)]
            return nn.Sequential(*blocks)

        self.layer1 = stage(64, 64, 3, 1)
        self.layer2 = stage(64, 128, 4, 2)
        self.layer3 = stage(128, 256, 6, 2)
        self.layer4 = stage(256, 512, 3, 2)

    def forward(self, x):
        feats = [x]
        x = self.relu(self.bn1(self.conv1(x)))
        feats.append(x)
        x = self.layer1(self.maxpool(x))
        feats.append(x)
        for layer in (self.layer2, self.layer3, self.layer4):
            x = layer(x)
            feats.append(x)
        return feats


class DecoderBlock(nn.Module):
    def __init__(self, in_ch: int, skip_ch: int, out_ch: int):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.Conv2d(in_ch + skip_ch, out_ch, 3, padding=1, bias=False),
            nn.BatchNorm2d(out_ch), nn.ReLU(inplace=True))
        self.conv2 = nn.Sequential(
            nn.Conv2d(out_ch, out_ch, 3, padding=1, bias=False),
            nn.BatchNorm2d(out_ch), nn.ReLU(inplace=True))

    def forward(self, x, skip=None):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        if skip is not None:
            x = torch.cat([x, skip], dim=1)
        return self.conv2(self.conv1(x))


class UnetDecoder(nn.Module):
    def __init__(self, encoder_channels=(64, 64, 128, 256, 512),
                 decoder_channels=(256, 128, 64, 32, 16)):
        super().__init__()
        enc = list(encoder_channels)[::-1]  # (512, 256, 128, 64, 64)
        in_chs = [enc[0]] + list(decoder_channels[:-1])
        skip_chs = enc[1:] + [0]
        self.blocks = nn.ModuleList(
            [DecoderBlock(i, s, o) for i, s, o in zip(in_chs, skip_chs, decoder_channels)]
        )

    def forward(self, *features):
        feats = list(features[1:])[::-1]
        x, skips = feats[0], feats[1:]
        for i, block in enumerate(self.blocks):
            x = block(x, skips[i] if i < len(skips) else None)
        return x


class ResNet34Unet(nn.Module):
    """smp.create_model('unet', 'resnet34', classes=C, in_channels=N) mirror."""

    def __init__(self, in_channels: int = 5, classes: int = 13):
        super().__init__()
        self.encoder = ResNet34Encoder(in_channels)
        self.decoder = UnetDecoder()
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(16, classes, 3, padding=1))

    def forward(self, x):
        feats = self.encoder(x)
        return self.segmentation_head(self.decoder(*feats))


class MetadataMLP(nn.Module):
    """reference src/flair/model.py:82-92."""

    def __init__(self):
        super().__init__()
        self.enc_mlp = nn.Sequential(
            nn.Linear(45, 64), nn.Dropout(0.4), nn.ReLU(),
            nn.Linear(64, 32), nn.Dropout(0.4), nn.ReLU(),
            nn.Linear(32, 16), nn.Dropout(0.4), nn.ReLU(),
        )

    def forward(self, x):
        return self.enc_mlp(x)
