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
    def __init__(self, in_channels: int, depth: int = 5):
        super().__init__()
        self.depth = depth
        self.conv1 = nn.Conv2d(in_channels, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)

        def stage(in_ch, out_ch, n, stride):
            blocks = [BasicBlock(in_ch, out_ch, stride)]
            blocks += [BasicBlock(out_ch, out_ch) for _ in range(n - 1)]
            return nn.Sequential(*blocks)

        specs = [(64, 64, 3, 1), (64, 128, 4, 2), (128, 256, 6, 2),
                 (256, 512, 3, 2)]
        for i, spec in enumerate(specs[:max(depth - 1, 0)], start=1):
            setattr(self, f"layer{i}", stage(*spec))

    def forward(self, x):
        feats = [x]
        x = self.relu(self.bn1(self.conv1(x)))
        feats.append(x)
        if self.depth >= 2:
            x = self.layer1(self.maxpool(x))
            feats.append(x)
        for i in range(2, self.depth):
            x = getattr(self, f"layer{i}")(x)
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


# ---------------------------------------------------------------------------
# smp 0.3.3 DeepLabV3Plus mirror (decoders/deeplabv3/decoder.py key names)
# ---------------------------------------------------------------------------

class SeparableConv2d(nn.Sequential):
    def __init__(self, in_ch, out_ch, kernel_size, stride=1, padding=0,
                 dilation=1, bias=True):
        depthwise = nn.Conv2d(in_ch, in_ch, kernel_size, stride, padding,
                              dilation, groups=in_ch, bias=False)
        pointwise = nn.Conv2d(in_ch, out_ch, 1, bias=bias)
        super().__init__(depthwise, pointwise)


class ASPPSeparableConv(nn.Sequential):
    def __init__(self, in_ch, out_ch, dilation):
        super().__init__(
            SeparableConv2d(in_ch, out_ch, 3, padding=dilation,
                            dilation=dilation, bias=False),
            nn.BatchNorm2d(out_ch), nn.ReLU())


class ASPPPooling(nn.Sequential):
    def __init__(self, in_ch, out_ch):
        super().__init__(nn.AdaptiveAvgPool2d(1),
                         nn.Conv2d(in_ch, out_ch, 1, bias=False),
                         nn.BatchNorm2d(out_ch), nn.ReLU())

    def forward(self, x):
        size = x.shape[-2:]
        for mod in self:
            x = mod(x)
        return F.interpolate(x, size=size, mode="bilinear", align_corners=False)


class ASPPConv(nn.Sequential):
    def __init__(self, in_ch, out_ch, dilation):
        super().__init__(
            nn.Conv2d(in_ch, out_ch, 3, padding=dilation, dilation=dilation,
                      bias=False),
            nn.BatchNorm2d(out_ch), nn.ReLU())


class ASPP(nn.Module):
    def __init__(self, in_ch, out_ch, atrous_rates=(12, 24, 36),
                 separable=True):
        super().__init__()
        mods = [nn.Sequential(nn.Conv2d(in_ch, out_ch, 1, bias=False),
                              nn.BatchNorm2d(out_ch), nn.ReLU())]
        branch = ASPPSeparableConv if separable else ASPPConv
        for rate in atrous_rates:
            mods.append(branch(in_ch, out_ch, rate))
        mods.append(ASPPPooling(in_ch, out_ch))
        self.convs = nn.ModuleList(mods)
        self.project = nn.Sequential(
            nn.Conv2d(5 * out_ch, out_ch, 1, bias=False),
            nn.BatchNorm2d(out_ch), nn.ReLU(), nn.Dropout(0.5))

    def forward(self, x):
        return self.project(torch.cat([conv(x) for conv in self.convs], dim=1))


class DeepLabV3PlusDecoder(nn.Module):
    def __init__(self, encoder_channels=(64, 64, 128, 256, 512),
                 out_channels=256):
        super().__init__()
        self.aspp = nn.Sequential(
            ASPP(encoder_channels[-1], out_channels),
            SeparableConv2d(out_channels, out_channels, 3, padding=1, bias=False),
            nn.BatchNorm2d(out_channels), nn.ReLU())
        self.up = nn.UpsamplingBilinear2d(scale_factor=4)
        self.block1 = nn.Sequential(
            nn.Conv2d(encoder_channels[-4], 48, 1, bias=False),
            nn.BatchNorm2d(48), nn.ReLU())
        self.block2 = nn.Sequential(
            SeparableConv2d(48 + out_channels, out_channels, 3, padding=1,
                            bias=False),
            nn.BatchNorm2d(out_channels), nn.ReLU())

    def forward(self, *features):
        aspp = self.up(self.aspp(features[-1]))
        high = self.block1(features[-4])
        return self.block2(torch.cat([aspp, high], dim=1))


def _dilate_stage(stage: nn.Module, rate: int) -> None:
    """smp encoders/_utils.replace_strides_with_dilation."""
    for mod in stage.modules():
        if isinstance(mod, nn.Conv2d):
            mod.stride = (1, 1)
            mod.dilation = (rate, rate)
            k = mod.kernel_size[0]
            mod.padding = ((k // 2) * rate,) * 2


class ResNet34DeepLabV3Plus(nn.Module):
    """smp.create_model('deeplabv3plus', 'resnet34', ...) mirror (os=16)."""

    def __init__(self, in_channels: int = 5, classes: int = 13):
        super().__init__()
        self.encoder = ResNet34Encoder(in_channels)
        _dilate_stage(self.encoder.layer4, 2)
        self.decoder = DeepLabV3PlusDecoder()
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(256, classes, 1),
            nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        feats = self.encoder(x)
        return self.segmentation_head(self.decoder(*feats))


# ---------------------------------------------------------------------------
# smp 0.3.3 UnetPlusPlus mirror (decoders/unetplusplus/decoder.py key names)
# ---------------------------------------------------------------------------

class UnetPlusPlusDecoder(nn.Module):
    def __init__(self, encoder_channels=(64, 64, 128, 256, 512),
                 decoder_channels=(256, 128, 64, 32, 16)):
        super().__init__()
        enc = list(encoder_channels)[::-1]       # (512, 256, 128, 64, 64)
        head_channels = enc[0]
        self.in_channels = [head_channels] + list(decoder_channels[:-1])
        self.skip_channels = enc[1:] + [0]
        self.out_channels = list(decoder_channels)
        blocks = {}
        for layer_idx in range(len(self.in_channels) - 1):
            for depth_idx in range(layer_idx + 1):
                if depth_idx == 0:
                    in_ch = self.in_channels[layer_idx]
                    skip_ch = self.skip_channels[layer_idx] * (layer_idx + 1)
                    out_ch = self.out_channels[layer_idx]
                else:
                    out_ch = self.skip_channels[layer_idx]
                    skip_ch = self.skip_channels[layer_idx] * (
                        layer_idx + 1 - depth_idx)
                    in_ch = self.skip_channels[layer_idx - 1]
                blocks[f"x_{depth_idx}_{layer_idx}"] = DecoderBlock(
                    in_ch, skip_ch, out_ch)
        blocks[f"x_{0}_{len(self.in_channels) - 1}"] = DecoderBlock(
            self.in_channels[-1], 0, self.out_channels[-1])
        self.blocks = nn.ModuleDict(blocks)
        self.depth = len(self.in_channels) - 1

    def forward(self, *features):
        features = list(features[1:])[::-1]
        dense_x = {}
        for layer_idx in range(len(self.in_channels) - 1):
            for depth_idx in range(self.depth - layer_idx):
                if layer_idx == 0:
                    output = self.blocks[f"x_{depth_idx}_{depth_idx}"](
                        features[depth_idx], features[depth_idx + 1])
                    dense_x[f"x_{depth_idx}_{depth_idx}"] = output
                else:
                    dense_l_i = depth_idx + layer_idx
                    cat_features = torch.cat(
                        [dense_x[f"x_{idx}_{dense_l_i}"]
                         for idx in range(depth_idx + 1, dense_l_i + 1)], dim=1)
                    cat_features = torch.cat(
                        [cat_features, features[dense_l_i + 1]], dim=1)
                    dense_x[f"x_{depth_idx}_{dense_l_i}"] = self.blocks[
                        f"x_{depth_idx}_{dense_l_i}"](
                            dense_x[f"x_{depth_idx}_{dense_l_i - 1}"],
                            cat_features)
        dense_x[f"x_{0}_{self.depth}"] = self.blocks[f"x_{0}_{self.depth}"](
            dense_x[f"x_{0}_{self.depth - 1}"])
        return dense_x[f"x_{0}_{self.depth}"]


class ResNet34UnetPlusPlus(nn.Module):
    """smp.create_model('unetplusplus', 'resnet34', ...) mirror."""

    def __init__(self, in_channels: int = 5, classes: int = 13):
        super().__init__()
        self.encoder = ResNet34Encoder(in_channels)
        self.decoder = UnetPlusPlusDecoder()
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(16, classes, 3, padding=1))

    def forward(self, x):
        feats = self.encoder(x)
        return self.segmentation_head(self.decoder(*feats))


# ---------------------------------------------------------------------------
# smp 0.3.3 FPN mirror (decoders/fpn/decoder.py key names)
# ---------------------------------------------------------------------------

class Conv3x3GNReLU(nn.Module):
    def __init__(self, in_ch, out_ch, upsample=False):
        super().__init__()
        self.upsample = upsample
        self.block = nn.Sequential(
            nn.Conv2d(in_ch, out_ch, 3, padding=1, bias=False),
            nn.GroupNorm(32, out_ch),
            nn.ReLU(inplace=True))

    def forward(self, x):
        x = self.block(x)
        if self.upsample:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
        return x


class FPNBlock(nn.Module):
    def __init__(self, pyramid_channels, skip_channels):
        super().__init__()
        self.skip_conv = nn.Conv2d(skip_channels, pyramid_channels, 1)

    def forward(self, x, skip):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        return x + self.skip_conv(skip)


class SegmentationBlock(nn.Module):
    def __init__(self, in_ch, out_ch, n_upsamples=0):
        super().__init__()
        blocks = [Conv3x3GNReLU(in_ch, out_ch, upsample=bool(n_upsamples))]
        if n_upsamples > 1:
            blocks += [Conv3x3GNReLU(out_ch, out_ch, upsample=True)
                       for _ in range(1, n_upsamples)]
        self.block = nn.Sequential(*blocks)

    def forward(self, x):
        return self.block(x)


class FPNDecoder(nn.Module):
    def __init__(self, encoder_channels=(64, 64, 128, 256, 512),
                 pyramid_channels=256, segmentation_channels=128):
        super().__init__()
        self.p5 = nn.Conv2d(encoder_channels[-1], pyramid_channels, 1)
        self.p4 = FPNBlock(pyramid_channels, encoder_channels[-2])
        self.p3 = FPNBlock(pyramid_channels, encoder_channels[-3])
        self.p2 = FPNBlock(pyramid_channels, encoder_channels[-4])
        self.seg_blocks = nn.ModuleList([
            SegmentationBlock(pyramid_channels, segmentation_channels, n)
            for n in (3, 2, 1, 0)])
        self.dropout = nn.Dropout2d(0.2, inplace=True)

    def forward(self, *features):
        c2, c3, c4, c5 = features[-4:]
        p5 = self.p5(c5)
        p4 = self.p4(p5, c4)
        p3 = self.p3(p4, c3)
        p2 = self.p2(p3, c2)
        out = sum(b(p) for b, p in zip(self.seg_blocks, (p5, p4, p3, p2)))
        return self.dropout(out)


class ResNet34FPN(nn.Module):
    """smp.create_model('fpn', 'resnet34', ...) mirror."""

    def __init__(self, in_channels: int = 5, classes: int = 13):
        super().__init__()
        self.encoder = ResNet34Encoder(in_channels)
        self.decoder = FPNDecoder()
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(128, classes, 1),
            nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        feats = self.encoder(x)
        return self.segmentation_head(self.decoder(*feats))


# ---------------------------------------------------------------------------
# smp 0.3.3 PSPNet mirror (decoders/pspnet/decoder.py; encoder depth 3)
# ---------------------------------------------------------------------------

class PSPBlock(nn.Module):
    def __init__(self, in_ch, out_ch, pool_size):
        super().__init__()
        self.pool = nn.Sequential(
            nn.AdaptiveAvgPool2d(output_size=pool_size),
            nn.Sequential(nn.Conv2d(in_ch, out_ch, 1, bias=False),
                          nn.BatchNorm2d(out_ch), nn.ReLU(inplace=True)))

    def forward(self, x):
        h, w = x.shape[-2:]
        return F.interpolate(self.pool(x), size=(h, w), mode="bilinear",
                             align_corners=True)


class PSPModule(nn.Module):
    def __init__(self, in_ch, sizes=(1, 2, 3, 6)):
        super().__init__()
        self.blocks = nn.ModuleList(
            [PSPBlock(in_ch, in_ch // len(sizes), s) for s in sizes])

    def forward(self, x):
        xs = [b(x) for b in self.blocks] + [x]
        return torch.cat(xs, dim=1)


class PSPDecoder(nn.Module):
    def __init__(self, in_ch=128, out_channels=512):
        super().__init__()
        self.psp = PSPModule(in_ch)
        self.conv = nn.Sequential(nn.Conv2d(in_ch * 2, out_channels, 1,
                                            bias=False),
                                  nn.BatchNorm2d(out_channels),
                                  nn.ReLU(inplace=True))
        self.dropout = nn.Dropout2d(p=0.2)

    def forward(self, *features):
        return self.dropout(self.conv(self.psp(features[-1])))


class ResNet34PSPNet(nn.Module):
    """smp.create_model('pspnet', 'resnet34', ...) mirror (encoder_depth=3).

    NOTE: a real smp checkpoint also carries encoder.layer3/layer4 weights
    (smp keeps the unused stages); this mirror truncates the encoder so the
    key set matches what flairtpu's pspnet model instantiates. Real
    checkpoints load with strict=False.
    """

    def __init__(self, in_channels: int = 5, classes: int = 13):
        super().__init__()
        self.encoder = ResNet34Encoder(in_channels, depth=3)
        self.decoder = PSPDecoder()
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(512, classes, 3, padding=1),
            nn.UpsamplingBilinear2d(scale_factor=8))

    def forward(self, x):
        feats = self.encoder(x)
        return self.segmentation_head(self.decoder(*feats))


# ---------------------------------------------------------------------------
# smp 0.3.3 Linknet mirror (decoders/linknet/decoder.py key names)
# ---------------------------------------------------------------------------

class TransposeX2(nn.Sequential):
    def __init__(self, in_ch, out_ch):
        super().__init__(
            nn.ConvTranspose2d(in_ch, out_ch, kernel_size=4, stride=2,
                               padding=1),
            nn.BatchNorm2d(out_ch),
            nn.ReLU(inplace=True))


class LinknetDecoderBlock(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.block = nn.Sequential(
            nn.Sequential(nn.Conv2d(in_ch, in_ch // 4, 1, bias=False),
                          nn.BatchNorm2d(in_ch // 4), nn.ReLU(inplace=True)),
            TransposeX2(in_ch // 4, in_ch // 4),
            nn.Sequential(nn.Conv2d(in_ch // 4, out_ch, 1, bias=False),
                          nn.BatchNorm2d(out_ch), nn.ReLU(inplace=True)))

    def forward(self, x, skip=None):
        x = self.block(x)
        if skip is not None:
            x = x + skip
        return x


class LinknetDecoder(nn.Module):
    def __init__(self, encoder_channels=(64, 64, 128, 256, 512),
                 prefinal_channels=32):
        super().__init__()
        # encoder_channels here already excludes the input slot (smp's list
        # starts with in_ch and drops it with [1:]; ours starts at the stem)
        chans = list(encoder_channels[::-1]) + [prefinal_channels]
        self.blocks = nn.ModuleList(
            [LinknetDecoderBlock(chans[i], chans[i + 1]) for i in range(5)])

    def forward(self, *features):
        feats = list(features[1:])[::-1]
        x, skips = feats[0], feats[1:]
        for i, block in enumerate(self.blocks):
            x = block(x, skips[i] if i < len(skips) else None)
        return x


class ResNet34Linknet(nn.Module):
    """smp.create_model('linknet', 'resnet34', ...) mirror."""

    def __init__(self, in_channels: int = 5, classes: int = 13):
        super().__init__()
        self.encoder = ResNet34Encoder(in_channels)
        self.decoder = LinknetDecoder()
        self.segmentation_head = nn.Sequential(nn.Conv2d(32, classes, 1))

    def forward(self, x):
        feats = self.encoder(x)
        return self.segmentation_head(self.decoder(*feats))


# ---------------------------------------------------------------------------
# smp 0.3.3 DeepLabV3 (non-plus) mirror: Sequential decoder at os=8
# ---------------------------------------------------------------------------

class ResNet34DeepLabV3(nn.Module):
    """smp.create_model('deeplabv3', 'resnet34', ...) mirror (os=8)."""

    def __init__(self, in_channels: int = 5, classes: int = 13):
        super().__init__()
        self.encoder = ResNet34Encoder(in_channels)
        _dilate_stage(self.encoder.layer3, 2)
        _dilate_stage(self.encoder.layer4, 4)
        self.decoder = nn.Sequential(
            ASPP(512, 256, separable=False),
            nn.Conv2d(256, 256, 3, padding=1, bias=False),
            nn.BatchNorm2d(256),
            nn.ReLU())
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(256, classes, 1),
            nn.UpsamplingBilinear2d(scale_factor=8))

    def forward(self, x):
        feats = self.encoder(x)
        return self.segmentation_head(self.decoder(feats[-1]))


# ---------------------------------------------------------------------------
# torchvision Bottleneck / ResNeXt encoder mirror (smp resnext50_32x4d etc.)
# ---------------------------------------------------------------------------

class Bottleneck(nn.Module):
    def __init__(self, in_ch, planes, stride=1, groups=1, base_width=64):
        super().__init__()
        width = int(planes * base_width / 64) * groups
        self.conv1 = nn.Conv2d(in_ch, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, groups=groups,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or in_ch != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + identity)


class BottleneckEncoder(nn.Module):
    """torchvision bottleneck-family encoder (resnet50/101/152, resnext)."""

    def __init__(self, in_channels, units=(3, 4, 6, 3), groups=1,
                 base_width=64):
        super().__init__()
        self.conv1 = nn.Conv2d(in_channels, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)

        def stage(in_ch, planes, n, stride):
            blocks = [Bottleneck(in_ch, planes, stride, groups, base_width)]
            blocks += [Bottleneck(planes * 4, planes, 1, groups, base_width)
                       for _ in range(n - 1)]
            return nn.Sequential(*blocks)

        self.layer1 = stage(64, 64, units[0], 1)
        self.layer2 = stage(256, 128, units[1], 2)
        self.layer3 = stage(512, 256, units[2], 2)
        self.layer4 = stage(1024, 512, units[3], 2)

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


class ResNeXt50Unet(nn.Module):
    """smp.create_model('unet', 'resnext50_32x4d', ...) mirror."""

    def __init__(self, in_channels: int = 5, classes: int = 13):
        super().__init__()
        self.encoder = BottleneckEncoder(in_channels, (3, 4, 6, 3),
                                         groups=32, base_width=4)
        self.decoder = UnetDecoder(encoder_channels=(64, 256, 512, 1024, 2048))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(16, classes, 3, padding=1))

    def forward(self, x):
        feats = self.encoder(x)
        return self.segmentation_head(self.decoder(*feats))


# ---------------------------------------------------------------------------
# smp 0.3.3 MAnet mirror (decoders/manet/decoder.py key names)
# ---------------------------------------------------------------------------

def _conv2d_relu(in_ch: int, out_ch: int, k: int) -> nn.Sequential:
    """smp base/modules.Conv2dReLU with use_batchnorm=True."""
    return nn.Sequential(
        nn.Conv2d(in_ch, out_ch, k, padding=k // 2, bias=False),
        nn.BatchNorm2d(out_ch), nn.ReLU(inplace=True))


class PAB(nn.Module):
    """smp manet PAB: global-softmax position attention (incl. the flattened
    softmax and the transpose-free (hw, C)->(C, h, w) reshape)."""

    def __init__(self, in_channels: int, pab_channels: int = 64):
        super().__init__()
        self.pab_channels = pab_channels
        self.in_channels = in_channels
        self.top_conv = nn.Conv2d(in_channels, pab_channels, 1)
        self.center_conv = nn.Conv2d(in_channels, pab_channels, 1)
        self.bottom_conv = nn.Conv2d(in_channels, in_channels, 3, padding=1)
        self.map_softmax = nn.Softmax(dim=1)
        self.out_conv = nn.Conv2d(in_channels, in_channels, 3, padding=1)

    def forward(self, x):
        bsize, _, h, w = x.shape
        x_top = self.top_conv(x).flatten(2)
        x_center = self.center_conv(x).flatten(2).transpose(1, 2)
        x_bottom = self.bottom_conv(x).flatten(2).transpose(1, 2)
        sp_map = torch.matmul(x_center, x_top)
        sp_map = self.map_softmax(sp_map.view(bsize, -1)).view(bsize, h * w, h * w)
        sp_map = torch.matmul(sp_map, x_bottom)
        sp_map = sp_map.reshape(bsize, self.in_channels, h, w)
        return self.out_conv(x + sp_map)


class MFAB(nn.Module):
    """smp manet MFAB (dual squeeze-excitation fusion block)."""

    def __init__(self, in_ch: int, skip_ch: int, out_ch: int,
                 reduction: int = 16):
        super().__init__()
        self.hl_conv = nn.Sequential(
            _conv2d_relu(in_ch, in_ch, 3), _conv2d_relu(in_ch, skip_ch, 1))
        reduced = max(1, skip_ch // reduction)
        self.SE_ll = nn.Sequential(
            nn.AdaptiveAvgPool2d(1), nn.Conv2d(skip_ch, reduced, 1),
            nn.ReLU(inplace=True), nn.Conv2d(reduced, skip_ch, 1), nn.Sigmoid())
        self.SE_hl = nn.Sequential(
            nn.AdaptiveAvgPool2d(1), nn.Conv2d(skip_ch, reduced, 1),
            nn.ReLU(inplace=True), nn.Conv2d(reduced, skip_ch, 1), nn.Sigmoid())
        self.conv1 = _conv2d_relu(skip_ch + skip_ch, out_ch, 3)
        self.conv2 = _conv2d_relu(out_ch, out_ch, 3)

    def forward(self, x, skip=None):
        x = self.hl_conv(x)
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        attention_hl = self.SE_hl(x)
        if skip is not None:
            attention_ll = self.SE_ll(skip)
            attention_hl = attention_hl + attention_ll
            x = x * attention_hl
            x = torch.cat([x, skip], dim=1)
        return self.conv2(self.conv1(x))


class MAnetDecoder(nn.Module):
    def __init__(self, encoder_channels=(64, 64, 128, 256, 512),
                 decoder_channels=(256, 128, 64, 32, 16),
                 reduction: int = 16, pab_channels: int = 64):
        super().__init__()
        enc = list(encoder_channels)[::-1]       # (512, 256, 128, 64, 64)
        in_chs = [enc[0]] + list(decoder_channels[:-1])
        skip_chs = enc[1:] + [0]
        self.center = PAB(enc[0], pab_channels=pab_channels)
        self.blocks = nn.ModuleList([
            MFAB(i, s, o, reduction=reduction) if s > 0 else DecoderBlock(i, 0, o)
            for i, s, o in zip(in_chs, skip_chs, decoder_channels)])

    def forward(self, *features):
        feats = list(features[1:])[::-1]
        x, skips = feats[0], feats[1:]
        x = self.center(x)
        for i, block in enumerate(self.blocks):
            x = block(x, skips[i] if i < len(skips) else None)
        return x


class ResNet34MAnet(nn.Module):
    """smp.create_model('manet', 'resnet34', ...) mirror."""

    def __init__(self, in_channels: int = 5, classes: int = 13):
        super().__init__()
        self.encoder = ResNet34Encoder(in_channels)
        self.decoder = MAnetDecoder()
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(16, classes, 3, padding=1))

    def forward(self, x):
        feats = self.encoder(x)
        return self.segmentation_head(self.decoder(*feats))


# ---------------------------------------------------------------------------
# smp 0.3.3 PAN mirror (decoders/pan/decoder.py key names)
# ---------------------------------------------------------------------------

class PanConvBnRelu(nn.Module):
    """smp pan ConvBnRelu (conv bias=True; submodule names conv/bn)."""

    def __init__(self, in_ch: int, out_ch: int, k: int, padding: int = 0,
                 add_relu: bool = True):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, padding=padding, bias=True)
        self.bn = nn.BatchNorm2d(out_ch)
        self.add_relu = add_relu
        self.activation = nn.ReLU(inplace=True)

    def forward(self, x):
        x = self.bn(self.conv(x))
        return self.activation(x) if self.add_relu else x


class FPABlock(nn.Module):
    def __init__(self, in_ch: int, out_ch: int):
        super().__init__()
        self.branch1 = nn.Sequential(
            nn.AdaptiveAvgPool2d(1), PanConvBnRelu(in_ch, out_ch, 1))
        self.mid = nn.Sequential(PanConvBnRelu(in_ch, out_ch, 1))
        self.down1 = nn.Sequential(
            nn.MaxPool2d(2, 2), PanConvBnRelu(in_ch, 1, 7, padding=3))
        self.down2 = nn.Sequential(
            nn.MaxPool2d(2, 2), PanConvBnRelu(1, 1, 5, padding=2))
        self.down3 = nn.Sequential(
            nn.MaxPool2d(2, 2), PanConvBnRelu(1, 1, 3, padding=1),
            PanConvBnRelu(1, 1, 3, padding=1))
        self.conv2 = PanConvBnRelu(1, 1, 5, padding=2)
        self.conv1 = PanConvBnRelu(1, 1, 7, padding=3)

    def forward(self, x):
        h, w = x.size(2), x.size(3)
        up = dict(mode="bilinear", align_corners=True)
        b1 = F.interpolate(self.branch1(x), size=(h, w), **up)
        mid = self.mid(x)
        x1 = self.down1(x)
        x2 = self.down2(x1)
        x3 = self.down3(x2)
        x3 = F.interpolate(x3, size=(h // 4, w // 4), **up)
        x2 = self.conv2(x2)
        x = F.interpolate(x2 + x3, size=(h // 2, w // 2), **up)
        x1 = self.conv1(x1)
        x = F.interpolate(x + x1, size=(h, w), **up)
        return x * mid + b1


class GAUBlock(nn.Module):
    def __init__(self, in_ch: int, out_ch: int):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.AdaptiveAvgPool2d(1),
            PanConvBnRelu(out_ch, out_ch, 1, add_relu=False), nn.Sigmoid())
        self.conv2 = PanConvBnRelu(in_ch, out_ch, 3, padding=1)

    def forward(self, x, y):
        h, w = x.size(2), x.size(3)
        y_up = F.interpolate(y, size=(h, w), mode="bilinear", align_corners=True)
        return y_up + self.conv2(x) * self.conv1(y)


class PANDecoder(nn.Module):
    def __init__(self, encoder_channels=(64, 64, 128, 256, 512),
                 decoder_channels: int = 32):
        super().__init__()
        self.fpa = FPABlock(encoder_channels[-1], decoder_channels)
        self.gau3 = GAUBlock(encoder_channels[-2], decoder_channels)
        self.gau2 = GAUBlock(encoder_channels[-3], decoder_channels)
        self.gau1 = GAUBlock(encoder_channels[-4], decoder_channels)

    def forward(self, *features):
        x5 = self.fpa(features[-1])
        x4 = self.gau3(features[-2], x5)
        x3 = self.gau2(features[-3], x4)
        return self.gau1(features[-4], x3)


class ResNet34PAN(nn.Module):
    """smp.create_model('pan', 'resnet34', ...) mirror (encoder os=16)."""

    def __init__(self, in_channels: int = 5, classes: int = 13):
        super().__init__()
        self.encoder = ResNet34Encoder(in_channels)
        _dilate_stage(self.encoder.layer4, 2)
        self.decoder = PANDecoder()
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(32, classes, 3, padding=1),
            nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        feats = self.encoder(x)
        return self.segmentation_head(self.decoder(*feats))
