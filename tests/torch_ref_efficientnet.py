"""Test-only torch mirror of smp's EfficientNet encoders (b0..b7).

smp wraps lukemelas/efficientnet-pytorch (smp/encoders/efficient_net.py);
neither package is installed here, so this mirror reconstructs the exact
state-dict surface (``encoder._conv_stem``, ``encoder._blocks.{j}.*``) and
numerics, independently re-implementing the TF-style static same padding
(computed from the variant's default image size, NOT the runtime input —
see flairtpu/models/efficientnet.py docstring for why that matters for
b3/b5-style odd trajectories).

The image-size walk here is written independently of the Flax plan so a
bug in one is caught by the parity tests rather than mirrored.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

# width, depth, default image size (efficientnet-pytorch efficientnet_params)
PARAMS = {
    "efficientnet-b0": (1.0, 1.0, 224),
    "efficientnet-b1": (1.0, 1.1, 240),
    "efficientnet-b2": (1.1, 1.2, 260),
    "efficientnet-b3": (1.2, 1.4, 300),
    "efficientnet-b4": (1.4, 1.8, 380),
    "efficientnet-b5": (1.6, 2.2, 456),
    "efficientnet-b6": (1.8, 2.6, 528),
    "efficientnet-b7": (2.0, 3.1, 600),
}

BASE = [  # repeats, kernel, stride, expand, in, out (b0 blocks_args)
    (1, 3, 1, 1, 32, 16),
    (2, 3, 2, 6, 16, 24),
    (2, 5, 2, 6, 24, 40),
    (3, 3, 2, 6, 40, 80),
    (3, 5, 1, 6, 80, 112),
    (4, 5, 2, 6, 112, 192),
    (1, 3, 1, 6, 192, 320),
]


def _round_filters(f, w, divisor=8):
    f *= w
    new = max(divisor, int(f + divisor / 2) // divisor * divisor)
    if new < 0.9 * f:
        new += divisor
    return int(new)


class StaticSamePadConv2d(nn.Conv2d):
    """Conv2dStaticSamePadding: pad computed once from a given image size."""

    def __init__(self, in_ch, out_ch, k, stride=1, groups=1, bias=False,
                 dilation=1, image_size=None):
        super().__init__(in_ch, out_ch, k, stride, 0, dilation, groups, bias)
        ih = image_size
        oh = math.ceil(ih / stride)
        pad = max((oh - 1) * stride + (k - 1) * dilation + 1 - ih, 0)
        self._pad = (pad // 2, pad - pad // 2, pad // 2, pad - pad // 2)

    def forward(self, x):
        return self._conv_forward(F.pad(x, self._pad), self.weight, self.bias)


class MBConvBlock(nn.Module):
    """efficientnet-pytorch MBConvBlock (eval semantics; drop-connect in
    training is a per-sample binary keep, applied before the residual)."""

    def __init__(self, cin, cout, k, stride, expand, image_size, dilation=1,
                 symmetric_pad=False, orig_stride=None):
        super().__init__()
        # smp's id_skip checks the original block-args stride, not the
        # dilation-rewritten one
        self._use_skip = ((orig_stride or stride) == 1 and cin == cout)
        self.cin, self.cout = cin, cout
        mid = cin * expand
        bn = lambda ch: nn.BatchNorm2d(ch, eps=1e-3, momentum=0.01)
        if expand != 1:
            self._expand_conv = nn.Conv2d(cin, mid, 1, bias=False)
            self._bn0 = bn(mid)
        if symmetric_pad:  # smp make_dilated removes the static padding
            self._depthwise_conv = nn.Conv2d(
                mid, mid, k, 1, (k // 2) * dilation, dilation, groups=mid,
                bias=False)
        else:
            self._depthwise_conv = StaticSamePadConv2d(
                mid, mid, k, stride, groups=mid, image_size=image_size)
        self._bn1 = bn(mid)
        se = max(1, int(cin * 0.25))
        self._se_reduce = nn.Conv2d(mid, se, 1)
        self._se_expand = nn.Conv2d(se, mid, 1)
        self._project_conv = nn.Conv2d(mid, cout, 1, bias=False)
        self._bn2 = bn(cout)

    def forward(self, x):
        inputs = x
        if hasattr(self, "_expand_conv"):
            x = F.silu(self._bn0(self._expand_conv(x)))
        x = F.silu(self._bn1(self._depthwise_conv(x)))
        g = F.adaptive_avg_pool2d(x, 1)
        g = self._se_expand(F.silu(self._se_reduce(g)))
        x = torch.sigmoid(g) * x
        x = self._bn2(self._project_conv(x))
        if self._use_skip:
            x = x + inputs
        return x


class EfficientNetEncoderTorch(nn.Module):
    """smp EfficientNetEncoder mirror: 6 pyramid features, stage-boundary
    taps, smp key names (encoder prefix added by the wrapping model)."""

    def __init__(self, name: str, in_channels: int = 5, depth: int = 5,
                 output_stride: int = 32):
        super().__init__()
        width, dcoef, image = PARAMS[name]
        self.depth = depth
        stem_ch = _round_filters(32, width)
        self._conv_stem = StaticSamePadConv2d(in_channels, stem_ch, 3, 2,
                                              image_size=image)
        self._bn0 = nn.BatchNorm2d(stem_ch, eps=1e-3, momentum=0.01)
        size = math.ceil(image / 2)
        dilate_from = {32: None, 16: 5, 8: 3}[output_stride]
        dilation = 1
        blocks = []
        boundaries = []
        for si, (r, k, s, e, cin, cout) in enumerate(BASE):
            reps = int(math.ceil(dcoef * r))
            cin_r, cout_r = _round_filters(cin, width), _round_filters(cout, width)
            if dilate_from is not None and si >= dilate_from and s > 1:
                dilation *= 2
            for j in range(reps):
                stride = s if j == 0 else 1
                bin_ = cin_r if j == 0 else cout_r
                dilated = dilate_from is not None and si >= dilate_from
                blocks.append(MBConvBlock(
                    bin_, cout_r, k, 1 if dilated else stride, e, size,
                    dilation=dilation if dilated else 1,
                    symmetric_pad=dilated, orig_stride=stride))
                if not dilated and stride > 1:
                    size = math.ceil(size / stride)
            boundaries.append(len(blocks))
        self._taps = {boundaries[1], boundaries[2], boundaries[4],
                      boundaries[6]}
        self._stop = (boundaries[2] if depth == 3 else len(blocks))
        # like the resnet PSPNet mirror: truncate so the key set matches what
        # flairtpu instantiates (real smp keeps the unused stages; real
        # checkpoints load with strict=False)
        self._blocks = nn.ModuleList(blocks[: self._stop])

    def forward(self, x):
        feats = [x]
        x = F.silu(self._bn0(self._conv_stem(x)))
        feats.append(x)
        for j, block in enumerate(self._blocks[: self._stop]):
            x = block(x)
            if (j + 1) in self._taps and len(feats) < self.depth + 1:
                feats.append(x)
        return feats


def en_out_channels(name: str) -> tuple[int, ...]:
    """smp out_channels[1:] for the variant (stem, s4, s8, s16, s32 taps)."""
    w = PARAMS[name][0]
    return (_round_filters(32, w), _round_filters(24, w), _round_filters(40, w),
            _round_filters(112, w), _round_filters(320, w))


class EfficientNetUnet(nn.Module):
    """smp.create_model('unet', 'efficientnet-bN', ...) mirror."""

    def __init__(self, name="efficientnet-b0", in_channels=5, classes=7):
        super().__init__()
        from tests import torch_ref

        self.encoder = EfficientNetEncoderTorch(name, in_channels)
        self.decoder = torch_ref.UnetDecoder(encoder_channels=en_out_channels(name))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(16, classes, 3, padding=1))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class EfficientNetFPN(nn.Module):
    def __init__(self, name="efficientnet-b0", in_channels=5, classes=7):
        super().__init__()
        from tests import torch_ref

        self.encoder = EfficientNetEncoderTorch(name, in_channels)
        self.decoder = torch_ref.FPNDecoder(encoder_channels=en_out_channels(name))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(128, classes, 1), nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class EfficientNetPSPNet(nn.Module):
    def __init__(self, name="efficientnet-b0", in_channels=5, classes=7):
        super().__init__()
        from tests import torch_ref

        self.encoder = EfficientNetEncoderTorch(name, in_channels, depth=3)
        self.decoder = torch_ref.PSPDecoder(in_ch=en_out_channels(name)[2])
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(512, classes, 3, padding=1),
            nn.UpsamplingBilinear2d(scale_factor=8))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class EfficientNetDeepLabV3Plus(nn.Module):
    """os=16 dilated encoder + smp DeepLabV3Plus decoder."""

    def __init__(self, name="efficientnet-b0", in_channels=5, classes=7):
        super().__init__()
        from tests import torch_ref

        self.encoder = EfficientNetEncoderTorch(name, in_channels,
                                                output_stride=16)
        self.decoder = torch_ref.DeepLabV3PlusDecoder(
            encoder_channels=en_out_channels(name))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(256, classes, 1), nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class EfficientNetPAN(nn.Module):
    """os=16 dilated encoder + smp PAN decoder."""

    def __init__(self, name="efficientnet-b0", in_channels=5, classes=7):
        super().__init__()
        from tests import torch_ref

        self.encoder = EfficientNetEncoderTorch(name, in_channels,
                                                output_stride=16)
        self.decoder = torch_ref.PANDecoder(
            encoder_channels=en_out_channels(name))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(32, classes, 3, padding=1),
            nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))
