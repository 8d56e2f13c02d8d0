"""Test-only torch mirror of smp's DPN encoders (pretrainedmodels dpn.py).

Reconstructs the exact state-dict surface (``encoder.features.conv1_1.*``,
``encoder.features.conv{s}_{i}.{c1x1_w_s*,c1x1_a,c3x3_b,c1x1_c[,12]}.*``,
``encoder.features.conv5_bn_ac.bn.*``) and numerics: BN eps 1e-3,
bn->relu->conv ordering, dual-path residual/dense split, the dpn68b
"b" flavor (CatBnAct + two separate 1x1 convs), smp's get_stages taps
(stage-1 tap before the pool; stage 2-4 taps are F.relu(cat) with no bn;
stage 5 ends in conv5_bn_ac), and smp's default make_dilated (stride->1 +
dilation on every conv of the dilated stages) for deeplabv3/plus/pan.

Like the other smp mirrors (tests/torch_ref.py:1-8), a deviation from
real pretrainedmodels would pass parity silently — the stage-width
formula is cross-checked against smp's published out_channels for all six
variants (tests/test_dpn.py), and the committed key/shape manifest pins
the state-dict surface.
"""

from __future__ import annotations

from collections import OrderedDict

import torch
import torch.nn as nn
import torch.nn.functional as F

DPN_SPECS = {
    "dpn68": dict(init=10, k_r=128, groups=32, k_sec=(3, 4, 12, 3),
                  inc_sec=(16, 32, 32, 64), small=True, b=False),
    "dpn68b": dict(init=10, k_r=128, groups=32, k_sec=(3, 4, 12, 3),
                   inc_sec=(16, 32, 32, 64), small=True, b=True),
    "dpn92": dict(init=64, k_r=96, groups=32, k_sec=(3, 4, 20, 3),
                  inc_sec=(16, 32, 24, 128), small=False, b=False),
    "dpn98": dict(init=96, k_r=160, groups=40, k_sec=(3, 6, 20, 3),
                  inc_sec=(16, 32, 32, 128), small=False, b=False),
    "dpn107": dict(init=128, k_r=200, groups=50, k_sec=(4, 8, 20, 3),
                   inc_sec=(20, 64, 64, 128), small=False, b=False),
    "dpn131": dict(init=128, k_r=160, groups=40, k_sec=(4, 8, 28, 3),
                   inc_sec=(16, 32, 32, 128), small=False, b=False),
}


def dpn_out_channels(name: str) -> tuple[int, ...]:
    """out_channels[1:] from the pretrainedmodels width formula."""
    cfg = DPN_SPECS[name]
    bwf = 1 if cfg["small"] else 4
    chs = [cfg["init"]]
    for s in range(4):
        bw = 64 * (2 ** s) * bwf
        inc = cfg["inc_sec"][s]
        chs.append(bw + 3 * inc + (cfg["k_sec"][s] - 1) * inc)
    return tuple(chs)


class CatBnAct(nn.Module):
    def __init__(self, in_chs):
        super().__init__()
        self.bn = nn.BatchNorm2d(in_chs, eps=0.001)
        self.act = nn.ReLU(inplace=False)

    def forward(self, x):
        x = torch.cat(x, dim=1) if isinstance(x, tuple) else x
        return self.act(self.bn(x))


class BnActConv2d(nn.Module):
    def __init__(self, in_chs, out_chs, kernel, stride, padding=0, groups=1,
                 dilation=1):
        super().__init__()
        self.bn = nn.BatchNorm2d(in_chs, eps=0.001)
        self.act = nn.ReLU(inplace=False)
        self.conv = nn.Conv2d(in_chs, out_chs, kernel, stride, padding,
                              dilation, groups=groups, bias=False)

    def forward(self, x):
        return self.conv(self.act(self.bn(x)))


class InputBlock(nn.Module):
    def __init__(self, num_init_features, kernel=7, padding=3):
        super().__init__()
        self.conv = nn.Conv2d(3, num_init_features, kernel, 2, padding,
                              bias=False)
        self.bn = nn.BatchNorm2d(num_init_features, eps=0.001)
        self.act = nn.ReLU(inplace=False)
        self.pool = nn.MaxPool2d(3, 2, 1)

    def forward(self, x):
        return self.pool(self.act(self.bn(self.conv(x))))


class DualPathBlock(nn.Module):
    def __init__(self, in_chs, num_1x1_a, num_3x3_b, num_1x1_c, inc, groups,
                 block_type="normal", b=False, dilation=1):
        super().__init__()
        self.num_1x1_c = num_1x1_c
        self.b = b
        if block_type == "proj":
            self.key_stride, self.has_proj = 1, True
        elif block_type == "down":
            self.key_stride = 2 if dilation == 1 else 1
            self.has_proj = True
        else:
            self.key_stride, self.has_proj = 1, False
        if self.has_proj:
            proj = BnActConv2d(in_chs, num_1x1_c + 2 * inc, 1,
                               self.key_stride)
            if block_type == "down":
                self.c1x1_w_s2 = proj
            else:
                self.c1x1_w_s1 = proj
        self.c1x1_a = BnActConv2d(in_chs, num_1x1_a, 1, 1)
        self.c3x3_b = BnActConv2d(num_1x1_a, num_3x3_b, 3, self.key_stride,
                                  padding=dilation, groups=groups,
                                  dilation=dilation)
        if b:
            self.c1x1_c = CatBnAct(num_3x3_b)
            self.c1x1_c1 = nn.Conv2d(num_3x3_b, num_1x1_c, 1, bias=False)
            self.c1x1_c2 = nn.Conv2d(num_3x3_b, inc, 1, bias=False)
        else:
            self.c1x1_c = BnActConv2d(num_3x3_b, num_1x1_c + inc, 1, 1)

    def forward(self, x):
        x_in = torch.cat(x, dim=1) if isinstance(x, tuple) else x
        if self.has_proj:
            x_s = (self.c1x1_w_s2 if hasattr(self, "c1x1_w_s2")
                   else self.c1x1_w_s1)(x_in)
            x_s1, x_s2 = x_s[:, :self.num_1x1_c], x_s[:, self.num_1x1_c:]
        else:
            x_s1, x_s2 = x
        y = self.c3x3_b(self.c1x1_a(x_in))
        if self.b:
            y = self.c1x1_c(y)
            out1, out2 = self.c1x1_c1(y), self.c1x1_c2(y)
        else:
            y = self.c1x1_c(y)
            out1, out2 = y[:, :self.num_1x1_c], y[:, self.num_1x1_c:]
        return x_s1 + out1, torch.cat([x_s2, out2], dim=1)


class DPNEncoderTorch(nn.Module):
    """smp DPNEncoder mirror: pretrainedmodels features + get_stages taps;
    stages truncated at ``depth`` like the other mirrors."""

    def __init__(self, name: str = "dpn68", depth: int = 5,
                 output_stride: int = 32):
        super().__init__()
        cfg = DPN_SPECS[name]
        self.depth = depth
        small, b, groups = cfg["small"], cfg["b"], cfg["groups"]
        bwf = 1 if small else 4
        dil = {32: (1, 1), 16: (1, 2), 8: (2, 4)}[output_stride]
        stage_dil = {2: 1, 3: 1, 4: dil[0], 5: dil[1]}

        blocks: OrderedDict[str, nn.Module] = OrderedDict()
        blocks["conv1_1"] = InputBlock(cfg["init"], 3 if small else 7,
                                       1 if small else 3)
        self.stage_names: list[list[str]] = []
        in_chs = cfg["init"]
        for s in range(2, 6):
            if depth < s:
                break
            bw = 64 * (2 ** (s - 2)) * bwf
            inc = cfg["inc_sec"][s - 2]
            r = (cfg["k_r"] * bw) // (64 * bwf)
            names = []
            for i in range(1, cfg["k_sec"][s - 2] + 1):
                bt = ("proj" if s == 2 else "down") if i == 1 else "normal"
                blocks[f"conv{s}_{i}"] = DualPathBlock(
                    in_chs, r, r, bw, inc, groups, bt, b,
                    dilation=stage_dil[s])
                in_chs = (bw + 3 * inc) if i == 1 else (in_chs + inc)
                names.append(f"conv{s}_{i}")
            self.stage_names.append(names)
        if depth >= 5:
            blocks["conv5_bn_ac"] = CatBnAct(in_chs)
        self.features = nn.Sequential(blocks)

    def forward(self, x):
        feats = [x]
        stem = self.features[0]
        y = stem.act(stem.bn(stem.conv(x)))
        feats.append(y)  # stage 1: before the pool
        if self.depth >= 2:
            y = stem.pool(y)
            for si, names in enumerate(self.stage_names):
                for nm in names:
                    y = getattr(self.features, nm)(y)
                if si == len(self.stage_names) - 1 and self.depth >= 5:
                    y = self.features.conv5_bn_ac(y)
                    feats.append(y)
                else:
                    feats.append(F.relu(torch.cat(y, dim=1)))
        return feats


class DPNUnet(nn.Module):
    """smp.create_model('unet', 'dpn*', ...) mirror (manifest shape)."""

    def __init__(self, name="dpn68", in_channels=5, classes=13):
        super().__init__()
        from tests import torch_ref

        assert in_channels in (3, 5)
        self.encoder = DPNEncoderTorch(name)
        if in_channels != 3:  # mirror convention: widen the stem in place
            stem = self.encoder.features[0].conv
            self.encoder.features[0].conv = nn.Conv2d(
                in_channels, stem.out_channels, stem.kernel_size,
                stem.stride, stem.padding, bias=False)
        self.decoder = torch_ref.UnetDecoder(
            encoder_channels=dpn_out_channels(name))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(16, classes, 3, padding=1))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class DPNFPN(nn.Module):
    def __init__(self, name="dpn68", classes=7):
        super().__init__()
        from tests import torch_ref

        self.encoder = DPNEncoderTorch(name)
        self.decoder = torch_ref.FPNDecoder(
            encoder_channels=dpn_out_channels(name))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(128, classes, 1), nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class DPNPSPNet(nn.Module):
    def __init__(self, name="dpn68", classes=7):
        super().__init__()
        from tests import torch_ref

        self.encoder = DPNEncoderTorch(name, depth=3)
        self.decoder = torch_ref.PSPDecoder(in_ch=dpn_out_channels(name)[2])
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(512, classes, 3, padding=1),
            nn.UpsamplingBilinear2d(scale_factor=8))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class DPNDeepLabV3Plus(nn.Module):
    """os=16 dilated encoder + smp DeepLabV3Plus decoder."""

    def __init__(self, name="dpn68", classes=7):
        super().__init__()
        from tests import torch_ref

        self.encoder = DPNEncoderTorch(name, output_stride=16)
        self.decoder = torch_ref.DeepLabV3PlusDecoder(
            encoder_channels=dpn_out_channels(name))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(256, classes, 1), nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))
