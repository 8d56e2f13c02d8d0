"""Flax RegNetX/Y encoders (smp ``timm-regnet{x,y}_*``), NHWC.

smp/encoders/timm_regnet.py wraps timm's RegNet (Radosavovic et al.,
arXiv:2003.13678) for the reference's smp factory
(src/flair/model.py:35-41). All 24 variants are ported: regnetx_002..320
and regnety_002..320 (the Y flavor adds squeeze-excitation).

Stage widths/depths/groups are GENERATED from each variant's published
(w0, wa, wm, group_size, depth) design parameters via the paper's
quantization rule (timm generate_regnet + adjust_widths_groups_comp):
``u_j = w0 + wa*j`` snapped to powers of wm, rounded to multiples of 8,
grouped by unique width, then widths rounded to multiples of the (possibly
clamped) group size — reproducing the paper's stage tables exactly
(spot-asserted in tests/test_regnet.py).

Block numerics (timm RegNetBottleneck, bottle_ratio 1):

- conv1 1x1 ConvNormAct -> conv2 3x3 ConvNormAct (stride, groups =
  width/group_size) -> [SE on the Y flavor: squeeze to
  int(round(block_input * 0.25)), relu, sigmoid gate, biased 1x1 fcs] ->
  conv3 1x1 ConvNorm (no act) -> relu(+shortcut);
- downsample: 1x1 stride ConvNorm (no act) on each stage's first block;
- stem: 3x3/2 ConvNormAct to 32 channels; every stage strides 2, so the
  pyramid is (2, 4, 8, 16, 32) like resnet.

Dilated mode (deeplabv3/pan) follows smp's default make_dilated (the
strides live in convs). Oracle: hand-built torch mirror
(tests/torch_ref_regnet.py) + committed key/shape manifests — timm/smp
are not installed here (caveat as tests/torch_ref.py:1-8).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from flairtpu.models.resnet import batch_norm, conv
from flairtpu.models.sknet import ConvNorm

# name -> (w0, wa, wm, group_size, depth, se)
REGNET_SPECS = {
    "timm-regnetx_002": (24, 36.44, 2.49, 8, 13, False),
    "timm-regnetx_004": (24, 24.48, 2.54, 16, 22, False),
    "timm-regnetx_006": (48, 36.97, 2.24, 24, 16, False),
    "timm-regnetx_008": (56, 35.73, 2.28, 16, 16, False),
    "timm-regnetx_016": (80, 34.01, 2.25, 24, 18, False),
    "timm-regnetx_032": (88, 26.31, 2.25, 48, 25, False),
    "timm-regnetx_040": (96, 38.65, 2.43, 40, 23, False),
    "timm-regnetx_064": (184, 60.83, 2.07, 56, 17, False),
    "timm-regnetx_080": (80, 49.56, 2.88, 120, 23, False),
    "timm-regnetx_120": (168, 73.36, 2.37, 112, 19, False),
    "timm-regnetx_160": (216, 55.59, 2.1, 128, 22, False),
    "timm-regnetx_320": (320, 69.86, 2.0, 168, 23, False),
    "timm-regnety_002": (24, 36.44, 2.49, 8, 13, True),
    "timm-regnety_004": (48, 27.89, 2.09, 8, 16, True),
    "timm-regnety_006": (48, 32.54, 2.32, 16, 15, True),
    "timm-regnety_008": (56, 38.84, 2.4, 16, 14, True),
    "timm-regnety_016": (48, 20.71, 2.65, 24, 27, True),
    "timm-regnety_032": (80, 42.63, 2.66, 24, 21, True),
    "timm-regnety_040": (96, 31.41, 2.24, 64, 22, True),
    "timm-regnety_064": (112, 33.22, 2.27, 72, 25, True),
    "timm-regnety_080": (192, 76.82, 2.19, 56, 17, True),
    "timm-regnety_120": (168, 73.36, 2.37, 112, 19, True),
    "timm-regnety_160": (200, 106.23, 2.48, 112, 18, True),
    "timm-regnety_320": (232, 115.89, 2.53, 232, 20, True),
}


def regnet_stages(name: str) -> tuple[list[int], list[int], list[int]]:
    """(stage_widths, stage_depths, stage_groups) via the paper's rule."""
    w0, wa, wm, gs, depth, _ = REGNET_SPECS[name]
    widths = []
    for j in range(depth):
        u = w0 + wa * j
        k = round(math.log(u / w0) / math.log(wm))
        widths.append(int(round(w0 * (wm ** k) / 8)) * 8)
    sw = sorted(set(widths))
    sd = [widths.count(w) for w in sw]
    groups = [min(gs, w) for w in sw]
    sw = [int(round(w / g) * g) for w, g in zip(sw, groups)]
    return sw, sd, groups


class RegNetSE(nn.Module):
    """timm SEModule (biased 1x1 fc1/fc2, relu + sigmoid gate)."""

    rd: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        g = g.astype(self.dtype)
        g = conv(self.rd, 1, padding=0, use_bias=True, dtype=self.dtype,
                 name="fc1")(g)
        g = conv(x.shape[-1], 1, padding=0, use_bias=True, dtype=self.dtype,
                 name="fc2")(jax.nn.relu(g))
        return jax.nn.sigmoid(g.astype(jnp.float32)).astype(x.dtype) * x


class RegNetBlock(nn.Module):
    """timm RegNetBottleneck (bottle ratio 1)."""

    width: int
    in_ch: int
    stride: int = 1
    group_size: int = 8
    dilation: int = 1
    se: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        if self.stride != 1 or self.in_ch != self.width:
            shortcut = ConvNorm(self.width, 1, self.stride, act=False,
                                dtype=self.dtype, name="downsample")(x, train)
        else:
            shortcut = x
        y = ConvNorm(self.width, 1, dtype=self.dtype, name="conv1")(x, train)
        y = ConvNorm(self.width, 3, self.stride, dilation=self.dilation,
                     groups=self.width // min(self.group_size, self.width),
                     dtype=self.dtype, name="conv2")(y, train)
        if self.se:
            y = RegNetSE(int(round(self.in_ch * 0.25)), dtype=self.dtype,
                         name="se")(y)
        y = ConvNorm(self.width, 1, act=False, dtype=self.dtype,
                     name="conv3")(y, train)
        return nn.relu(y + shortcut)


class RegNetEncoder(nn.Module):
    """smp TimmRegNetEncoder: 6 pyramid features (stem + 4 stages)."""

    name_spec: str = "timm-regnetx_002"
    output_stride: int = 32
    depth: int = 5
    remat: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> tuple[int, ...]:
        sw, _, _ = regnet_stages(self.name_spec)
        return ((3, 32) + tuple(sw))[: self.depth + 1]

    @nn.compact
    def __call__(self, x, train: bool = False) -> list[jax.Array]:
        use_se = REGNET_SPECS[self.name_spec][5]
        sw, sd, groups = regnet_stages(self.name_spec)
        dil = {32: (1, 1), 16: (1, 2), 8: (2, 4)}[self.output_stride]
        stage_dil = {0: 1, 1: 1, 2: dil[0], 3: dil[1]}
        block_cls = (nn.remat(RegNetBlock, static_argnums=(2,))
                     if self.remat else RegNetBlock)

        feats = [x]
        y = ConvNorm(32, 3, 2, dtype=self.dtype, name="stem")(
            x.astype(self.dtype), train)
        feats.append(y)  # stride 2

        in_ch = 32
        for s, (w, d, g) in enumerate(zip(sw, sd, groups)):
            if self.depth < s + 2:
                break
            sdil = stage_dil[s]
            for i in range(d):
                stride = 2 if (i == 0 and sdil == 1) else 1
                y = block_cls(w, in_ch, stride=stride, group_size=g,
                              dilation=sdil, se=use_se, dtype=self.dtype,
                              name=f"s{s + 1}_b{i + 1}")(y, train)
                in_ch = w
            feats.append(y)
        return feats
