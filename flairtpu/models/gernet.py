"""Flax GERNet encoders (smp ``timm-gernet_{s,m,l}``), NHWC.

smp/encoders/timm_gernet.py wraps timm's ByobNet instantiation of GENet
(Lin et al., "Neural Architecture Design for GPU-Efficient Networks",
arXiv:2006.14090) for the reference's smp factory (src/flair/model.py:35-41).
This was the last unported smp 0.3.3 encoder family.

Architecture (timm byobnet gernet cfgs, published in the paper's tables):

- stem: single 3x3/2 ConvNormAct (``stem.{conv,bn}``), no pool
  (stem_pool=None), 13 channels for gernet_s, 32 for m/l;
- 5 stages of ByobNet blocks (``stages.{s}.{i}``), strides 2/2/2/2/1:
  * ``basic``: conv1_kxk 3x3(stride) -> conv2_kxk 3x3 (no act) ->
    +shortcut -> relu (bottle_ratio 1, groups 1);
  * ``bottle``: conv1_1x1 -> conv2_kxk 3x3(stride, groups) ->
    conv3_1x1 (no act) -> +shortcut -> relu, with
    mid = make_divisible(out * bottle_ratio); the br=3 stages use
    group_size 1, i.e. DEPTHWISE 3x3 (groups = mid);
  * shortcut: 1x1-stride ConvNorm (downsample='conv1x1', no act) when
    shape changes, identity otherwise;
- final_conv: 1x1 ConvNormAct to num_features (1920 / 2560), folded by smp
  into the last feature stage together with timm stages 3+4, so the smp
  pyramid is (3, stem, s0, s1, s2, [s3+s4+final_conv]) at strides
  (1, 2, 4, 8, 16, 32).

Dilated mode (deeplabv3/pan) follows smp's default make_dilated
(replace_strides_with_dilation: every conv stride -> 1, every 3x3 gets the
stage rate; the projection shortcut built for the original stride-2 block
survives as a stride-1 1x1). Oracle: hand-built torch mirror
(tests/torch_ref_gernet.py) + committed key/shape manifests — timm/smp are
not installed here (caveat as tests/torch_ref.py:1-8). The cfg tables are
independently pinned by the GENet paper's published parameter totals:
encoder + 1000-way fc = 8.17M / 21.14M / 31.08M for s/m/l, matching the
paper's 8.17M / 21.1M / 31.0M (tests/test_gernet.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from flairtpu.models.efficientnet import round_filters
from flairtpu.models.resnet import batch_norm, conv
from flairtpu.models.sknet import ConvNorm

# name -> (stem_chs, ((type, depth, out_chs, stride, group_size, br), ...),
#          num_features) — timm byobnet gernet_{s,m,l} ByoModelCfg values
GERNET_SPECS = {
    "timm-gernet_s": (13, (
        ("basic", 1, 48, 2, 0, 1.0),
        ("basic", 3, 48, 2, 0, 1.0),
        ("bottle", 7, 384, 2, 0, 0.25),
        ("bottle", 2, 560, 2, 1, 3.0),
        ("bottle", 1, 256, 1, 1, 3.0),
    ), 1920),
    "timm-gernet_m": (32, (
        ("basic", 1, 128, 2, 0, 1.0),
        ("basic", 2, 192, 2, 0, 1.0),
        ("bottle", 6, 640, 2, 0, 0.25),
        ("bottle", 4, 640, 2, 1, 3.0),
        ("bottle", 1, 640, 1, 1, 3.0),
    ), 2560),
    "timm-gernet_l": (32, (
        ("basic", 1, 128, 2, 0, 1.0),
        ("basic", 2, 192, 2, 0, 1.0),
        ("bottle", 6, 640, 2, 0, 0.25),
        ("bottle", 5, 640, 2, 1, 3.0),
        ("bottle", 4, 640, 1, 1, 3.0),
    ), 2560),
}


def gernet_mid_chs(out_chs: int, bottle_ratio: float) -> int:
    """timm make_divisible(out * br) with the default divisor 8."""
    return round_filters(out_chs * bottle_ratio, 1.0, divisor=8)


class GERNetBlock(nn.Module):
    """timm byobnet BasicBlock ('basic') / BottleneckBlock ('bottle').

    ``proj`` (shortcut exists) is decided from the ORIGINAL stride before
    smp's make_dilated resets strides to 1, so dilated stages keep their
    projection convs exactly like a mutated torch model does.
    """

    kind: str  # 'basic' | 'bottle'
    out_ch: int
    stride: int = 1
    dilation: int = 1
    group_size: int = 0  # 0 -> groups 1; 1 -> depthwise (timm num_groups)
    bottle_ratio: float = 1.0
    proj: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        if self.proj:
            shortcut = ConvNorm(self.out_ch, 1, self.stride, act=False,
                                dtype=self.dtype, name="shortcut")(x, train)
        else:
            shortcut = x
        mid = gernet_mid_chs(self.out_ch, self.bottle_ratio)
        groups = mid if self.group_size == 1 else 1
        if self.kind == "basic":
            y = ConvNorm(mid, 3, self.stride, dilation=self.dilation,
                         dtype=self.dtype, name="conv1_kxk")(x, train)
            y = ConvNorm(self.out_ch, 3, 1, dilation=self.dilation, act=False,
                         dtype=self.dtype, name="conv2_kxk")(y, train)
        else:
            y = ConvNorm(mid, 1, dtype=self.dtype, name="conv1_1x1")(x, train)
            y = ConvNorm(mid, 3, self.stride, dilation=self.dilation,
                         groups=groups, dtype=self.dtype,
                         name="conv2_kxk")(y, train)
            y = ConvNorm(self.out_ch, 1, act=False, dtype=self.dtype,
                         name="conv3_1x1")(y, train)
        return nn.relu(y + shortcut)


class GERNetEncoder(nn.Module):
    """smp GERNetEncoder: 6 pyramid features; timm stages 3+4 and the
    1x1 final_conv are folded into the last smp stage (get_stages)."""

    name_spec: str = "timm-gernet_s"
    output_stride: int = 32
    depth: int = 5
    remat: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> tuple[int, ...]:
        stem_chs, blocks, num_features = GERNET_SPECS[self.name_spec]
        chans = (3, stem_chs, blocks[0][2], blocks[1][2], blocks[2][2],
                 num_features)
        return chans[: self.depth + 1]

    @nn.compact
    def __call__(self, x, train: bool = False) -> list[jax.Array]:
        stem_chs, blocks, num_features = GERNET_SPECS[self.name_spec]
        # smp make_dilated over get_stages: os16 dilates the LAST smp stage
        # (timm stages 3+4 + final_conv), os8 also timm stage 2
        dil = {32: (1, 1), 16: (1, 2), 8: (2, 4)}[self.output_stride]
        stage_dil = {0: 1, 1: 1, 2: dil[0], 3: dil[1], 4: dil[1]}
        block_cls = (nn.remat(GERNetBlock, static_argnums=(2,))
                     if self.remat else GERNetBlock)

        feats = [x]
        y = ConvNorm(stem_chs, 3, 2, dtype=self.dtype, name="stem")(
            x.astype(self.dtype), train)
        feats.append(y)  # stride 2
        if self.depth < 2:
            return feats

        # smp feature-stage boundaries: flush after timm stages 0, 1, 2;
        # stages 3, 4 + final_conv form the last feature
        in_ch = stem_chs
        for s, (kind, d, c, s0, gs, br) in enumerate(blocks):
            sdil = stage_dil[s]
            for i in range(d):
                orig_stride = s0 if i == 0 else 1
                stride = 1 if sdil > 1 else orig_stride
                y = block_cls(
                    kind, c, stride=stride, dilation=sdil,
                    group_size=gs, bottle_ratio=br,
                    proj=(orig_stride != 1 or in_ch != c),
                    dtype=self.dtype, name=f"stages_{s}_{i}")(y, train)
                in_ch = c
            if s < 3:
                feats.append(y)
                if self.depth < len(feats):
                    return feats
        y = ConvNorm(num_features, 1, dtype=self.dtype, name="final_conv")(
            y, train)
        feats.append(y)
        return feats
