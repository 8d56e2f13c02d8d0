"""Flax timm-MobileNetV3 encoders for the smp provider, NHWC.

smp/encoders/timm_mobilenetv3.py wraps ``timm.create_model`` over the
MobileNetV3 family (``timm-mobilenetv3_{large,small}_{075,100}`` and the
``minimal_100`` variants) for the reference's smp factory
(src/flair/model.py:35-41); the timm model lives under ``self.model``, so
checkpoint keys carry an extra ``model.`` prefix
(``encoder.model.conv_stem.weight``, ``encoder.model.blocks.{s}.{i}.*``).

Architecture (timm _gen_mobilenet_v3, the official MobileNetV3 tables):

- hard-swish activations (ReLU in the early ``_nre`` blocks; plain ReLU
  everywhere in the ``minimal`` variants), BN eps 1e-5;
- SE (non-minimal): squeeze to make_divisible(mid * 0.25, 8) of the
  EXPANDED channels, inner ReLU, hard-sigmoid gate — unlike
  EfficientNet's unexpanded-input/silu/sigmoid SE;
- expansion channels make_divisible(in * e, 8) with fractional e (2.5,
  2.3, 4.5, 3.67); width multipliers rescale all channel counts with the
  same rounding; symmetric torch padding;
- the last block is a 1x1 ConvBnAct (``cn``: conv/bn1) to 960 (large) or
  576 (small) channels.

smp's get_stages groups differ by mode: large taps [stem+blocks0,
blocks1, blocks2, blocks3-4, blocks5-6]; small taps [stem, blocks0,
blocks1, blocks2-3, blocks4-5] (the small stem conv is stride 2 AND
block 0 is stride 2). smp's default make_dilated handles output_stride
16/8 (strides live in the depthwise convs). Oracle: hand-built torch
mirror (tests/torch_ref_timm_mnv3.py) + committed key/shape manifests —
timm/smp are not installed here (caveat as tests/torch_ref.py:1-8).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from flairtpu.models.efficientnet import round_filters as _make_div

# (kind, repeats, kernel, stride, expand, out, se, relu) per stage;
# kind: 'ds' | 'ir' | 'cn'
_LARGE_STAGES = (
    ("ds", ((3, 1, 1.0, 16, False, True),)),
    ("ir", ((3, 2, 4.0, 24, False, True), (3, 1, 3.0, 24, False, True))),
    ("ir", ((5, 2, 3.0, 40, True, True), (5, 1, 3.0, 40, True, True),
            (5, 1, 3.0, 40, True, True))),
    ("ir", ((3, 2, 6.0, 80, False, False), (3, 1, 2.5, 80, False, False),
            (3, 1, 2.3, 80, False, False), (3, 1, 2.3, 80, False, False))),
    ("ir", ((3, 1, 6.0, 112, True, False),) * 2),
    ("ir", ((5, 2, 6.0, 160, True, False), (5, 1, 6.0, 160, True, False),
            (5, 1, 6.0, 160, True, False))),
    ("cn", ((1, 1, 0.0, 960, False, False),)),
)
_SMALL_STAGES = (
    ("ds", ((3, 2, 1.0, 16, True, True),)),
    ("ir", ((3, 2, 4.5, 24, False, True), (3, 1, 3.67, 24, False, True))),
    ("ir", ((5, 2, 4.0, 40, True, False), (5, 1, 6.0, 40, True, False),
            (5, 1, 6.0, 40, True, False))),
    ("ir", ((5, 1, 3.0, 48, True, False),) * 2),
    ("ir", ((5, 2, 6.0, 96, True, False), (5, 1, 6.0, 96, True, False),
            (5, 1, 6.0, 96, True, False))),
    ("cn", ((1, 1, 0.0, 576, False, False),)),
)

TIMM_MOBILENETV3_SPECS = {
    "timm-mobilenetv3_large_100": ("large", 1.0, False),
    "timm-mobilenetv3_large_075": ("large", 0.75, False),
    "timm-mobilenetv3_large_minimal_100": ("large", 1.0, True),
    "timm-mobilenetv3_small_100": ("small", 1.0, False),
    "timm-mobilenetv3_small_075": ("small", 0.75, False),
    "timm-mobilenetv3_small_minimal_100": ("small", 1.0, True),
}


def _hswish(x):
    return x * jax.nn.relu6(x + 3.0) / 6.0


def _hsigmoid(x):
    return jax.nn.relu6(x + 3.0) / 6.0


def timm_mobilenetv3_plan(name: str, output_stride: int = 32) -> dict:
    mode, width, minimal = TIMM_MOBILENETV3_SPECS[name]
    stages_def = _LARGE_STAGES if mode == "large" else _SMALL_STAGES
    stem_ch = _make_div(16, width)
    # smp's default make_dilated over get_stages()[4]/[5]; in timm block
    # terms those are stages (3, 5) for large, (2, 4) for small (the cn
    # block is stride 1 either way)
    dil_stages = {32: (), 16: ({"large": 5, "small": 4}[mode],),
                  8: ((3, 5) if mode == "large" else (2, 4))}[output_stride]
    stages = []
    cin = stem_ch
    dilation = 1
    for si, (kind, blocks_def) in enumerate(stages_def):
        dilated = bool(dil_stages) and si >= dil_stages[0]
        if si in dil_stages:
            dilation *= 2
        blocks = []
        for (k, s, e, cout, se, relu) in blocks_def:
            cout_r = _make_div(cout, width) if kind != "cn" else (
                cout if width == 1.0 else _make_div(cout, width))
            mid = cin if kind == "ds" else _make_div(cin * e, 1.0)
            blocks.append(dict(
                kind=kind, kernel=k, stride=1 if dilated else s,
                dilation=dilation if dilated else 1,
                cin=cin, mid=mid, cout=cout_r,
                se=(_make_div(mid * 0.25, 1.0)
                    if se and not minimal else None),
                relu=relu or minimal,
                k_eff=3 if minimal and k == 5 else k,
                skip=(s == 1 and cin == cout_r),
            ))
            cin = cout_r
        stages.append(blocks)
    if mode == "large":
        taps = (1, 2, 4, 6)  # after these timm stages (stage 0 is in stem tap)
        out_channels = (stem_ch, stages[1][-1]["cout"], stages[2][-1]["cout"],
                        stages[4][-1]["cout"], stages[6][-1]["cout"])
    else:
        taps = (0, 1, 3, 5)
        out_channels = (stem_ch, stages[0][-1]["cout"], stages[1][-1]["cout"],
                        stages[3][-1]["cout"], stages[5][-1]["cout"])
    return dict(mode=mode, stem_ch=stem_ch, stages=stages, taps=taps,
                out_channels=out_channels,
                n_blocks=sum(len(b) for b in stages))


class MNV3Block(nn.Module):
    """timm MobileNetV3 DepthwiseSeparableConv / InvertedResidual /
    ConvBnAct, by ``kind``."""

    kind: str
    kernel: int
    k_eff: int
    stride: int
    dilation: int
    cin: int
    mid: int
    cout: int
    se: int | None
    relu: bool
    skip: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=jnp.float32,
                                param_dtype=jnp.float32, name=name)

        def conv(ch, k, name, stride=1, groups=1, bias=False):
            return nn.Conv(ch, (k, k), strides=(stride, stride),
                           padding=(k // 2) * self.dilation,
                           kernel_dilation=(self.dilation, self.dilation),
                           feature_group_count=groups, use_bias=bias,
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name=name)

        act = jax.nn.relu if self.relu else _hswish

        def squeeze(y):
            if self.se is None:
                return y
            g = jnp.mean(y.astype(jnp.float32), axis=(1, 2), keepdims=True)
            g = g.astype(self.dtype)
            g = conv(self.se, 1, "se_reduce", bias=True)(g)
            g = conv(y.shape[-1], 1, "se_expand", bias=True)(jax.nn.relu(g))
            return _hsigmoid(g.astype(jnp.float32)).astype(y.dtype) * y

        if self.kind == "cn":
            return act(bn("bn1")(conv(self.cout, 1, "conv")(x)))
        inputs = x
        k = self.k_eff
        if self.kind == "ds":
            x = act(bn("bn1")(conv(self.cin, k, "conv_dw",
                                   stride=self.stride, groups=self.cin)(x)))
            x = squeeze(x)
            x = bn("bn2")(conv(self.cout, 1, "conv_pw")(x))
        else:  # ir
            x = act(bn("bn1")(conv(self.mid, 1, "conv_pw")(x)))
            x = act(bn("bn2")(conv(self.mid, k, "conv_dw",
                                   stride=self.stride, groups=self.mid)(x)))
            x = squeeze(x)
            x = bn("bn3")(conv(self.cout, 1, "conv_pwl")(x))
        if self.skip:
            x = x + inputs
        return x


class TimmMobileNetV3Encoder(nn.Module):
    """smp MobileNetV3Encoder: 6 pyramid features at the mode's taps."""

    name_spec: str = "timm-mobilenetv3_large_100"
    output_stride: int = 32
    depth: int = 5
    remat: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> tuple[int, ...]:
        p = timm_mobilenetv3_plan(self.name_spec, self.output_stride)
        return ((3,) + p["out_channels"])[: self.depth + 1]

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        plan = timm_mobilenetv3_plan(self.name_spec, self.output_stride)
        _, _, minimal = TIMM_MOBILENETV3_SPECS[self.name_spec]
        features = [x]
        y = nn.Conv(plan["stem_ch"], (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv_stem")(x.astype(self.dtype))
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn1")(y)
        y = jax.nn.relu(y) if minimal else _hswish(y)

        block_cls = (nn.remat(MNV3Block, static_argnums=(2,))
                     if self.remat else MNV3Block)
        large = plan["mode"] == "large"
        if not large:
            features.append(y)  # small: stem alone is the stride-2 tap
        for si, blocks in enumerate(plan["stages"]):
            for i, b in enumerate(blocks):
                y = block_cls(dtype=self.dtype, name=f"s{si}_b{i}",
                              **b)(y, train)
            if large and si == 0:
                features.append(y)  # large: stem + blocks[0]
            elif si in plan["taps"]:
                features.append(y)
            if len(features) == self.depth + 1:
                return features
        return features
