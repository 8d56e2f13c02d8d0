"""Flax EfficientNet encoders (smp 'efficientnet-b0'..'b7' family).

The reference's smp provider accepts any encoder string
(``smp.create_model(arch, encoder_name, ...)``, src/flair/model.py:35-41);
smp's efficientnet encoders wrap lukemelas/efficientnet-pytorch's
EfficientNet (smp/encoders/efficient_net.py) and are the most common
non-resnet choice in FLAIR community configs. Oracle: the hand-built torch
mirror tests/torch_ref_efficientnet.py (efficientnet-pytorch is not
installed; smp-exact ``encoder._blocks.{j}`` key names) + the committed
key/shape manifest.

Numerics mirrored exactly:

- TF-style **static same padding**: each conv's zero-padding is computed
  once from the variant's default image size (224/240/.../600) walking the
  stride trajectory — at even feature sizes a k3/s2 conv pads (0,1) and a
  k5/s2 pads (1,2) (asymmetric!), at odd sizes (b3's 75x75 stage) they pad
  symmetrically; stride-1 convs always pad k//2. Reproduced via an
  image-size walk at plan time.
- MBConv: 1x1 expand (skipped when expand_ratio==1) -> BN -> swish ->
  depthwise kxk -> BN -> swish -> squeeze-excite (squeeze to
  ``int(0.25 * block_input_filters)`` of the *unexpanded* input, swish,
  sigmoid gate) -> 1x1 project -> BN; identity skip when stride 1 and
  in==out, with drop-connect ``rate * j / n_blocks`` during training.
- BatchNorm eps 1e-3, momentum 0.01 (flax 0.99) — EfficientNet's own
  constants, NOT the torchvision 1e-5/0.1.
- channel/repeat scaling: TF-slim round_filters (divisor 8) and
  ceil-scaled repeats per the width/depth coefficients.
- smp's U-Net feature taps sit at stage boundaries: input, stem,
  stage2 (stride 4), stage3 (stride 8), stage5 (stride 16, the s1 112-ch
  stage), stage7 (stride 32) — verified against smp's published
  ``stage_idxs`` arithmetic for b1..b7.
- smp make_dilated for output_stride 16/8: strides in the dilated stages
  become 1, depthwise convs get the dilation rate and symmetric
  ``(k//2)*rate`` padding (smp's replace_strides_with_dilation removes the
  static padding).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

# width_coefficient, depth_coefficient, default image size
EFFICIENTNET_SPECS = {
    "efficientnet-b0": (1.0, 1.0, 224),
    "efficientnet-b1": (1.0, 1.1, 240),
    "efficientnet-b2": (1.1, 1.2, 260),
    "efficientnet-b3": (1.2, 1.4, 300),
    "efficientnet-b4": (1.4, 1.8, 380),
    "efficientnet-b5": (1.6, 2.2, 456),
    "efficientnet-b6": (1.8, 2.6, 528),
    "efficientnet-b7": (2.0, 3.1, 600),
}

# base (b0) stages: repeats, kernel, stride, expand_ratio, in, out
_BASE_STAGES = (
    (1, 3, 1, 1, 32, 16),
    (2, 3, 2, 6, 16, 24),
    (2, 5, 2, 6, 24, 40),
    (3, 3, 2, 6, 40, 80),
    (3, 5, 1, 6, 80, 112),
    (4, 5, 2, 6, 112, 192),
    (1, 3, 1, 6, 192, 320),
)

_BN_EPS = 1e-3      # efficientnet-pytorch batch_norm_epsilon
_BN_MOMENTUM = 0.99  # torch momentum 0.01

DROP_CONNECT_RATE = 0.2  # efficientnet-pytorch global default


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    """efficientnet-pytorch round_filters (TF-slim rounding)."""
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def _same_pad(size: int, k: int, s: int) -> tuple[int, int]:
    """Conv2dStaticSamePadding's (left, right) pad at a given input size."""
    o = math.ceil(size / s)
    pad = max((o - 1) * s + k - size, 0)
    return (pad // 2, pad - pad // 2)


def efficientnet_plan(name: str, output_stride: int = 32) -> dict:
    """Static per-block plan: channels, kernels, strides, pad pairs, se dims.

    The pad pairs come from walking the variant's default image size through
    the stride trajectory, exactly like efficientnet-pytorch's
    get_same_padding_conv2d(image_size=...) static construction.
    """
    width, depth, image = EFFICIENTNET_SPECS[name]
    size = image
    stem_ch = round_filters(32, width)
    stem_pad = _same_pad(size, 3, 2)
    size = math.ceil(size / 2)

    # output_stride dilation per smp make_dilated: encoder stages 4+5 (=EN
    # stages 4,5) and 5 (=EN stages 6,7) in get_stages numbering
    dilate_from = {32: None, 16: 5, 8: 3}[output_stride]  # EN stage index (0-based)
    blocks = []
    boundaries = []
    dilation = 1
    for si, (r, k, s, e, cin, cout) in enumerate(_BASE_STAGES):
        repeats = int(math.ceil(depth * r))
        cin_r = round_filters(cin, width)
        cout_r = round_filters(cout, width)
        if dilate_from is not None and si == dilate_from:
            dilation *= 2
        elif dilate_from is not None and si == 5 and output_stride == 8:
            dilation *= 2  # second dilation jump handled below
        for j in range(repeats):
            stride = s if j == 0 else 1
            bin_ = cin_r if j == 0 else cout_r
            dilated = dilate_from is not None and si >= dilate_from
            if dilated:
                eff_stride = 1
                pad = ((k // 2) * dilation,) * 2  # symmetric; static pad removed
                d = dilation
            else:
                eff_stride = stride
                pad = _same_pad(size, k, stride)
                d = 1
            if not dilated and stride > 1:
                size = math.ceil(size / stride)
            blocks.append(dict(
                kernel=k, stride=eff_stride, dilation=d, expand=e,
                cin=bin_, cout=cout_r,
                se=max(1, int(bin_ * 0.25)),
                # smp's id_skip checks the ORIGINAL block-args stride, so a
                # dilated (stride-removed) first block still has no residual
                skip=(stride == 1 and bin_ == cout_r),
                pad=(pad, pad) if isinstance(pad[0], int) else pad,
            ))
        boundaries.append(len(blocks))
    # smp feature taps: after EN stages 2, 3, 5, 7 (1-based)
    stage_idxs = (boundaries[1], boundaries[2], boundaries[4])
    out_channels = (stem_ch,
                    round_filters(24, width), round_filters(40, width),
                    round_filters(112, width), round_filters(320, width))
    return dict(stem_ch=stem_ch, stem_pad=stem_pad, blocks=blocks,
                stage_idxs=stage_idxs, out_channels=out_channels,
                n_blocks=len(blocks))


class MBConvBlock(nn.Module):
    """efficientnet-pytorch MBConvBlock (static-same-pad variant)."""

    kernel: int
    stride: int
    dilation: int
    expand: int
    cin: int
    cout: int
    se: int
    skip: bool
    pad: tuple  # ((top, bottom) == (left, right)) pair from the plan
    drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=_BN_MOMENTUM, epsilon=_BN_EPS,
                                dtype=jnp.float32, param_dtype=jnp.float32,
                                name=name)

        inputs = x
        mid = self.cin * self.expand
        if self.expand != 1:
            x = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="expand_conv")(x)
            x = jax.nn.silu(bn("expand_bn")(x))
        p = self.pad
        x = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=(tuple(p[0]), tuple(p[1])),
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=mid, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="dw_conv")(x)
        x = jax.nn.silu(bn("dw_bn")(x))
        # squeeze-excite on the EXPANDED map, squeezed to 0.25 * unexpanded in
        g = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        g = g.astype(self.dtype)
        g = nn.Conv(self.se, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="se_reduce")(g)
        g = nn.Conv(mid, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="se_expand")(jax.nn.silu(g))
        x = jax.nn.sigmoid(g.astype(jnp.float32)).astype(x.dtype) * x
        x = nn.Conv(self.cout, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="project_conv")(x)
        x = bn("project_bn")(x)
        if self.skip:
            if train and self.drop_rate > 0:
                # efficientnet-pytorch drop_connect: per-SAMPLE binary keep
                keep = 1.0 - self.drop_rate
                rng = self.make_rng("dropout")
                mask = jax.random.bernoulli(
                    rng, keep, (x.shape[0], 1, 1, 1)).astype(x.dtype)
                x = x / keep * mask
            x = x + inputs
        return x


class EfficientNetEncoder(nn.Module):
    """smp EfficientNetEncoder: 6 U-Net pyramid levels at stage boundaries.

    Feature channels (b0): (C_in, 32, 24, 40, 112, 320); see
    efficientnet_plan for the per-variant table.
    """

    name_spec: str = "efficientnet-b0"
    output_stride: int = 32
    depth: int = 5
    remat: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> tuple[int, ...]:
        p = efficientnet_plan(self.name_spec, self.output_stride)
        return (0,) + p["out_channels"]

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        plan = efficientnet_plan(self.name_spec, self.output_stride)
        features = [x]
        sp = plan["stem_pad"]
        y = nn.Conv(plan["stem_ch"], (3, 3), strides=(2, 2),
                    padding=(tuple(sp), tuple(sp)), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem_conv")(x.astype(self.dtype))
        y = nn.BatchNorm(use_running_average=not train, momentum=_BN_MOMENTUM,
                         epsilon=_BN_EPS, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="stem_bn")(y)
        y = jax.nn.silu(y)
        features.append(y)  # stride 2

        block_cls = (nn.remat(MBConvBlock, static_argnums=(2,))
                     if self.remat else MBConvBlock)
        taps = set(plan["stage_idxs"])
        n = plan["n_blocks"]
        # smp runs stages [2..depth]; depth 5 = all blocks, depth 3 stops at
        # the stride-8 tap (depth+1 features total)
        stop = sorted(taps)[self.depth - 2] if self.depth < 5 else n
        for j, b in enumerate(plan["blocks"][:stop]):
            y = block_cls(drop_rate=DROP_CONNECT_RATE * j / n,
                          dtype=self.dtype, name=f"block{j}", **b)(y, train)
            if (j + 1) in taps and len(features) < self.depth + 1:
                features.append(y)
        if len(features) < self.depth + 1:
            features.append(y)  # final stage (stride 32 / dilated)
        return features
