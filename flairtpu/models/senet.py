"""Flax SENet encoders (pretrainedmodels topology), NHWC, TPU-friendly.

The reference's smp provider accepts the senet encoder family
(``smp.create_model(arch, encoder_name='se_resnext50_32x4d', ...)``,
reference src/flair/model.py:35-41); smp/encoders/senet.py wraps
pretrainedmodels' SENet (Hu et al., arXiv:1709.01507) and taps 6 pyramid
features via ``get_stages()``:

- stage 1: ``layer0`` without its pool (stride 2; 64 ch, senet154: 128),
- stage 2: the ceil-mode 3x3/s2 MaxPool + ``layer1`` (stride 4, 256 ch),
- stages 3-5: ``layer2..4`` (512/1024/2048 ch).

Three block flavors (pretrainedmodels senet.py):

- ``SEResNetBottleneck`` (se_resnet50/101/152): 1x1(planes, **stride on
  conv1**) -> 3x3(planes) -> 1x1(4*planes), unlike torchvision which
  strides the 3x3;
- ``SEResNeXtBottleneck`` (se_resnext50/101_32x4d): width =
  floor(planes*base_width/64)*groups with base_width 4, stride on the
  grouped 3x3;
- ``SEBottleneck`` (senet154): 1x1 -> 2*planes, grouped-64 3x3 -> 4*planes
  (stride), 1x1 -> 4*planes; 3-conv 3x3 stem (input_3x3) and 3x3
  downsample convs in layers 2-4.

Every block ends with squeeze-excitation (global mean pool, 1x1 fc ->
C/16, relu, 1x1 fc -> C, sigmoid, multiply) applied BEFORE the residual
add. ``layer1`` always carries a 1x1/s1 downsample (inplanes 64/128 vs
256 out).

The stem pool is ``MaxPool2d(3, stride=2, ceil_mode=True)`` (padding 0) —
reproduced exactly as a reduce_window with asymmetric (0, 1) padding,
which equals torch's ceil_mode arithmetic for every input size.

``make_dilated`` (smp encoders/_base.py + _utils.py) is supported for
output_stride 16/8: every conv in the dilated stages gets stride 1, the
dilation rate and symmetric (k//2)*rate padding — including senet154's
3x3 downsample convs.

Layout is NHWC with fp32 params and configurable compute dtype (bf16 on
TPU). Oracle: hand-built torch mirror with pretrainedmodels-exact
state-dict keys (tests/torch_ref_senet.py) + committed key/shape
manifests — pretrainedmodels/smp are not installed here (same caveat as
the other smp mirrors, tests/torch_ref.py:1-8).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from flairtpu.models.resnet import batch_norm, conv

# name -> (block kind, units per stage, groups, reduction, stem width,
#          3x3-stem?, downsample kernel for layers 2-4)
SENET_SPECS = {
    "senet154": ("se", (3, 8, 36, 3), 64, 16, 128, True, 3),
    "se_resnet50": ("seresnet", (3, 4, 6, 3), 1, 16, 64, False, 1),
    "se_resnet101": ("seresnet", (3, 4, 23, 3), 1, 16, 64, False, 1),
    "se_resnet152": ("seresnet", (3, 8, 36, 3), 1, 16, 64, False, 1),
    "se_resnext50_32x4d": ("seresnext", (3, 4, 6, 3), 32, 16, 64, False, 1),
    "se_resnext101_32x4d": ("seresnext", (3, 4, 23, 3), 32, 16, 64, False, 1),
}


def max_pool_3x3_s2_ceil(x: jax.Array) -> jax.Array:
    """torch MaxPool2d(3, stride=2, ceil_mode=True) (padding 0), NHWC.

    ceil-mode output ceil((H-3)/2)+1 equals floor((H+1-3)/2)+1 for every H,
    and the overhanging window maxes over valid elements only — i.e. a
    right/bottom -inf pad of 1.
    """
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (0, 1), (0, 1), (0, 0)),
    )


class SENetBlock(nn.Module):
    """pretrainedmodels Bottleneck with SE: conv1-bn-relu, conv2-bn-relu,
    conv3-bn, SE gate, + residual, relu."""

    kind: str  # "se" | "seresnet" | "seresnext"
    planes: int
    groups: int = 1
    reduction: int = 16
    stride: int = 1  # effective stride (1 inside dilated stages)
    downsample: bool = False
    ds_kernel: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        p = self.planes
        if self.kind == "se":  # SEBottleneck (senet154)
            c1, c2, g = p * 2, p * 4, self.groups
            s1, s2 = 1, self.stride
        elif self.kind == "seresnet":  # stride lives on the 1x1 conv1
            c1, c2, g = p, p, 1
            s1, s2 = self.stride, 1
        else:  # seresnext: width = floor(planes*4/64)*groups
            w = (p * 4 // 64) * self.groups
            c1, c2, g = w, w, self.groups
            s1, s2 = 1, self.stride

        y = conv(c1, 1, s1, padding=0, dtype=self.dtype, name="conv1")(x)
        y = batch_norm(self.dtype, "bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = conv(c2, 3, s2, dilation=self.dilation, groups=g,
                 dtype=self.dtype, name="conv2")(y)
        y = batch_norm(self.dtype, "bn2")(y, use_running_average=not train)
        y = nn.relu(y)
        y = conv(p * 4, 1, 1, padding=0, dtype=self.dtype, name="conv3")(y)
        y = batch_norm(self.dtype, "bn3")(y, use_running_average=not train)

        # SEModule: pool -> fc1 (C/r, biased 1x1) -> relu -> fc2 -> sigmoid
        se = jnp.mean(y, axis=(1, 2), keepdims=True)
        se = conv(p * 4 // self.reduction, 1, padding=0, use_bias=True,
                  dtype=self.dtype, name="se_fc1")(se)
        se = nn.relu(se)
        se = conv(p * 4, 1, padding=0, use_bias=True, dtype=self.dtype,
                  name="se_fc2")(se)
        y = y * nn.sigmoid(se)

        identity = x
        if self.downsample:
            identity = conv(p * 4, self.ds_kernel, self.stride,
                            dilation=self.dilation, dtype=self.dtype,
                            name="downsample_conv")(x)
            identity = batch_norm(self.dtype, "downsample_bn")(
                identity, use_running_average=not train)
        return nn.relu(y + identity)


class SENetEncoder(nn.Module):
    """smp SENetEncoder: 6 pyramid features at pretrainedmodels stage taps.

    Output channels: (0, stem, 256, 512, 1024, 2048), stem 64 (senet154:
    128). Feature i has stride 2**i, capped by ``output_stride``.
    """

    name_spec: str = "se_resnet50"
    output_stride: int = 32
    depth: int = 5
    remat: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> tuple[int, ...]:
        stem = SENET_SPECS[self.name_spec][4]
        return (0, 64 if not SENET_SPECS[self.name_spec][5] else stem,
                256, 512, 1024, 2048)

    @nn.compact
    def __call__(self, x, train: bool = False) -> list[jax.Array]:
        kind, units, groups, reduction, inplanes, input_3x3, dks = \
            SENET_SPECS[self.name_spec]
        block_cls = (nn.remat(SENetBlock, static_argnums=(2,))
                     if self.remat else SENetBlock)

        features = [x]
        y = x.astype(self.dtype)
        if input_3x3:  # senet154: 3x 3x3 convs (5->64->64->128)
            for i, ch in enumerate((64, 64, inplanes), start=1):
                y = conv(ch, 3, 2 if i == 1 else 1, dtype=self.dtype,
                         name=f"layer0_conv{i}")(y)
                y = batch_norm(self.dtype, f"layer0_bn{i}")(
                    y, use_running_average=not train)
                y = nn.relu(y)
        else:  # 7x7/s2 stem
            y = conv(inplanes, 7, 2, padding=3, dtype=self.dtype,
                     name="layer0_conv1")(y)
            y = batch_norm(self.dtype, "layer0_bn1")(
                y, use_running_average=not train)
            y = nn.relu(y)
        features.append(y)  # stride 2 (layer0 sans pool — smp get_stages)

        y = max_pool_3x3_s2_ceil(y)
        in_ch = inplanes
        dilations = {32: {}, 16: {3: 2}, 8: {2: 2, 3: 4}}[self.output_stride]
        for stage, n_units in enumerate(units[:max(self.depth - 1, 0)]):
            planes = 64 * (2 ** stage)
            dilation = dilations.get(stage, 1)
            orig_stride = 1 if stage == 0 else 2
            stride = 1 if dilation > 1 else orig_stride
            for u in range(n_units):
                first = u == 0
                needs_ds = first and (orig_stride != 1 or in_ch != planes * 4)
                y = block_cls(
                    kind=kind,
                    planes=planes,
                    groups=groups,
                    reduction=reduction,
                    stride=stride if first else 1,
                    downsample=needs_ds,
                    # _make_layer passes kernel 1/padding 0 for layer1,
                    # the spec's downsample_kernel_size for layers 2-4
                    ds_kernel=1 if stage == 0 else dks,
                    dilation=dilation,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{u}",
                )(y, train)
                in_ch = planes * 4
            features.append(y)
        return features
