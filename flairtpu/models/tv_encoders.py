"""Flax ports of smp's torchvision-backed encoder families.

The reference's smp provider accepts any encoder string
(``smp.create_model(arch, encoder_name, ...)``, src/flair/model.py:35-41).
Beyond the resnet/resnext and efficientnet families (resnet.py /
efficientnet.py), the remaining torchvision-wrapped encoders smp ships are
ported here:

- ``mobilenet_v2``   — smp/encoders/mobilenet.py wraps torchvision
  MobileNetV2 (width 1.0); 6 features tapped at torchvision ``features``
  indices {stem, 1, 3, 6, 13, 18}, out_channels (3, 16, 24, 32, 96, 1280).
  Supports smp make_dilated (output_stride 16/8): every conv in the dilated
  stage slices gets stride 1, the dilation rate, and symmetric
  ``(k//2)*rate`` padding (smp/encoders/_utils.py
  replace_strides_with_dilation); residual gates keep the ORIGINAL stride.
- ``vgg11/13/16/19[_bn]`` — smp/encoders/vgg.py wraps torchvision VGG
  ``features``; stages split at MaxPool boundaries (each stage *starts*
  with the previous boundary's pool), out_channels
  (64, 128, 256, 512, 512, 512) — feature 0 is the stride-1 conv output,
  not the input, and the final stage is the lone trailing pool.
  ``make_dilated`` raises in smp (max-pool downsampling), so deeplabv3,
  deeplabv3plus and pan reject vgg encoders (registry.check_smp).
- ``densenet121/161/169/201`` — smp/encoders/densenet.py wraps torchvision
  DenseNet; skips are tapped INSIDE the transitions (after norm+relu,
  before the compression conv+pool — smp's TransitionWithSkip), giving
  out_channels e.g. (3, 64, 256, 512, 1024, 1024) for densenet121; the
  final stage is denseblock4 + norm5 with NO trailing relu. ``make_dilated``
  raises in smp, same arch restrictions as vgg.

All three use torchvision's BatchNorm defaults (eps 1e-5, momentum 0.1) and
symmetric conv padding. NHWC, fp32 params, configurable compute dtype
(bf16 on TPU). Oracle: hand-built torch mirrors with torchvision-exact
state-dict keys (tests/torch_ref_tv.py) + committed key/shape manifests —
torchvision/smp are not installed here (same caveat as the other smp
mirrors, tests/torch_ref.py:1-8).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from flairtpu.models.resnet import batch_norm, conv, max_pool_3x3_s2

# ---------------------------------------------------------------------------
# MobileNetV2 (torchvision layout, width_mult 1.0 — smp's single entry)
# ---------------------------------------------------------------------------

# torchvision inverted_residual_setting: (expand t, channels c, repeats n,
# first stride s)
_MNV2_SETTING = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                 (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))
# smp stage boundaries over torchvision `features` indices: get_stages slices
# [:2], [2:4], [4:7], [7:14], [14:] — taps after indices 1, 3, 6, 13, 18
_MNV2_TAPS = (1, 3, 6, 13, 18)
_MNV2_STAGE4 = range(7, 14)   # dilated at output_stride 8
_MNV2_STAGE5 = range(14, 19)  # dilated at output_stride 16 (rate 2) / 8 (rate 4)


def mobilenet_v2_plan(output_stride: int = 32) -> list[dict]:
    """Per-features-index block table (index 1..17), with smp dilation."""
    if output_stride not in (32, 16, 8):
        raise ValueError(f"output_stride {output_stride} not in (32, 16, 8)")
    blocks = []
    i = 1
    cin = 32
    for t, c, n, s in _MNV2_SETTING:
        for j in range(n):
            stride = s if j == 0 else 1
            if output_stride == 8 and i in _MNV2_STAGE4:
                dilation, eff_stride = 2, 1
            elif output_stride != 32 and i in _MNV2_STAGE5:
                dilation, eff_stride = (2 if output_stride == 16 else 4), 1
            else:
                dilation, eff_stride = 1, stride
            blocks.append(dict(index=i, cin=cin, cout=c, expand=t,
                               stride=eff_stride, dilation=dilation,
                               # torchvision gates the residual on the
                               # ORIGINAL stride (set before make_dilated
                               # rewrites it)
                               skip=(stride == 1 and cin == c)))
            cin = c
            i += 1
    return blocks


class TVInvertedResidual(nn.Module):
    """torchvision MobileNetV2 InvertedResidual (symmetric padding,
    BN eps 1e-5): [1x1 expand ->] 3x3 dw -> 1x1 linear project."""

    cout: int
    stride: int = 1
    dilation: int = 1
    expand: int = 1
    skip: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        def relu6(v):
            return jnp.clip(v, 0.0, 6.0)

        cin = x.shape[-1]
        mid = cin * self.expand
        y = x
        if self.expand != 1:
            y = conv(mid, 1, padding=0, dtype=self.dtype, name="expand")(y)
            y = relu6(batch_norm(self.dtype, "expand_bn")(
                y, use_running_average=not train))
        y = conv(mid, 3, self.stride, dilation=self.dilation, groups=mid,
                 dtype=self.dtype, name="dw")(y)
        y = relu6(batch_norm(self.dtype, "dw_bn")(
            y, use_running_average=not train))
        y = conv(self.cout, 1, padding=0, dtype=self.dtype, name="project")(y)
        y = batch_norm(self.dtype, "project_bn")(
            y, use_running_average=not train)
        return x + y if self.skip else y


class MobileNetV2SmpEncoder(nn.Module):
    """smp MobileNetV2Encoder: 6 pyramid features at torchvision stage taps."""

    output_stride: int = 32
    depth: int = 5
    remat: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> tuple[int, ...]:
        return (0, 16, 24, 32, 96, 1280)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        def relu6(v):
            return jnp.clip(v, 0.0, 6.0)

        features = [x]
        y = conv(32, 3, 2, dtype=self.dtype, name="f0_conv")(
            x.astype(self.dtype))
        y = relu6(batch_norm(self.dtype, "f0_bn")(
            y, use_running_average=not train))
        taps = set(_MNV2_TAPS[:self.depth])
        stop = _MNV2_TAPS[self.depth - 1]
        block_cls = (nn.remat(TVInvertedResidual, static_argnums=(2,))
                     if self.remat else TVInvertedResidual)
        for b in mobilenet_v2_plan(self.output_stride):
            i = b.pop("index")
            if i > min(stop, 17):
                break
            b.pop("cin")
            y = block_cls(dtype=self.dtype, name=f"f{i}", **b)(y, train)
            if i in taps:
                features.append(y)
        if stop == 18:
            # features.18: 1x1 ConvBNReLU6 expansion to 1280 (part of smp
            # stage 5, so it IS the deepest feature, unlike the HF port
            # which drops it — smp/encoders/mobilenet.py get_stages)
            d = 2 if self.output_stride == 16 else (
                4 if self.output_stride == 8 else 1)
            y = conv(1280, 1, padding=0, dilation=d, dtype=self.dtype,
                     name="f18_conv")(y)
            y = relu6(batch_norm(self.dtype, "f18_bn")(
                y, use_running_average=not train))
            features.append(y)
        return features


# ---------------------------------------------------------------------------
# VGG (torchvision make_layers configs)
# ---------------------------------------------------------------------------

_VGG_CFGS = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg13": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
              512, 512, "M"),
    "vgg16": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
              "M", 512, 512, 512, "M"),
    "vgg19": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
}
VGG_NAMES = tuple(n for base in _VGG_CFGS for n in (base, base + "_bn"))


class VGGEncoder(nn.Module):
    """smp VGGEncoder: stages split at MaxPool boundaries (pool opens the
    NEXT stage); module names are the torchvision ``features`` indices."""

    name_spec: str = "vgg11"
    output_stride: int = 32
    depth: int = 5
    remat: bool = False  # accepted for factory uniformity; VGG has no blocks
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> tuple[int, ...]:
        return (64, 128, 256, 512, 512, 512)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        if self.output_stride != 32:
            # smp VGGEncoder.make_dilated (encoders/vgg.py): pooling
            # downsampling cannot be dilated
            raise ValueError(
                "'VGG' models do not support dilated mode due to Max Pooling"
                " operations for downsampling!")
        base = self.name_spec[:-3] if self.name_spec.endswith("_bn") else self.name_spec
        use_bn = self.name_spec.endswith("_bn")
        features: list[jax.Array] = []
        y = x.astype(self.dtype)
        i = 0
        for v in _VGG_CFGS[base]:
            if v == "M":
                features.append(y)
                if len(features) == self.depth + 1:
                    return features
                y = nn.max_pool(y, (2, 2), strides=(2, 2))
                i += 1
            else:
                y = conv(v, 3, use_bias=True, dtype=self.dtype,
                         name=f"f{i}")(y)
                i += 1
                if use_bn:
                    y = batch_norm(self.dtype, f"f{i}")(
                        y, use_running_average=not train)
                    i += 1
                y = nn.relu(y)
                i += 1  # the ReLU consumes a torchvision features index
        features.append(y)  # stage 5: the lone trailing pool's output
        return features


# ---------------------------------------------------------------------------
# DenseNet (torchvision layout; skips tapped inside transitions)
# ---------------------------------------------------------------------------

# init features, growth rate, per-block layer counts (bn_size is 4 for all)
DENSENET_SPECS = {
    "densenet121": (64, 32, (6, 12, 24, 16)),
    "densenet161": (96, 48, (6, 12, 36, 24)),
    "densenet169": (64, 32, (6, 12, 32, 32)),
    "densenet201": (64, 32, (6, 12, 48, 32)),
}
_DN_BN_SIZE = 4


def densenet_out_channels(name: str) -> tuple[int, ...]:
    init, growth, blocks = DENSENET_SPECS[name]
    out = [0, init]
    ch = init
    for b, n in enumerate(blocks):
        ch += n * growth
        out.append(ch)
        if b < len(blocks) - 1:
            ch //= 2  # transition compression
    return tuple(out)


class DenseLayer(nn.Module):
    """torchvision _DenseLayer: bn-relu-conv1x1(4k) -> bn-relu-conv3x3(k);
    the caller concatenates."""

    growth: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = nn.relu(batch_norm(self.dtype, "norm1")(
            x, use_running_average=not train))
        y = conv(_DN_BN_SIZE * self.growth, 1, padding=0, dtype=self.dtype,
                 name="conv1")(y)
        y = nn.relu(batch_norm(self.dtype, "norm2")(
            y, use_running_average=not train))
        return conv(self.growth, 3, dtype=self.dtype, name="conv2")(y)


class DenseNetEncoder(nn.Module):
    """smp DenseNetEncoder: stem, then dense blocks with transition-skip taps."""

    name_spec: str = "densenet121"
    output_stride: int = 32
    depth: int = 5
    remat: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> tuple[int, ...]:
        return densenet_out_channels(self.name_spec)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        if self.output_stride != 32:
            # smp DenseNetEncoder.make_dilated (encoders/densenet.py)
            raise ValueError(
                "DenseNet encoders do not support dilated mode due to pooling"
                " operation for downsampling!")
        init, growth, blocks = DENSENET_SPECS[self.name_spec]
        features = [x]
        y = conv(init, 7, 2, padding=3, dtype=self.dtype, name="conv0")(
            x.astype(self.dtype))
        y = nn.relu(batch_norm(self.dtype, "norm0")(
            y, use_running_average=not train))
        features.append(y)  # stride 2
        if self.depth < 2:
            return features
        y = max_pool_3x3_s2(y)
        layer_cls = (nn.remat(DenseLayer, static_argnums=(2,))
                     if self.remat else DenseLayer)
        ch = init
        for b in range(min(self.depth - 1, 4)):
            for l in range(blocks[b]):
                new = layer_cls(growth, dtype=self.dtype,
                                name=f"db{b + 1}_l{l + 1}")(y, train)
                y = jnp.concatenate([y, new.astype(y.dtype)], axis=-1)
            ch += blocks[b] * growth
            if b < 3:
                # TransitionWithSkip: the tap is post-relu, PRE-compression
                skip = nn.relu(batch_norm(self.dtype, f"tr{b + 1}_norm")(
                    y, use_running_average=not train))
                features.append(skip)
                y = conv(ch // 2, 1, padding=0, dtype=self.dtype,
                         name=f"tr{b + 1}_conv")(skip)
                y = nn.avg_pool(y, (2, 2), strides=(2, 2))
                ch //= 2
            else:
                # final stage: denseblock4 + norm5, NO relu (smp stage 5)
                features.append(batch_norm(self.dtype, "norm5")(
                    y, use_running_average=not train))
        return features
