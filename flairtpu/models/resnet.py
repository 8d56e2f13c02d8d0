"""Flax ResNet encoders (torchvision topology), NHWC, TPU-friendly.

Mirrors the encoder the reference gets from segmentation-models-pytorch's
``smp.create_model(arch='unet', encoder_name='resnet34', ...)``
(reference src/flair/model.py:35-41): torchvision ResNet stem + 4 stages with
the fc head removed, exposing 6 feature maps at strides (1, 2, 4, 8, 16, 32)
for the U-Net skip connections.

Layout is NHWC (XLA:TPU's native conv layout) with parameters in fp32 and a
configurable compute dtype (bf16 feeds the MXU at full rate; fp32 is used for
bit-parity testing against torch). BatchNorm statistics always accumulate in
fp32.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

# torchvision layer specs: (block, units per stage, groups, width_per_group)
RESNET_SPECS = {
    "resnet18": ("basic", (2, 2, 2, 2), 1, 64),
    "resnet34": ("basic", (3, 4, 6, 3), 1, 64),
    "resnet50": ("bottleneck", (3, 4, 6, 3), 1, 64),
    "resnet101": ("bottleneck", (3, 4, 23, 3), 1, 64),
    "resnet152": ("bottleneck", (3, 8, 36, 3), 1, 64),
    "resnext50_32x4d": ("bottleneck", (3, 4, 6, 3), 32, 4),
    # resnext101 width ladder incl. the Instagram-WSL variants smp registers
    # natively (smp/encoders/resnet.py)
    "resnext101_32x4d": ("bottleneck", (3, 4, 23, 3), 32, 4),
    "resnext101_32x8d": ("bottleneck", (3, 4, 23, 3), 32, 8),
    "resnext101_32x16d": ("bottleneck", (3, 4, 23, 3), 32, 16),
    "resnext101_32x32d": ("bottleneck", (3, 4, 23, 3), 32, 32),
    "resnext101_32x48d": ("bottleneck", (3, 4, 23, 3), 32, 48),
}

_BN_EPS = 1e-5  # torch nn.BatchNorm2d default
_BN_MOMENTUM = 0.9  # flax semantics; == torch momentum 0.1


# BN compute dtype. fp32 by default (parity with torch, which never
# downcasts BN stat math); `bn_dtype: bfloat16` in the train config opts
# into bf16 batch-stat reductions — measured +8% train step throughput on
# the v5e (the stat materialization traffic is HBM-bound, PERFORMANCE.md
# round-4 train MFU). Params/running stats stay fp32 either way. Every
# model family shares this one factory, so the global covers them all.
_BN_DTYPE = jnp.float32


def set_bn_dtype(dtype) -> None:
    """Set the BN compute dtype ('float32' | 'bfloat16' or a jnp dtype)."""
    global _BN_DTYPE
    d = jnp.dtype(dtype)
    if d not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        raise ValueError(f"bn_dtype: expected float32 or bfloat16, got {dtype}")
    _BN_DTYPE = jnp.float32 if d == jnp.dtype(jnp.float32) else jnp.bfloat16


def batch_norm(dtype, name: str | None = None):
    return nn.BatchNorm(
        use_running_average=None,  # taken from the `use_running_average` call arg
        momentum=_BN_MOMENTUM,
        epsilon=_BN_EPS,
        dtype=_BN_DTYPE,  # fp32 unless set_bn_dtype opts into bf16
        param_dtype=jnp.float32,
        name=name,
    )


def _zero_fan_safe(init):
    """Wrap a kernel initializer so zero-channel convs initialize.

    The mit encoders emit a zero-channel stride-2 dummy feature (smp
    mix_transformer forward); decoders that concatenate it create convs
    whose kernels have a zero-sized fan axis — the tensor is empty, so any
    init is correct, but variance_scaling divides by the fan and raises
    ZeroDivisionError (torch's kaiming init no-ops on empty weights).
    """
    def wrapped(key, shape, dtype=jnp.float32):
        if 0 in tuple(shape):
            return jnp.zeros(shape, dtype)
        return init(key, shape, dtype)
    return wrapped


def conv(features: int, kernel: int, stride: int = 1, padding: int | None = None,
         use_bias: bool = False, dtype=jnp.float32, name: str | None = None,
         dilation: int = 1, groups: int = 1):
    if padding is None:
        padding = (kernel // 2) * dilation
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        kernel_dilation=(dilation, dilation),
        feature_group_count=groups,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=_zero_fan_safe(nn.linear.default_kernel_init),
        name=name,
    )


def max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1), NHWC."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def _s2d(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (p, q, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def _s2d_kernel(w: jax.Array) -> jax.Array:
    """(7,7,C,O) stride-2 pad-3 kernel -> equivalent (4,4,4C,O) stride-1
    pad-(2,1) kernel on space-to-depth input (one leading zero row/col)."""
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (8, 8, C, O)
    C, O = w.shape[2], w.shape[3]
    w2 = wp.reshape(4, 2, 4, 2, C, O).transpose(0, 2, 1, 3, 4, 5)
    return w2.reshape(4, 4, 4 * C, O)


class StemConv(nn.Module):
    """The 7x7/s2 stem conv, optionally applied via space-to-depth repack.

    Owns the torchvision-shaped (7,7,C,64) kernel either way (checkpoint
    layout unchanged; the repack happens inside the forward), so ``s2d`` is
    a pure execution-strategy knob: identical math, different MXU tiling —
    the standard TPU ResNet transform for lane-starved low-channel stems.
    """

    features: int = 64
    s2d: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (7, 7, x.shape[-1], self.features), jnp.float32)
        if not self.s2d:
            return jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), window_strides=(2, 2),
                padding=((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        w2 = _s2d_kernel(w).astype(x.dtype)
        return jax.lax.conv_general_dilated(
            _s2d(x), w2, window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3-bn-relu-3x3-bn + (optional 1x1 downsample)."""

    features: int
    stride: int = 1
    downsample: bool = False
    dilation: int = 1  # smp make_dilated: stride->1, 3x3 convs dilated
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        y = conv(self.features, 3, self.stride, dilation=self.dilation,
                 dtype=self.dtype, name="conv1")(x)
        y = batch_norm(self.dtype, "bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = conv(self.features, 3, 1, dilation=self.dilation,
                 dtype=self.dtype, name="conv2")(y)
        y = batch_norm(self.dtype, "bn2")(y, use_running_average=not train)
        if self.downsample:
            identity = conv(self.features, 1, self.stride, padding=0,
                            dtype=self.dtype, name="downsample_conv")(x)
            identity = batch_norm(self.dtype, "downsample_bn")(
                identity, use_running_average=not train)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1-3x3-1x1 with 4x expansion; ResNeXt via
    ``groups``/``base_width`` (width = features * base_width / 64 * groups)."""

    features: int
    stride: int = 1
    downsample: bool = False
    dilation: int = 1
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        width = int(self.features * self.base_width / 64) * self.groups
        y = conv(width, 1, 1, padding=0, dtype=self.dtype, name="conv1")(x)
        y = batch_norm(self.dtype, "bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = conv(width, 3, self.stride, dilation=self.dilation,
                 groups=self.groups, dtype=self.dtype, name="conv2")(y)
        y = batch_norm(self.dtype, "bn2")(y, use_running_average=not train)
        y = nn.relu(y)
        y = conv(self.features * 4, 1, 1, padding=0, dtype=self.dtype, name="conv3")(y)
        y = batch_norm(self.dtype, "bn3")(y, use_running_average=not train)
        if self.downsample:
            identity = conv(self.features * 4, 1, self.stride, padding=0,
                            dtype=self.dtype, name="downsample_conv")(x)
            identity = batch_norm(self.dtype, "downsample_bn")(
                identity, use_running_average=not train)
        return nn.relu(y + identity)


class ResNetEncoder(nn.Module):
    """ResNet feature extractor returning the 6 U-Net pyramid levels.

    Output channels: basic blocks (C_in, 64, 64, 128, 256, 512); bottleneck
    (C_in, 64, 256, 512, 1024, 2048). Feature i has stride 2**i (i=0 is the
    input itself, matching smp's nn.Identity() stage 0).
    """

    name_spec: str = "resnet34"
    # smp get_encoder(output_stride=...): 16 dilates layer4 (rate 2), 8 dilates
    # layer3 (rate 2) + layer4 (rate 4); strides in dilated stages become 1
    # (encoders/_base.py make_dilated + _utils.replace_strides_with_dilation)
    output_stride: int = 32
    # smp get_encoder(depth=...): truncate to `depth` downsampling stages
    # (depth 5 = all four residual stages; PSPNet uses depth 3 = stop after
    # layer2, stride 8)
    depth: int = 5
    # rematerialize each residual block on the backward pass (jax.checkpoint
    # via nn.remat): activation memory drops to block boundaries at the cost
    # of one extra forward — lets batch/resolution scale past HBM
    remat: bool = False
    # execute the stem via space-to-depth repack (StemConv.s2d) — identical
    # math and checkpoint layout, different MXU tiling
    s2d_stem: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> tuple[int, ...]:
        kind = RESNET_SPECS[self.name_spec][0]
        if kind == "basic":
            return (0, 64, 64, 128, 256, 512)
        return (0, 64, 256, 512, 1024, 2048)

    @nn.compact
    def __call__(self, x, train: bool = False) -> list[jax.Array]:
        kind, units, groups, base_width = RESNET_SPECS[self.name_spec]
        block = BasicBlock if kind == "basic" else Bottleneck
        if self.remat:
            block = nn.remat(block, static_argnums=(2,))  # (self, x, train)
        expansion = 1 if kind == "basic" else 4
        block_kw = {} if kind == "basic" else {"groups": groups,
                                               "base_width": base_width}

        features = [x]
        y = StemConv(64, s2d=self.s2d_stem, dtype=self.dtype,
                     name="conv1")(x.astype(self.dtype))
        y = batch_norm(self.dtype, "bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        features.append(y)  # stride 2

        y = max_pool_3x3_s2(y)
        in_ch = 64
        dilations = {32: {}, 16: {3: 2}, 8: {2: 2, 3: 4}}[self.output_stride]
        for stage, n_units in enumerate(units[:max(self.depth - 1, 0)]):
            width = 64 * (2 ** stage)
            dilation = dilations.get(stage, 1)
            stride = 1 if stage == 0 or dilation > 1 else 2
            for u in range(n_units):
                first = u == 0
                needs_ds = first and (in_ch != width * expansion or
                                      (stage != 0 and dilation == 1))
                y = block(
                    features=width,
                    stride=stride if first else 1,
                    downsample=needs_ds,
                    dilation=dilation,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{u}",
                    **block_kw,
                )(y, train)
                in_ch = width * expansion
            features.append(y)  # strides 4, 8, ... (capped by output_stride)
        return features
