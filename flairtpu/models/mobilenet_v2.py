"""Flax MobileNetV2 + DeepLabV3 head (HF-provider family).

TPU-native port of transformers' ``MobileNetV2ForSemanticSegmentation``
(modeling_mobilenet_v2.py: MobileNetV2Stem/InvertedResidual/Model,
MobileNetV2DeepLabV3Plus) — the ``google/deeplabv3_mobilenet_v2_1.0_513``
checkpoints. Part of the full ``AutoModelForSemanticSegmentation`` registry
coverage for the reference HuggingFace provider (src/flair/model.py:43-50).

Numerics mirrored from the torch implementation:
- TF-style "SAME" padding throughout (config.tf_padding default; JAX's
  ``padding='SAME'`` is the same convention torch's apply_tf_padding
  reimplements), ReLU6 activations, backbone BatchNorm eps 0.001
  (config.layer_norm_eps) vs head BatchNorm eps 1e-5;
- stem: full 3x3/2 conv -> depthwise 3x3 -> linear 1x1 (the first inverted
  residual with the expansion fused into the stem conv);
- 16 inverted residuals with the reference channel/stride tables and
  dilation switching at ``output_stride`` (MobileNetV2Model);
- head: global-pool branch (1x1 conv + bilinear *align_corners=True*
  upsample) concatenated with a 1x1 conv branch, 1x1 projection, 1x1
  classifier (MobileNetV2DeepLabV3Plus — despite the name there is no
  low-level skip; it is the reference's DeepLabV3-style head).

The classifier's stride-``output_stride`` logits are bilinearly upsampled
(align_corners=False) to input resolution, matching the other ports.

The backbone's final 1x1 expansion to 1280 ch (``conv_1x1``) exists in
checkpoints but is unused by the seg head (the head consumes the last
inverted-residual map); its keys are skipped on conversion.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from flairtpu.models.mobilevit import _make_divisible
from flairtpu.models.swin_upernet import _conv_w, _put, _resize

# MobileNetV2Model channel/stride tables (modeling_mobilenet_v2.py:454-458)
_CHANNELS = (16, 24, 24, 32, 32, 32, 64, 64, 64, 64, 96, 96, 96, 160, 160,
             160, 320)
_STRIDES = (2, 1, 2, 1, 1, 2, 1, 1, 1, 1, 1, 1, 2, 1, 1, 1)


def _scaled(channels: int, depth_multiplier: float) -> int:
    return _make_divisible(int(round(channels * depth_multiplier)))


class ConvBN(nn.Module):
    """MobileNetV2ConvLayer: SAME-padded conv -> BN -> activation."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    act: str | None = "relu6"
    norm: bool = True
    bias: bool = False
    bn_eps: float = 1e-3  # config.layer_norm_eps (backbone); head uses 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=self.groups, use_bias=self.bias,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv")(x.astype(self.dtype))
        if self.norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=self.bn_eps, dtype=self.dtype,
                             param_dtype=jnp.float32, name="bn")(x)
        if self.act == "relu6":
            x = jnp.clip(x, 0.0, 6.0)
        elif self.act == "relu":
            x = jax.nn.relu(x)
        return x


class InvertedResidual(nn.Module):
    """MobileNetV2InvertedResidual: 1x1 expand -> 3x3 dw -> 1x1 linear."""

    features: int
    stride: int = 1
    dilation: int = 1
    expand_ratio: float = 6.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        exp = _make_divisible(int(round(in_ch * self.expand_ratio)))
        y = ConvBN(exp, kernel=1, dtype=self.dtype, name="expand")(x, train)
        y = ConvBN(exp, kernel=3, stride=self.stride, groups=exp,
                   dilation=self.dilation, dtype=self.dtype, name="dw")(y, train)
        y = ConvBN(self.features, kernel=1, act=None, dtype=self.dtype,
                   name="reduce")(y, train)
        if self.stride == 1 and in_ch == self.features:
            return x + y
        return y


class MobileNetV2Backbone(nn.Module):
    """Stem + 16 inverted residuals; returns the last residual map."""

    depth_multiplier: float = 1.0
    output_stride: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dm = self.depth_multiplier
        stem_ch = _scaled(32, dm)
        # stem = first IR with its expansion as the full stem conv
        # (first_layer_is_expansion: no separate expand_1x1)
        x = ConvBN(stem_ch, kernel=3, stride=2, dtype=self.dtype,
                   name="stem_conv")(x, train)
        x = ConvBN(stem_ch, kernel=3, groups=stem_ch, dtype=self.dtype,
                   name="stem_dw")(x, train)
        x = ConvBN(_scaled(_CHANNELS[0], dm), kernel=1, act=None,
                   dtype=self.dtype, name="stem_reduce")(x, train)

        current_stride, dilation = 2, 1
        for i in range(16):
            if current_stride == self.output_stride:
                layer_stride, layer_dilation = 1, dilation
                dilation *= _STRIDES[i]
            else:
                layer_stride, layer_dilation = _STRIDES[i], 1
                current_stride *= layer_stride
            x = InvertedResidual(_scaled(_CHANNELS[i + 1], dm),
                                 stride=layer_stride, dilation=layer_dilation,
                                 dtype=self.dtype, name=f"block{i}")(x, train)
        return x


class MobileNetV2Seg(nn.Module):
    """MobileNetV2ForSemanticSegmentation: backbone -> pooled+conv head."""

    classes: int = 13
    use_metadata: bool = False  # HF provider has no metadata path
    depth_multiplier: float = 1.0
    output_stride: int = 8
    head_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mtd=None, train: bool = False) -> jax.Array:
        del mtd  # metadata fusion is a resnet-unet (smp provider) feature
        B, H, W, _ = x.shape
        f = MobileNetV2Backbone(self.depth_multiplier, self.output_stride,
                                dtype=self.dtype, name="backbone")(x, train)
        ch = self.head_channels
        pooled = jnp.mean(f, axis=(1, 2), keepdims=True)
        pooled = ConvBN(ch, kernel=1, act="relu", bn_eps=1e-5,
                        dtype=self.dtype, name="conv_pool")(pooled, train)
        # 1x1 -> spatial is a broadcast for any align_corners setting
        # (torch uses align_corners=True here)
        aspp = ConvBN(ch, kernel=1, act="relu", bn_eps=1e-5,
                      dtype=self.dtype, name="conv_aspp")(f, train)
        y = jnp.concatenate([jnp.broadcast_to(pooled, aspp.shape), aspp],
                            axis=-1)
        y = ConvBN(ch, kernel=1, act="relu", bn_eps=1e-5, dtype=self.dtype,
                   name="conv_projection")(y, train)
        logits = ConvBN(self.classes, kernel=1, act=None, norm=False,
                        bias=True, dtype=self.dtype, name="classifier")(y, train)
        return _resize(logits.astype(jnp.float32), (H, W))


# ---------------------------------------------------------------------------
# transformers MobileNetV2ForSemanticSegmentation state dict -> Flax
# ---------------------------------------------------------------------------

def _put_convbn(params: dict, stats: dict, base: tuple, rest: list,
                arr: np.ndarray) -> None:
    if rest[0] == "convolution":
        _put(params, base + ("conv", "kernel" if rest[1] == "weight" else "bias"),
             _conv_w(arr) if rest[1] == "weight" else arr)
    elif rest[0] == "normalization":
        tgt = {"weight": ("scale", params), "bias": ("bias", params),
               "running_mean": ("mean", stats), "running_var": ("var", stats)}
        name, tree = tgt[rest[1]]
        _put(tree, base + ("bn", name), arr)
    else:
        raise KeyError(f"unrecognized conv layer key {'.'.join(rest)!r}")


def hf_mobilenet_v2_torch_to_flax(sd: dict[str, np.ndarray]) -> dict:
    """Key-exact converter (MobileNetV2ForSemanticSegmentation layout)."""
    params: dict = {}
    stats: dict = {}
    stem_map = {"first_conv": "stem_conv", "conv_3x3": "stem_dw",
                "reduce_1x1": "stem_reduce", "expand_1x1": "stem_expand"}
    ir_map = {"expand_1x1": "expand", "conv_3x3": "dw", "reduce_1x1": "reduce"}

    for key, arr in sd.items():
        arr = np.asarray(arr)
        parts = key.split(".")
        if key.endswith("num_batches_tracked"):
            continue
        if key.startswith("mobilenet_v2.conv_stem."):
            _put_convbn(params, stats, ("backbone", stem_map[parts[2]]),
                        parts[3:], arr)
            continue
        if key.startswith("mobilenet_v2.layer."):
            i, rest = int(parts[2]), parts[3:]
            _put_convbn(params, stats,
                        ("backbone", f"block{i}", ir_map[rest[0]]),
                        rest[1:], arr)
            continue
        if key.startswith("mobilenet_v2.conv_1x1."):
            continue  # classification expansion; unused by the seg head
        if key.startswith("segmentation_head."):
            name = parts[1]
            if name in ("conv_pool", "conv_aspp", "conv_projection",
                        "classifier"):
                _put_convbn(params, stats, (name,), parts[2:], arr)
                continue
        raise KeyError(f"unrecognized mobilenet_v2 checkpoint key {key!r}")

    return {"params": params, "batch_stats": stats}
