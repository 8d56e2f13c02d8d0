"""Flax PAN decoder (smp 0.3.3 decoders/pan/decoder.py).

PAN (Pyramid Attention Network, arXiv:1805.10180) as shipped by
segmentation_models_pytorch 0.3.3 — with MAnet, the last smp architecture
the reference accepts (src/flair/model.py:35-41) that round 2 left unported.
Oracle: hand-built torch mirror ``tests/torch_ref.py::ResNet34PAN``
(smp-exact key names) + the committed key/shape manifest.

smp PAN geometry: the encoder runs at output_stride 16 (smp's PAN model
hardcodes it), the decoder is a single channel width (default 32):

- FPA on the deepest feature: global-pool branch (1x1 ConvBnRelu, bilinear
  align-corners broadcast back), 1x1 "mid" branch, and a 3-level max-pooled
  1-channel pyramid (7x7 / 5x5 / two 3x3 ConvBnRelu) merged bottom-up with
  align-corners bilinear upsamples; the pyramid map multiplies the mid
  branch, then the pooled branch is added.
- three GAU blocks walk up the skips (stride 16 -> 8 -> 4): the high-level
  map is gated (GAP -> 1x1 ConvBn (no relu) -> sigmoid) and multiplies the
  3x3-convolved low-level feature; the bilinearly upsampled high-level map
  is added.

Head: kernel 3 + 4x align-corners upsample (stride-4 decoder output).
All ConvBnRelu convs carry bias (smp's PAN ConvBnRelu default), unlike the
bias-free Conv2dReLU used by the other smp decoders.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from flairtpu.models.deeplab import upsample_align_corners
from flairtpu.models.resnet import batch_norm, conv


class ConvBnRelu(nn.Module):
    """smp pan ConvBnRelu: conv(bias=True) -> BN -> optional ReLU."""

    features: int
    kernel: int = 1
    padding: int = 0
    add_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = conv(self.features, self.kernel, padding=self.padding,
                 use_bias=True, dtype=self.dtype, name="conv")(x)
        x = batch_norm(self.dtype, "bn")(x, use_running_average=not train)
        if self.add_relu:
            x = nn.relu(x)
        return x


def _max_pool_2x2(x: jax.Array) -> jax.Array:
    """torch MaxPool2d(kernel_size=2, stride=2) (floor mode), NHWC."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
        padding=((0, 0), (0, 0), (0, 0), (0, 0)))


class FPABlock(nn.Module):
    """smp FPABlock (bilinear align-corners upscale mode)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        B, H, W, _ = x.shape
        up = lambda t, hw: upsample_align_corners(t, hw)
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2),
                          keepdims=True).astype(x.dtype)
        b1 = ConvBnRelu(self.features, 1, dtype=self.dtype,
                        name="branch1")(pooled, train)
        b1 = up(b1, (H, W))
        mid = ConvBnRelu(self.features, 1, dtype=self.dtype,
                         name="mid")(x, train)
        x1 = ConvBnRelu(1, 7, padding=3, dtype=self.dtype,
                        name="down1")(_max_pool_2x2(x), train)
        x2 = ConvBnRelu(1, 5, padding=2, dtype=self.dtype,
                        name="down2")(_max_pool_2x2(x1), train)
        x3 = ConvBnRelu(1, 3, padding=1, dtype=self.dtype,
                        name="down3_0")(_max_pool_2x2(x2), train)
        x3 = ConvBnRelu(1, 3, padding=1, dtype=self.dtype,
                        name="down3_1")(x3, train)
        x3 = up(x3, (H // 4, W // 4))
        x2 = ConvBnRelu(1, 5, padding=2, dtype=self.dtype,
                        name="conv2")(x2, train)
        y = up(x2 + x3, (H // 2, W // 2))
        x1 = ConvBnRelu(1, 7, padding=3, dtype=self.dtype,
                        name="conv1")(x1, train)
        y = up(y + x1, (H, W))
        return y * mid + b1


class GAUBlock(nn.Module):
    """smp GAUBlock: SE-gated low-level fuse + upsampled high-level add."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array,
                 train: bool = False) -> jax.Array:
        # x: low-level (larger), y: high-level (smaller or equal)
        H, W = x.shape[1:3]
        y_up = upsample_align_corners(y, (H, W))
        x = ConvBnRelu(self.features, 3, padding=1, dtype=self.dtype,
                       name="conv2")(x, train)
        g = jnp.mean(y.astype(jnp.float32), axis=(1, 2),
                     keepdims=True).astype(y.dtype)
        g = ConvBnRelu(self.features, 1, add_relu=False, dtype=self.dtype,
                       name="conv1")(g, train)
        g = jax.nn.sigmoid(g.astype(jnp.float32)).astype(x.dtype)
        return y_up + x * g


class PANDecoder(nn.Module):
    """smp PANDecoder over an output-stride-16 encoder; one channel width."""

    decoder_channels: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: list[jax.Array], train: bool = False):
        ch = self.decoder_channels
        x5 = FPABlock(ch, dtype=self.dtype, name="fpa")(features[-1], train)
        x4 = GAUBlock(ch, dtype=self.dtype, name="gau3")(features[-2], x5, train)
        x3 = GAUBlock(ch, dtype=self.dtype, name="gau2")(features[-3], x4, train)
        x2 = GAUBlock(ch, dtype=self.dtype, name="gau1")(features[-4], x3, train)
        return x2
