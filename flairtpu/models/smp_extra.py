"""Flax ports of the remaining smp 0.3.3 decoder families: FPN, PSPNet,
LinkNet and DeepLabV3 (non-plus).

The reference's smp provider accepts any architecture string
(``smp.create_model(arch, encoder_name, ...)``, reference
src/flair/model.py:35-41); together with unet / unetplusplus /
deeplabv3plus (models/unet.py, models/deeplab.py) this file completes the
set of smp architectures usable with the resnet encoder family.

Topology is mirrored from segmentation_models_pytorch 0.3.3 (not installed
here); the numerical oracles are the hand-built torch mirrors in
tests/torch_ref.py, which emit smp's exact state-dict key names:

- FPN     (decoders/fpn/decoder.py): 1x1 lateral convs + top-down nearest
  upsample adds, per-level Conv3x3+GroupNorm(32)+ReLU segmentation blocks
  with progressive 2x upsampling, "add" merge, Dropout2d(0.2); head
  kernel 1, 4x align-corners upsample.
- PSPNet  (decoders/pspnet/decoder.py): encoder depth 3 (stride 8),
  adaptive-avg-pool pyramid (1,2,3,6) -> 1x1 Conv+BN+ReLU -> bilinear
  align-corners resize, concat with input, 1x1 fuse to 512, Dropout2d(0.2);
  head kernel 3, 8x align-corners upsample.
- LinkNet (decoders/linknet/decoder.py): per-stage 1x1 reduce -> 4x4
  stride-2 transposed conv -> 1x1 expand with additive skips down to a
  32-channel full-res map; head kernel 1.
- DeepLabV3 (decoders/deeplabv3/decoder.py DeepLabV3Decoder): dilated
  encoder (output stride 8), plain-conv ASPP (rates 12/24/36) + pooling
  branch + projection, 3x3 Conv+BN+ReLU; head kernel 1, 8x align-corners
  upsample.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from flairtpu.models.deeplab import _ConvBnRelu, upsample_align_corners
from flairtpu.models.resnet import batch_norm, conv
from flairtpu.models.unet import upsample2x_nearest

_GN_EPS = 1e-5  # torch nn.GroupNorm default (flax default is 1e-6)


# ---------------------------------------------------------------------------
# FPN
# ---------------------------------------------------------------------------

class Conv3x3GNReLU(nn.Module):
    """smp Conv3x3GNReLU: conv3x3(bias=False) + GroupNorm(32) + ReLU,
    then optional 2x nearest upsample."""

    features: int
    upsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = conv(self.features, 3, dtype=self.dtype, name="conv")(x)
        x = nn.GroupNorm(num_groups=32, epsilon=_GN_EPS, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="gn")(x)
        x = nn.relu(x)
        if self.upsample:
            x = upsample2x_nearest(x)
        return x


class FPNDecoder(nn.Module):
    """smp FPNDecoder(pyramid=256, segmentation=128, merge='add')."""

    pyramid_channels: int = 256
    segmentation_channels: int = 128
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: list[jax.Array], train: bool = False):
        c2, c3, c4, c5 = feats[-4:]
        p5 = conv(self.pyramid_channels, 1, padding=0, use_bias=True,
                  dtype=self.dtype, name="p5")(c5)
        pyramid = [p5]
        for name, c in (("p4", c4), ("p3", c3), ("p2", c2)):
            lateral = conv(self.pyramid_channels, 1, padding=0, use_bias=True,
                           dtype=self.dtype, name=f"{name}_skip")(c)
            pyramid.append(upsample2x_nearest(pyramid[-1]) + lateral)
        # per-level segmentation blocks with [3, 2, 1, 0] upsamples
        merged = None
        for i, (p, n_up) in enumerate(zip(pyramid, (3, 2, 1, 0))):
            x = Conv3x3GNReLU(self.segmentation_channels, upsample=n_up > 0,
                              dtype=self.dtype, name=f"seg{i}_c0")(p)
            for j in range(1, n_up):
                x = Conv3x3GNReLU(self.segmentation_channels, upsample=True,
                                  dtype=self.dtype, name=f"seg{i}_c{j}")(x)
            merged = x if merged is None else merged + x
        # nn.Dropout2d: whole-channel dropout (broadcast over H, W)
        return nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                          deterministic=not train)(merged)


# ---------------------------------------------------------------------------
# PSPNet
# ---------------------------------------------------------------------------

@lru_cache(maxsize=64)
def _adaptive_pool_weights(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) averaging matrix with torch AdaptiveAvgPool semantics:
    bin i covers [floor(i*n/o), ceil((i+1)*n/o))."""
    w = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        lo = (i * n_in) // n_out
        hi = -(-((i + 1) * n_in) // n_out)
        w[i, lo:hi] = 1.0 / (hi - lo)
    return w


def adaptive_avg_pool(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """torch nn.AdaptiveAvgPool2d on (B, H, W, C)."""
    B, H, W, C = x.shape
    wh = jnp.asarray(_adaptive_pool_weights(out_hw[0], H), x.dtype)
    ww = jnp.asarray(_adaptive_pool_weights(out_hw[1], W), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", wh, x)
    return jnp.einsum("pw,bowc->bopc", ww, y)


class PSPDecoder(nn.Module):
    """smp PSPDecoder(sizes=(1,2,3,6), out_channels=512) on the deepest
    (encoder-depth-3, stride-8) feature."""

    sizes: Sequence[int] = (1, 2, 3, 6)
    out_channels: int = 512
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: list[jax.Array], train: bool = False):
        x = feats[-1]
        B, H, W, C = x.shape
        branch_ch = C // len(self.sizes)
        branches = []
        for i, size in enumerate(self.sizes):
            b = adaptive_avg_pool(x, (size, size))
            b = _ConvBnRelu(branch_ch, 1, self.dtype,
                            name=f"psp_block{i}")(b, train)
            branches.append(upsample_align_corners(b, (H, W)))
        y = jnp.concatenate(branches + [x.astype(branches[0].dtype)], axis=-1)
        y = _ConvBnRelu(self.out_channels, 1, self.dtype, name="conv")(y, train)
        return nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                          deterministic=not train)(y)


# ---------------------------------------------------------------------------
# LinkNet
# ---------------------------------------------------------------------------

class TorchConvTranspose(nn.Module):
    """torch nn.ConvTranspose2d(k=4, s=2, p=1) equivalent (exact 2x upsample).

    Implemented as the standard dilated-input convolution: dilate the input
    by the stride, pad by k-1-p, convolve with the spatially-flipped kernel.
    The parameter is stored flax-style (kH, kW, I, O); the converter flips
    and transposes torch's (I, O, kH, kW) tensor accordingly.
    """

    features: int
    kernel: int = 4
    stride: int = 2
    padding: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_in = x.shape[-1]
        k = self.kernel
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, c_in, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        pad = k - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b.astype(y.dtype)


class LinknetBlock(nn.Module):
    """smp linknet DecoderBlock: 1x1 reduce -> TransposeX2 -> 1x1 expand,
    additive skip."""

    features: int  # output channels
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool):
        c_in = x.shape[-1]
        x = _ConvBnRelu(c_in // 4, 1, self.dtype, name="conv_in")(x, train)
        x = TorchConvTranspose(c_in // 4, dtype=self.dtype, name="convt")(x)
        x = batch_norm(self.dtype, "convt_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        x = _ConvBnRelu(self.features, 1, self.dtype, name="conv_out")(x, train)
        if skip is not None:
            x = x + skip.astype(x.dtype)
        return x


class LinknetDecoder(nn.Module):
    """smp LinknetDecoder(prefinal_channels=32, n_blocks=5)."""

    prefinal_channels: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: list[jax.Array], train: bool = False):
        fs = feats[1:][::-1]
        x, skips = fs[0], fs[1:]
        out_channels = [f.shape[-1] for f in skips] + [self.prefinal_channels]
        for i, ch in enumerate(out_channels):
            skip = skips[i] if i < len(skips) else None
            x = LinknetBlock(ch, dtype=self.dtype, name=f"block{i}")(
                x, skip, train)
        return x


# ---------------------------------------------------------------------------
# DeepLabV3 (non-plus)
# ---------------------------------------------------------------------------

class DeepLabV3Decoder(nn.Module):
    """smp DeepLabV3Decoder: plain-conv ASPP + 3x3 Conv/BN/ReLU at os=8."""

    out_channels: int = 256
    atrous_rates: Sequence[int] = (12, 24, 36)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: list[jax.Array], train: bool = False):
        deep = feats[-1]
        B, H, W, _ = deep.shape
        branches = [_ConvBnRelu(self.out_channels, 1, self.dtype,
                                name="aspp_conv")(deep, train)]
        for i, rate in enumerate(self.atrous_rates):
            y = conv(self.out_channels, 3, dilation=rate, dtype=self.dtype,
                     name=f"aspp_atrous{i}_conv")(deep)
            y = batch_norm(self.dtype, f"aspp_atrous{i}_bn")(
                y, use_running_average=not train)
            branches.append(nn.relu(y))
        pooled = jnp.mean(deep, axis=(1, 2), keepdims=True)
        pooled = _ConvBnRelu(self.out_channels, 1, self.dtype,
                             name="aspp_pool")(pooled, train)
        branches.append(jnp.broadcast_to(
            pooled, (B, H, W, self.out_channels)).astype(branches[0].dtype))
        x = jnp.concatenate(branches, axis=-1)
        x = _ConvBnRelu(self.out_channels, 1, self.dtype,
                        name="aspp_project")(x, train)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = conv(self.out_channels, 3, dtype=self.dtype, name="out_conv")(x)
        x = batch_norm(self.dtype, "out_bn")(x, use_running_average=not train)
        return nn.relu(x)
