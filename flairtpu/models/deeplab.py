"""Flax DeepLabV3+ decoder (smp 0.3.3 topology) for the smp provider.

The reference's smp provider accepts any architecture string
(``smp.create_model(arch, encoder_name, ...)``, reference
src/flair/model.py:35-41); ``<encoder>_deeplabv3plus`` is the most-used
alternative to unet. Mirrors segmentation_models_pytorch
``decoders/deeplabv3/decoder.py`` exactly:

- encoder runs with output_stride 16 (layer4 stride->1, 3x3 dilation 2 —
  smp make_dilated semantics, see models/resnet.py);
- ASPP over the deepest feature: 1x1 conv + three separable atrous convs
  (rates 12/24/36) + global-pool branch, concat -> 1x1 project + Dropout(0.5);
- a separable 3x3 + BN + ReLU, then 4x bilinear upsample with
  ``align_corners=True`` (torch nn.UpsamplingBilinear2d);
- skip branch: 1x1 conv to 48 channels on the stride-4 feature, concat,
  separable 3x3 fuse to 256;
- segmentation head: 1x1 conv + 4x align-corners upsample
  (smp DeepLabV3Plus SegmentationHead(kernel_size=1, upsampling=4)).

The torch parity oracle is tests/torch_ref.py::DeepLabV3Plus.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from flairtpu.models.resnet import batch_norm, conv

ATROUS_RATES = (12, 24, 36)
OUT_CHANNELS = 256
HIGHRES_CHANNELS = 48


@lru_cache(maxsize=32)
def _align_corners_weights(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) bilinear matrix with torch align_corners=True sampling."""
    w = np.zeros((n_out, n_in), np.float32)
    if n_in == 1 or n_out == 1:
        w[:, 0] = 1.0
        return w
    src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.clip(np.floor(src).astype(np.int64), 0, n_in - 1)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (src - lo).astype(np.float32)
    w[np.arange(n_out), lo] += 1.0 - frac
    w[np.arange(n_out), hi] += frac
    return w


def upsample_align_corners(x: jax.Array, hw: tuple[int, int]) -> jax.Array:
    """torch nn.UpsamplingBilinear2d equivalent on (B, H, W, C).

    Deliberately a dense (n_out, n_in) weight-matrix einsum, NOT a two-tap
    gather+lerp: bilinear has <=2 taps per output pixel so the matmul does
    ~n_in/2-fold redundant MACs, but on TPU those ride the MXU while
    gathers crawl on the VPU — the lerp variant MEASURED 2.4x SLOWER in
    the full deeplabv3plus zone forward (689 vs 1659 patches/s, batch 128;
    PERFORMANCE.md round-5 "two-tap lerp upsample").
    """
    B, H, W, C = x.shape
    wh = jnp.asarray(_align_corners_weights(hw[0], H), x.dtype)
    ww = jnp.asarray(_align_corners_weights(hw[1], W), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", wh, x)
    return jnp.einsum("pw,bowc->bopc", ww, y)


def upsample_align_corners_window(x: jax.Array, hw: tuple[int, int],
                                  lo: int, hi: int) -> jax.Array:
    """Rows/cols ``[lo, hi)`` of ``upsample_align_corners(x, hw)``.

    The zone exact-clipping path only keeps the margin-cropped interior of
    the head upsample; subsetting the SAME align-corners weight-matrix rows
    computes exactly those output pixels without materializing the
    (B, S, S, K) map — the strided-head analog of the unet plan_inner_crops
    fast path. Each output element is the same dot product over the same
    inputs, but XLA may tile the smaller matmul differently, so agreement
    with full-upsample + crop is within reduction-order rounding (~1 ulp),
    not guaranteed bit-exact — bounds are test-enforced
    (tests/test_models.py, tests/test_zone_smp_archs.py).
    """
    B, H, W, C = x.shape
    wh = jnp.asarray(_align_corners_weights(hw[0], H)[lo:hi], x.dtype)
    ww = jnp.asarray(_align_corners_weights(hw[1], W)[lo:hi], x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", wh, x)
    return jnp.einsum("pw,bowc->bopc", ww, y)


class SeparableConv(nn.Module):
    """smp SeparableConv2d: depthwise (bias-free) + 1x1 pointwise (bias)."""

    features: int
    kernel: int = 3
    dilation: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_in = x.shape[-1]
        x = conv(c_in, self.kernel, dilation=self.dilation, groups=c_in,
                 dtype=self.dtype, name="dw")(x)
        return conv(self.features, 1, padding=0, use_bias=self.use_bias,
                    dtype=self.dtype, name="pw")(x)


class _ConvBnRelu(nn.Module):
    features: int
    kernel: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = conv(self.features, self.kernel, dtype=self.dtype, name="conv")(x)
        x = batch_norm(self.dtype, "bn")(x, use_running_average=not train)
        return nn.relu(x)


class _SepBnRelu(nn.Module):
    features: int
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = SeparableConv(self.features, 3, self.dilation, use_bias=False,
                          dtype=self.dtype, name="sep")(x)
        x = batch_norm(self.dtype, "bn")(x, use_running_average=not train)
        return nn.relu(x)


class DeepLabV3PlusDecoder(nn.Module):
    """smp DeepLabV3PlusDecoder(out_channels=256, rates=(12,24,36), os=16)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: list[jax.Array], train: bool = False):
        deep = feats[-1]            # stride 16 (dilated layer4)
        high = feats[-4]            # stride 4 (layer1)
        H16, W16 = deep.shape[1:3]

        # ASPP branches
        branches = [_ConvBnRelu(OUT_CHANNELS, 1, self.dtype,
                                name="aspp_conv")(deep, train)]
        for i, rate in enumerate(ATROUS_RATES):
            branches.append(_SepBnRelu(OUT_CHANNELS, rate, self.dtype,
                                       name=f"aspp_sep{i}")(deep, train))
        pooled = jnp.mean(deep, axis=(1, 2), keepdims=True)
        pooled = _ConvBnRelu(OUT_CHANNELS, 1, self.dtype,
                             name="aspp_pool")(pooled, train)
        branches.append(jnp.broadcast_to(pooled,
                                         (deep.shape[0], H16, W16, OUT_CHANNELS)))
        x = jnp.concatenate(branches, axis=-1)
        x = _ConvBnRelu(OUT_CHANNELS, 1, self.dtype, name="aspp_project")(x, train)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = _SepBnRelu(OUT_CHANNELS, 1, self.dtype, name="aspp_out")(x, train)
        x = upsample_align_corners(x, (4 * H16, 4 * W16))

        skip = _ConvBnRelu(HIGHRES_CHANNELS, 1, self.dtype, name="block1")(
            high, train)
        x = jnp.concatenate([x, skip], axis=-1)
        return _SepBnRelu(OUT_CHANNELS, 1, self.dtype, name="block2")(x, train)
