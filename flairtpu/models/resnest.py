"""Flax ResNeSt encoders (smp ``timm-resnest*`` family), NHWC.

smp/encoders/timm_resnest.py wraps timm's ResNet with ResNestBottleneck
blocks (Zhang et al., arXiv:2004.08955) for the reference's smp factory
(src/flair/model.py:35-41). Ported variants: resnest14d/26d/50d (deep
32-wide stem -> 64 ch), resnest101e/200e/269e (deep 64-wide stem -> 128
ch), and the radix/cardinality variants resnest50d_4s2x40d (radix 4,
cardinality 2, base width 40) and resnest50d_1s4x24d (radix 1 ->
sigmoid gate, cardinality 4, base width 24).

Numerics mirrored from timm's implementation:

- deep stem: 3x3/2 -> BN -> ReLU -> 3x3 -> BN -> ReLU -> 3x3 (to twice
  the stem width), then the outer ``bn1`` + ReLU and a 3x3/2 max pool;
- ResNestBottleneck: 1x1 -> BN -> ReLU -> SplAtConv2d(3x3) -> [avd
  AvgPool2d(3, stride, pad 1) on stride-2 blocks — the stride lives in
  the pool, not the conv] -> 1x1 -> BN -> ReLU(+shortcut);
- SplAtConv2d: grouped conv (groups = cardinality*radix, out =
  group_width*radix) -> BN -> ReLU -> radix-sum -> global pool -> fc1
  (1x1, groups=cardinality, to max(in*radix//4, 32)) -> BN -> ReLU ->
  fc2 -> rSoftMax (softmax over the radix axis per cardinality group;
  sigmoid when radix == 1) -> attention-weighted radix sum;
- avg_down shortcuts: AvgPool2d(2, stride, ceil_mode, count_include_pad
  =False) -> 1x1 conv -> BN (identity pool on the stride-1 layer1).

Dilated mode intentionally raises: smp's ``replace_strides_with_dilation``
only rewrites Conv2d strides, but ResNeSt carries every stride-2 in an
AvgPool2d (avd + avg_down), so smp's deeplabv3/pan over timm-resnest
silently keeps output stride 32 and produces wrong-sized logits — see
DEVIATIONS.md (we fail fast instead). Oracle: hand-built torch mirror
(tests/torch_ref_resnest.py) + committed key/shape manifests — timm/smp
are not installed here (caveat as tests/torch_ref.py:1-8).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from flairtpu.models.resnet import batch_norm, conv, max_pool_3x3_s2

# name -> (layers, stem_width, radix, cardinality, base_width)
RESNEST_SPECS = {
    "timm-resnest14d": ((1, 1, 1, 1), 32, 2, 1, 64),
    "timm-resnest26d": ((2, 2, 2, 2), 32, 2, 1, 64),
    "timm-resnest50d": ((3, 4, 6, 3), 32, 2, 1, 64),
    "timm-resnest101e": ((3, 4, 23, 3), 64, 2, 1, 64),
    "timm-resnest200e": ((3, 24, 36, 3), 64, 2, 1, 64),
    "timm-resnest269e": ((3, 30, 48, 8), 64, 2, 1, 64),
    "timm-resnest50d_4s2x40d": ((3, 4, 6, 3), 32, 4, 2, 40),
    "timm-resnest50d_1s4x24d": ((3, 4, 6, 3), 32, 1, 4, 24),
}


def _avg_pool(x: jax.Array, k: int, stride: int, padding: int,
              count_include_pad: bool = True) -> jax.Array:
    """torch AvgPool2d (ceil_mode=False unless padded to ceil upstream)."""
    dims, strides = (1, k, k, 1), (1, stride, stride, 1)
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    s = jax.lax.reduce_window(x, jnp.zeros((), x.dtype), jax.lax.add,
                              dims, strides, pad)
    if count_include_pad or padding == 0:
        return s / (k * k)
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    cnt = jax.lax.reduce_window(ones, jnp.zeros((), x.dtype), jax.lax.add,
                                dims, strides, pad)
    return s / cnt


class SplAtConv2d(nn.Module):
    """timm SplAtConv2d (split-attention grouped 3x3)."""

    group_width: int
    radix: int
    cardinality: int
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        gw, radix, card = self.group_width, self.radix, self.cardinality
        y = conv(gw * radix, 3, 1, padding=self.dilation,
                 dilation=self.dilation, groups=card * radix,
                 dtype=self.dtype, name="conv")(x)
        y = batch_norm(self.dtype, "bn0")(y, use_running_average=not train)
        y = nn.relu(y)
        B, H, W, _ = y.shape
        attn_in = y
        if radix > 1:
            # radix-major channel split, as timm's (B, radix, C, H, W) view
            y = y.reshape(B, H, W, radix, gw)
            attn_in = jnp.sum(y, axis=3)
        g = jnp.mean(attn_in.astype(jnp.float32), axis=(1, 2), keepdims=True)
        g = g.astype(self.dtype)
        inter = max(gw * radix // 4, 32)
        g = conv(inter, 1, padding=0, groups=card, use_bias=True,
                 dtype=self.dtype, name="fc1")(g)
        g = batch_norm(self.dtype, "bn1")(g, use_running_average=not train)
        g = nn.relu(g)
        g = conv(gw * radix, 1, padding=0, groups=card, use_bias=True,
                 dtype=self.dtype, name="fc2")(g)
        if radix > 1:
            # rSoftMax: view (B, card, radix, -1), softmax over radix,
            # flatten radix-major
            a = g.reshape(B, card, radix, gw // card)
            a = jax.nn.softmax(a.astype(jnp.float32), axis=2).astype(y.dtype)
            a = jnp.transpose(a, (0, 2, 1, 3)).reshape(B, 1, 1, radix, gw)
            return jnp.sum(y * a, axis=3)
        a = jax.nn.sigmoid(g.astype(jnp.float32)).astype(y.dtype)
        return y * a


class ResNestBottleneck(nn.Module):
    """timm ResNestBottleneck (avd_last pool carries the stride)."""

    planes: int
    stride: int = 1
    radix: int = 2
    cardinality: int = 1
    base_width: int = 64
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda n: batch_norm(self.dtype, n)
        gw = int(self.planes * (self.base_width / 64.0)) * self.cardinality
        out_ch = self.planes * 4

        if self.downsample:
            s = x
            if self.stride > 1:
                # avg_down: AvgPool2d(2, stride, ceil_mode=True,
                # count_include_pad=False); pad to the ceil grid, divide by
                # the true in-bounds counts
                ph = (-s.shape[1]) % self.stride
                pw = (-s.shape[2]) % self.stride
                if ph or pw:
                    ones = jnp.ones((1, s.shape[1], s.shape[2], 1), s.dtype)
                    padding = ((0, 0), (0, ph), (0, pw), (0, 0))
                    s = jnp.pad(s, padding)
                    ones = jnp.pad(ones, padding)
                    dims = (1, 2, 2, 1)
                    strd = (1, self.stride, self.stride, 1)
                    s = jax.lax.reduce_window(
                        s, jnp.zeros((), s.dtype), jax.lax.add, dims, strd,
                        "VALID")
                    cnt = jax.lax.reduce_window(
                        ones, jnp.zeros((), s.dtype), jax.lax.add, dims,
                        strd, "VALID")
                    s = s / cnt
                else:
                    s = _avg_pool(s, 2, self.stride, 0)
            s = conv(out_ch, 1, 1, padding=0, dtype=self.dtype,
                     name="downsample_conv")(s)
            shortcut = bn("downsample_bn")(s, use_running_average=not train)
        else:
            shortcut = x

        y = conv(gw, 1, 1, padding=0, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(bn("bn1")(y, use_running_average=not train))
        y = SplAtConv2d(gw, self.radix, self.cardinality, dtype=self.dtype,
                        name="conv2")(y, train)
        if self.stride > 1:
            # avd_last: the block's stride lives in this pool
            y = _avg_pool(y, 3, self.stride, 1)
        y = conv(out_ch, 1, 1, padding=0, dtype=self.dtype, name="conv3")(y)
        y = bn("bn3")(y, use_running_average=not train)
        return nn.relu(y + shortcut)


class ResNestEncoder(nn.Module):
    """smp TimmResNestEncoder: 6 pyramid features at resnet-style taps."""

    name_spec: str = "timm-resnest50d"
    output_stride: int = 32
    depth: int = 5
    remat: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> tuple[int, ...]:
        _, sw, *_ = RESNEST_SPECS[self.name_spec]
        return ((3, sw * 2) + (256, 512, 1024, 2048))[: self.depth + 1]

    @nn.compact
    def __call__(self, x, train: bool = False) -> list[jax.Array]:
        if self.output_stride != 32:
            raise ValueError(
                "ResNeSt encoders cannot be dilated: every stride-2 lives "
                "in an AvgPool2d (avd/avg_down) that smp's "
                "replace_strides_with_dilation does not rewrite, so smp "
                "silently produces stride-32 features for deeplabv3/pan — "
                "flairtpu fails fast instead (DEVIATIONS.md)")
        layers, sw, radix, card, bw = RESNEST_SPECS[self.name_spec]
        block_cls = (nn.remat(ResNestBottleneck, static_argnums=(2,))
                     if self.remat else ResNestBottleneck)

        feats = [x]
        y = x.astype(self.dtype)
        # deep stem: conv1.{0,1,3,4,6} Sequential + the outer bn1
        y = conv(sw, 3, 2, padding=1, dtype=self.dtype, name="conv1_0")(y)
        y = nn.relu(batch_norm(self.dtype, "conv1_1")(
            y, use_running_average=not train))
        y = conv(sw, 3, 1, padding=1, dtype=self.dtype, name="conv1_3")(y)
        y = nn.relu(batch_norm(self.dtype, "conv1_4")(
            y, use_running_average=not train))
        y = conv(sw * 2, 3, 1, padding=1, dtype=self.dtype, name="conv1_6")(y)
        y = nn.relu(batch_norm(self.dtype, "bn1")(
            y, use_running_average=not train))
        feats.append(y)  # stride 2

        if self.depth >= 2:
            y = max_pool_3x3_s2(y)
            in_ch = sw * 2
            for s, n in enumerate(layers):
                if self.depth < s + 2:
                    break
                planes = 64 * (2 ** s)
                stride = 1 if s == 0 else 2
                for i in range(n):
                    y = block_cls(
                        planes, stride=stride if i == 0 else 1, radix=radix,
                        cardinality=card, base_width=bw,
                        downsample=(i == 0 and (stride != 1
                                                or in_ch != planes * 4)),
                        dtype=self.dtype, name=f"layer{s + 1}_{i}")(y, train)
                in_ch = planes * 4
                feats.append(y)
        return feats
