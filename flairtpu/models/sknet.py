"""Flax SKNet encoders (smp ``timm-skresnet18/34``, ``timm-skresnext50_32x4d``),
NHWC.

smp/encoders/timm_sknet.py wraps timm's ResNet with Selective-Kernel blocks
(Li et al., arXiv:1903.06586) for the reference's smp factory
(src/flair/model.py:35-41).

Numerics mirrored from timm's selective_kernel.py / sknet.py:

- SelectiveKernel: two 3x3 paths (keep_3x3: the nominal [3, 5] kernels
  become dilation [1, 2] 3x3s), each a ConvNormAct (conv/bn/relu);
  skresnet18/34 split the INPUT channels across the paths
  (``split_input=True``), skresnext50 feeds both paths the full input;
- attention: sum paths -> global mean -> fc_reduce (1x1, bias-free, to
  make_divisible(out * rd_ratio, rd_divisor): ratio 1/8 divisor 16 for
  the basic blocks, 1/16 divisor 32 for skresnext) -> BN -> ReLU ->
  fc_select (1x1 to out*2, bias-free) -> softmax over the path axis ->
  weighted path sum;
- SelectiveKernelBasic: conv1 = SK(stride), conv2 = ConvNormAct 3x3
  (no act), relu(+shortcut); SelectiveKernelBottleneck: 1x1 ConvNormAct
  -> SK(stride, groups=cardinality) -> 1x1 ConvNormAct (no act);
- standard 7x7/2 stem, maxpool, conv1x1-stride downsample.

Dilated mode (deeplabv3/pan) follows smp's default make_dilated: SK path
convs get the stage dilation with stride 1 (the strides live in convs, so
smp's rewrite is sound here). Oracle: hand-built torch mirror
(tests/torch_ref_sknet.py) + committed key/shape manifests — timm/smp are
not installed here (caveat as tests/torch_ref.py:1-8).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from flairtpu.models.efficientnet import round_filters
from flairtpu.models.resnet import batch_norm, conv, max_pool_3x3_s2

# name -> (block, layers, cardinality, base_width, rd_ratio, rd_divisor,
#          split_input)
SKNET_SPECS = {
    "timm-skresnet18": ("basic", (2, 2, 2, 2), 1, 64, 1 / 8, 16, True),
    "timm-skresnet34": ("basic", (3, 4, 6, 3), 1, 64, 1 / 8, 16, True),
    "timm-skresnext50_32x4d": ("bottleneck", (3, 4, 6, 3), 32, 4,
                               1 / 16, 32, False),
}


def _make_divisible(v: float, divisor: int) -> int:
    return round_filters(v, 1.0, divisor=divisor)


class ConvNorm(nn.Module):
    """timm ConvNormAct: conv (name 'conv') + BN (name 'bn') [+ ReLU]."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        pad = (self.kernel // 2) * self.dilation
        y = conv(self.features, self.kernel, self.stride, padding=pad,
                 dilation=self.dilation, groups=self.groups,
                 dtype=self.dtype, name="conv")(x)
        y = batch_norm(self.dtype, "bn")(y, use_running_average=not train)
        return nn.relu(y) if self.act else y


class SKAttn(nn.Module):
    """timm SelectiveKernelAttn (fc_reduce/bn/fc_select, bias-free)."""

    features: int
    attn_ch: int
    n_paths: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, g, train: bool):
        g = conv(self.attn_ch, 1, padding=0, dtype=self.dtype,
                 name="fc_reduce")(g)
        g = batch_norm(self.dtype, "bn")(g, use_running_average=not train)
        g = nn.relu(g)
        return conv(self.features * self.n_paths, 1, padding=0,
                    dtype=self.dtype, name="fc_select")(g)


class SelectiveKernel(nn.Module):
    """timm SelectiveKernel: two dilated-3x3 paths + softmax attention."""

    features: int
    stride: int = 1
    groups: int = 1
    dilation: int = 1  # stage dilation (smp make_dilated overwrite)
    rd_ratio: float = 1 / 16
    rd_divisor: int = 32
    split_input: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        n_paths = 2
        if self.split_input:
            half = x.shape[-1] // n_paths
            inputs = [x[..., :half], x[..., half:]]
        else:
            inputs = [x, x]
        paths = []
        for i, (xi, d) in enumerate(zip(inputs, (1, 2))):
            # smp's replace_strides_with_dilation OVERWRITES conv dilation
            # (does not compose), so a dilated stage loses the path-2
            # receptive-field split — reproduced faithfully
            if self.dilation > 1:
                d = self.dilation
            paths.append(ConvNorm(
                self.features, 3, self.stride, dilation=d,
                groups=min(self.features, self.groups), dtype=self.dtype,
                name=f"paths_{i}")(xi, train))
        stacked = jnp.stack(paths, axis=-2)  # (B, H, W, paths, C)
        g = jnp.mean(jnp.sum(stacked, axis=-2).astype(jnp.float32),
                     axis=(1, 2), keepdims=True).astype(self.dtype)
        attn_ch = _make_divisible(self.features * self.rd_ratio,
                                  self.rd_divisor)
        g = SKAttn(self.features, attn_ch, dtype=self.dtype,
                   name="attn")(g, train)
        # torch view (B, paths, C, 1, 1): path-major channel split
        a = g.reshape(g.shape[0], 1, 1, n_paths, self.features)
        a = jax.nn.softmax(a.astype(jnp.float32), axis=-2).astype(
            stacked.dtype)
        return jnp.sum(stacked * a, axis=-2)


class SKBlock(nn.Module):
    """timm SelectiveKernelBasic / SelectiveKernelBottleneck."""

    kind: str  # 'basic' | 'bottleneck'
    planes: int
    stride: int = 1
    dilation: int = 1
    cardinality: int = 1
    base_width: int = 64
    rd_ratio: float = 1 / 16
    rd_divisor: int = 32
    split_input: bool = True
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda n: batch_norm(self.dtype, n)
        sk = lambda feats, groups, name: SelectiveKernel(
            feats, stride=self.stride, groups=groups, dilation=self.dilation,
            rd_ratio=self.rd_ratio, rd_divisor=self.rd_divisor,
            split_input=self.split_input, dtype=self.dtype, name=name)
        out_ch = self.planes * (1 if self.kind == "basic" else 4)

        if self.downsample:
            s = conv(out_ch, 1, self.stride, padding=0, dtype=self.dtype,
                     name="downsample_conv")(x)
            shortcut = bn("downsample_bn")(s, use_running_average=not train)
        else:
            shortcut = x

        if self.kind == "basic":
            y = sk(self.planes, 1, "conv1")(x, train)
            y = ConvNorm(self.planes, 3, 1, dilation=self.dilation,
                         act=False, dtype=self.dtype, name="conv2")(y, train)
        else:
            width = int(self.planes * (self.base_width / 64.0)) * \
                self.cardinality
            y = ConvNorm(width, 1, dtype=self.dtype, name="conv1")(x, train)
            y = sk(width, self.cardinality, "conv2")(y, train)
            y = ConvNorm(out_ch, 1, act=False, dtype=self.dtype,
                         name="conv3")(y, train)
        return nn.relu(y + shortcut)


class SKNetEncoder(nn.Module):
    """smp TimmSkNetEncoder: 6 pyramid features at resnet-style taps."""

    name_spec: str = "timm-skresnet18"
    output_stride: int = 32
    depth: int = 5
    remat: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> tuple[int, ...]:
        kind = SKNET_SPECS[self.name_spec][0]
        e = 1 if kind == "basic" else 4
        return (3, 64, 64 * e, 128 * e, 256 * e, 512 * e)[: self.depth + 1]

    @nn.compact
    def __call__(self, x, train: bool = False) -> list[jax.Array]:
        kind, layers, card, bw, rd_ratio, rd_div, split = \
            SKNET_SPECS[self.name_spec]
        # smp default make_dilated: os16 dilates stage 4, os8 stages 3+4
        dil = {32: (1, 1), 16: (1, 2), 8: (2, 4)}[self.output_stride]
        stage_dil = {0: 1, 1: 1, 2: dil[0], 3: dil[1]}
        block_cls = (nn.remat(SKBlock, static_argnums=(2,))
                     if self.remat else SKBlock)

        feats = [x]
        y = conv(64, 7, 2, padding=3, dtype=self.dtype, name="conv1")(
            x.astype(self.dtype))
        y = nn.relu(batch_norm(self.dtype, "bn1")(
            y, use_running_average=not train))
        feats.append(y)  # stride 2

        if self.depth >= 2:
            y = max_pool_3x3_s2(y)
            e = 1 if kind == "basic" else 4
            in_ch = 64
            for s, n in enumerate(layers):
                if self.depth < s + 2:
                    break
                planes = 64 * (2 ** s)
                d = stage_dil[s]
                stride = 1 if (s == 0 or d > 1) else 2
                for i in range(n):
                    y = block_cls(
                        kind, planes, stride=stride if i == 0 else 1,
                        dilation=d, cardinality=card, base_width=bw,
                        rd_ratio=rd_ratio, rd_divisor=rd_div,
                        split_input=split,
                        downsample=(i == 0 and (s != 0
                                                or in_ch != planes * e)),
                        dtype=self.dtype, name=f"layer{s + 1}_{i}")(y, train)
                in_ch = planes * e
                feats.append(y)
        return feats
