"""Flax Res2Net encoders (smp ``timm-res2net*``/``timm-res2next50``), NHWC.

smp/encoders/timm_res2net.py wraps timm's ResNet with Bottle2neck blocks
(Gao et al., arXiv:1904.01169) for the reference's smp factory
(src/flair/model.py:35-41). Ported variants: res2net50_26w_4s/_26w_6s/
_26w_8s/_48w_2s/_14w_8s, res2net101_26w_4s, and res2next50 (base width 4,
cardinality 8, scale 4).

Numerics mirrored from timm's Bottle2neck:

- 1x1 -> BN -> ReLU, split into ``scale`` groups of ``width`` channels;
- hierarchical 3x3 branch: num_scales = scale-1 convs; branch i input is
  ``spx[i]`` on the block's first conv or when ``is_first`` (stride-2 or
  downsample block), else ``sp + spx[i]``; each conv -> BN -> ReLU;
- the last split passes through untouched (or an AvgPool2d(3, stride,
  pad 1) on is_first blocks — note layer1's first block has is_first via
  its downsample but stride 1, so the pool is a stride-1 blur);
- concat -> 1x1 -> BN -> ReLU(+shortcut); standard 7x7/2 stem and
  conv1x1-stride downsample shortcuts (no avg_down).

Dilated mode raises at config time: smp's replace_strides_with_dilation
rewrites the 3x3 strides but not the is_first AvgPool2d, so the dilated
stage's first block concatenates mismatched spatial dims and smp crashes
inside torch.cat (DEVIATIONS.md #16 family). Oracle: hand-built torch
mirror (tests/torch_ref_res2net.py) + committed key/shape manifests —
timm/smp are not installed here (caveat as tests/torch_ref.py:1-8).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from flairtpu.models.resnest import _avg_pool
from flairtpu.models.resnet import batch_norm, conv, max_pool_3x3_s2

# name -> (layers, base_width, scale, cardinality)
RES2NET_SPECS = {
    "timm-res2net50_26w_4s": ((3, 4, 6, 3), 26, 4, 1),
    "timm-res2net101_26w_4s": ((3, 4, 23, 3), 26, 4, 1),
    "timm-res2net50_26w_6s": ((3, 4, 6, 3), 26, 6, 1),
    "timm-res2net50_26w_8s": ((3, 4, 6, 3), 26, 8, 1),
    "timm-res2net50_48w_2s": ((3, 4, 6, 3), 48, 2, 1),
    "timm-res2net50_14w_8s": ((3, 4, 6, 3), 14, 8, 1),
    "timm-res2next50": ((3, 4, 6, 3), 4, 4, 8),
}


class Bottle2neck(nn.Module):
    """timm Bottle2neck (hierarchical multi-scale residual block)."""

    planes: int
    stride: int = 1
    base_width: int = 26
    scale: int = 4
    cardinality: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda n: batch_norm(self.dtype, n)
        width = int(math.floor(
            self.planes * (self.base_width / 64.0))) * self.cardinality
        out_ch = self.planes * 4
        is_first = self.stride > 1 or self.downsample

        if self.downsample:
            s = conv(out_ch, 1, self.stride, padding=0, dtype=self.dtype,
                     name="downsample_conv")(x)
            shortcut = bn("downsample_bn")(s, use_running_average=not train)
        else:
            shortcut = x

        y = conv(width * self.scale, 1, 1, padding=0, dtype=self.dtype,
                 name="conv1")(x)
        y = nn.relu(bn("bn1")(y, use_running_average=not train))
        spx = [y[..., i * width:(i + 1) * width] for i in range(self.scale)]
        spo = []
        sp = spx[0]
        for i in range(max(1, self.scale - 1)):
            sp = spx[i] if (i == 0 or is_first) else sp + spx[i]
            sp = conv(width, 3, self.stride, padding=1,
                      groups=self.cardinality, dtype=self.dtype,
                      name=f"convs_{i}")(sp)
            sp = nn.relu(bn(f"bns_{i}")(sp, use_running_average=not train))
            spo.append(sp)
        if self.scale > 1:
            spo.append(_avg_pool(spx[-1], 3, self.stride, 1)
                       if is_first else spx[-1])
        y = jnp.concatenate(spo, axis=-1)
        y = conv(out_ch, 1, 1, padding=0, dtype=self.dtype, name="conv3")(y)
        y = bn("bn3")(y, use_running_average=not train)
        return nn.relu(y + shortcut)


class Res2NetEncoder(nn.Module):
    """smp TimmRes2NetEncoder: 6 pyramid features at resnet-style taps."""

    name_spec: str = "timm-res2net50_26w_4s"
    output_stride: int = 32
    depth: int = 5
    remat: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> tuple[int, ...]:
        return (3, 64, 256, 512, 1024, 2048)[: self.depth + 1]

    @nn.compact
    def __call__(self, x, train: bool = False) -> list[jax.Array]:
        if self.output_stride != 32:
            raise ValueError(
                "Res2Net encoders cannot be dilated: the is_first blocks' "
                "AvgPool2d keeps its stride under smp's "
                "replace_strides_with_dilation and smp crashes in "
                "torch.cat — flairtpu fails fast instead (DEVIATIONS.md)")
        layers, bw, scale, card = RES2NET_SPECS[self.name_spec]
        block_cls = (nn.remat(Bottle2neck, static_argnums=(2,))
                     if self.remat else Bottle2neck)

        feats = [x]
        y = conv(64, 7, 2, padding=3, dtype=self.dtype, name="conv1")(
            x.astype(self.dtype))
        y = nn.relu(batch_norm(self.dtype, "bn1")(
            y, use_running_average=not train))
        feats.append(y)  # stride 2

        if self.depth >= 2:
            y = max_pool_3x3_s2(y)
            in_ch = 64
            for s, n in enumerate(layers):
                if self.depth < s + 2:
                    break
                planes = 64 * (2 ** s)
                stride = 1 if s == 0 else 2
                for i in range(n):
                    y = block_cls(
                        planes, stride=stride if i == 0 else 1,
                        base_width=bw, scale=scale, cardinality=card,
                        downsample=(i == 0 and (stride != 1
                                                or in_ch != planes * 4)),
                        dtype=self.dtype, name=f"layer{s + 1}_{i}")(y, train)
                in_ch = planes * 4
                feats.append(y)
        return feats
