"""Flax Xception encoder (pretrainedmodels topology), NHWC, TPU-friendly.

smp/encoders/xception.py wraps pretrainedmodels' Xception (Chollet,
arXiv:1610.02357) for the reference's smp provider
(src/flair/model.py:35-41), tapping 6 pyramid features via get_stages():

- stage 1: conv1(3x3/s2)-bn-relu-conv2(3x3)-bn-relu (stride 2, 64 ch) —
  smp patches both convs' padding from pretrainedmodels' 0 to 1 so output
  shapes stay power-of-two (smp/encoders/xception.py __init__),
- stage 2: block1 (stride 4, 128 ch),
- stage 3: block2 (stride 8, 256 ch),
- stage 4: block3 + the eight stride-1 middle blocks 4-11 (stride 16,
  728 ch),
- stage 5: block12 + separable conv3(1536)-bn3-relu-conv4(2048)-bn4, no
  trailing relu (stride 32, 2048 ch).

Each Block is a residual stack of [relu ->] SeparableConv2d(3x3 depthwise
+ 1x1 pointwise, both bias-free) -> BN repeated ``reps`` times, with a
trailing MaxPool2d(3, stride, padding=1) when strided and a 1x1/stride
conv+BN skip when shape changes; block1 drops the leading relu
(start_with_relu=False) and block12 grows channels on the LAST separable
(grow_first=False).

Flax submodules are named by the torch ``rep`` Sequential indices
(``rep{j}_dw``/``rep{j}_pw``/``rep{j}_bn``) so the checkpoint converter
is a pure rename (models/convert.py).

``make_dilated`` raises in smp (max-pool downsampling), so deeplabv3,
deeplabv3plus and pan reject xception (registry.check_smp). Oracle:
hand-built torch mirror (tests/torch_ref_ptm.py) + committed key/shape
manifest — pretrainedmodels/smp are not installed here (caveat as
tests/torch_ref.py:1-8).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from flairtpu.models.resnet import batch_norm, conv, max_pool_3x3_s2


def xception_rep_layout(in_f: int, out_f: int, reps: int,
                        start_with_relu: bool, grow_first: bool):
    """The torch Block.rep Sequential layout: list of ('relu',) |
    ('sep', cin, cout) | ('bn', ch), indexable by Sequential position."""
    entries: list[tuple] = []
    filters = in_f
    if grow_first:
        entries += [("relu",), ("sep", in_f, out_f), ("bn", out_f)]
        filters = out_f
    for _ in range(reps - 1):
        entries += [("relu",), ("sep", filters, filters), ("bn", filters)]
    if not grow_first:
        entries += [("relu",), ("sep", in_f, out_f), ("bn", out_f)]
    if not start_with_relu:
        entries = entries[1:]
    return entries


class XceptionBlock(nn.Module):
    """pretrainedmodels xception Block (residual separable-conv stack)."""

    in_f: int
    out_f: int
    reps: int
    stride: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = x
        for j, e in enumerate(xception_rep_layout(
                self.in_f, self.out_f, self.reps, self.start_with_relu,
                self.grow_first)):
            if e[0] == "relu":
                y = nn.relu(y)
            elif e[0] == "sep":
                cin, cout = e[1], e[2]
                y = conv(cin, 3, 1, groups=cin, dtype=self.dtype,
                         name=f"rep{j}_dw")(y)
                y = conv(cout, 1, padding=0, dtype=self.dtype,
                         name=f"rep{j}_pw")(y)
            else:
                y = batch_norm(self.dtype, f"rep{j}_bn")(
                    y, use_running_average=not train)
        if self.stride != 1:
            y = max_pool_3x3_s2(y)
        if self.out_f != self.in_f or self.stride != 1:
            skip = conv(self.out_f, 1, self.stride, padding=0,
                        dtype=self.dtype, name="skip")(x)
            skip = batch_norm(self.dtype, "skipbn")(
                skip, use_running_average=not train)
        else:
            skip = x
        return y + skip  # no relu after the residual add


class XceptionEncoder(nn.Module):
    """smp XceptionEncoder: 6 pyramid features at pretrainedmodels taps."""

    output_stride: int = 32
    depth: int = 5
    remat: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> tuple[int, ...]:
        return (0, 64, 128, 256, 728, 2048)

    @nn.compact
    def __call__(self, x, train: bool = False) -> list[jax.Array]:
        if self.output_stride != 32:
            # smp XceptionEncoder.make_dilated (encoders/xception.py)
            raise ValueError(
                "Xception encoder does not support dilated mode due to "
                "pooling operation for downsampling!")
        block_cls = (nn.remat(XceptionBlock, static_argnums=(2,))
                     if self.remat else XceptionBlock)

        features = [x]
        y = conv(32, 3, 2, padding=1, dtype=self.dtype, name="conv1")(
            x.astype(self.dtype))
        y = batch_norm(self.dtype, "bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = conv(64, 3, 1, padding=1, dtype=self.dtype, name="conv2")(y)
        y = batch_norm(self.dtype, "bn2")(y, use_running_average=not train)
        y = nn.relu(y)
        features.append(y)  # stride 2

        if self.depth >= 2:
            y = block_cls(64, 128, 2, 2, start_with_relu=False,
                          dtype=self.dtype, name="block1")(y, train)
            features.append(y)  # stride 4
        if self.depth >= 3:
            y = block_cls(128, 256, 2, 2, dtype=self.dtype,
                          name="block2")(y, train)
            features.append(y)  # stride 8
        if self.depth >= 4:
            y = block_cls(256, 728, 2, 2, dtype=self.dtype,
                          name="block3")(y, train)
            for i in range(4, 12):  # middle flow: 8 stride-1 blocks
                y = block_cls(728, 728, 3, 1, dtype=self.dtype,
                              name=f"block{i}")(y, train)
            features.append(y)  # stride 16
        if self.depth >= 5:
            y = block_cls(728, 1024, 2, 2, grow_first=False,
                          dtype=self.dtype, name="block12")(y, train)
            y = conv(1024, 3, 1, groups=1024, dtype=self.dtype,
                     name="conv3_dw")(y)
            y = conv(1536, 1, padding=0, dtype=self.dtype, name="conv3_pw")(y)
            y = batch_norm(self.dtype, "bn3")(y, use_running_average=not train)
            y = nn.relu(y)
            y = conv(1536, 3, 1, groups=1536, dtype=self.dtype,
                     name="conv4_dw")(y)
            y = conv(2048, 1, padding=0, dtype=self.dtype, name="conv4_pw")(y)
            y = batch_norm(self.dtype, "bn4")(y, use_running_average=not train)
            features.append(y)  # stride 32, no trailing relu (smp stage 5)
        return features
