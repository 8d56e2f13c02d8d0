"""Flax MobileOne encoders (smp ``mobileone_s0..s4``), NHWC.

smp 0.3.3 vendors Apple's MobileOne (Vasu et al., arXiv:2206.04040) as a
native encoder family (smp/encoders/mobileone.py) for the reference's smp
factory (src/flair/model.py:35-41). This port reproduces the TRAINING-mode
(unfused) topology — the over-parameterized branch form that smp
checkpoints store:

- MobileOneBlock = sum of ``num_conv_branches`` k×k ConvBN branches
  (``rbr_conv.{j}``), plus a 1x1 ConvBN scale branch (``rbr_scale``, only
  when k > 1), plus a bare-BN skip branch (``rbr_skip``, only when
  in==out and stride==1), then optional SE (reduce/expand biased 1x1s,
  rd_ratio 1/16) and ReLU;
- stage0: one 3x3/2 block to min(64, 64*w0) channels; stages 1-4 are
  sequences of depthwise(3x3, groups=in) + pointwise(1x1) block PAIRS,
  first pair strided 2, channel plan int([64,128,256,512] * w1..w4);
- variants: s0 (w 0.75/1.0/1.0/2.0, 4 branches), s1 (1.5/1.5/2.0/2.5),
  s2 (1.5/2.0/2.5/4.0), s3 (2.0/2.5/3.0/4.0), s4 (3.0/3.5/3.5/4.0 + SE on
  the last 5 blocks of stage3 and all of stage4);
- smp pyramid: (3, stage0, stage1..stage4) at strides (1, 2, 4, 8, 16, 32).

Dilated mode (deeplabv3/pan) follows smp's default make_dilated (strides
live in convs; skip-branch existence keeps the ORIGINAL stride rule, as a
mutated torch model does). Oracle: hand-built torch mirror
(tests/torch_ref_mobileone.py) + committed key/shape manifests — smp is
not installed here (caveat as tests/torch_ref.py:1-8); the fused
(reparameterized) parameter totals additionally match the paper's
published model sizes (tests/test_mobileone.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from flairtpu.models.resnet import batch_norm, conv
from flairtpu.models.sknet import ConvNorm

# name -> (width_multipliers, num_conv_branches, use_se)
MOBILEONE_SPECS = {
    "mobileone_s0": ((0.75, 1.0, 1.0, 2.0), 4, False),
    "mobileone_s1": ((1.5, 1.5, 2.0, 2.5), 1, False),
    "mobileone_s2": ((1.5, 2.0, 2.5, 4.0), 1, False),
    "mobileone_s3": ((2.0, 2.5, 3.0, 4.0), 1, False),
    "mobileone_s4": ((3.0, 3.5, 3.5, 4.0), 1, True),
}
_BASE_PLANES = (64, 128, 256, 512)
_NUM_BLOCKS = (2, 8, 10, 1)


def mobileone_out_channels(name: str) -> tuple[int, ...]:
    w, _, _ = MOBILEONE_SPECS[name]
    return (3, min(64, int(64 * w[0]))) + tuple(
        int(p * wi) for p, wi in zip(_BASE_PLANES, w))


class MobileOneSE(nn.Module):
    """Apple SEBlock: biased reduce/expand 1x1s, rd_ratio 0.0625."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        g = g.astype(self.dtype)
        g = conv(int(self.features * 0.0625), 1, padding=0, use_bias=True,
                 dtype=self.dtype, name="reduce")(g)
        g = conv(self.features, 1, padding=0, use_bias=True,
                 dtype=self.dtype, name="expand")(jax.nn.relu(g))
        return x * jax.nn.sigmoid(g.astype(jnp.float32)).astype(x.dtype)


class MobileOneBlock(nn.Module):
    """Training-mode MobileOneBlock: branch sum + SE + ReLU.

    ``skip`` (bare-BN identity branch) is decided by the caller from the
    ORIGINAL stride so smp's make_dilated mutation semantics hold.
    """

    out_ch: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    depthwise: bool = False
    n_branches: int = 1
    use_se: bool = False
    skip: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        groups = self.out_ch if self.depthwise else 1
        y = 0.0
        for j in range(self.n_branches):
            y = y + ConvNorm(self.out_ch, self.kernel, self.stride,
                             dilation=self.dilation, groups=groups,
                             act=False, dtype=self.dtype,
                             name=f"rbr_conv_{j}")(x, train)
        if self.kernel > 1:
            y = y + ConvNorm(self.out_ch, 1, self.stride, act=False,
                             groups=groups, dtype=self.dtype,
                             name="rbr_scale")(x, train)
        if self.skip:
            y = y + batch_norm(self.dtype, "rbr_skip")(
                x, use_running_average=not train)
        if self.use_se:
            y = MobileOneSE(self.out_ch, dtype=self.dtype, name="se")(y)
        return nn.relu(y)


class MobileOneEncoder(nn.Module):
    """smp MobileOneEncoder: 6 pyramid features (stage0 + stages 1-4)."""

    name_spec: str = "mobileone_s0"
    output_stride: int = 32
    depth: int = 5
    remat: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> tuple[int, ...]:
        return mobileone_out_channels(self.name_spec)[: self.depth + 1]

    @nn.compact
    def __call__(self, x, train: bool = False) -> list[jax.Array]:
        w, n_branches, use_se_variant = MOBILEONE_SPECS[self.name_spec]
        # smp default make_dilated: os16 dilates stage4, os8 stages 3+4
        dil = {32: (1, 1), 16: (1, 2), 8: (2, 4)}[self.output_stride]
        stage_dil = {1: 1, 2: 1, 3: dil[0], 4: dil[1]}
        block_cls = (nn.remat(MobileOneBlock, static_argnums=(2,))
                     if self.remat else MobileOneBlock)

        feats = [x]
        chans = mobileone_out_channels(self.name_spec)
        y = block_cls(chans[1], 3, 2, dtype=self.dtype, name="stage0")(
            x.astype(self.dtype), train)
        feats.append(y)
        if self.depth < 2:
            return feats

        in_ch = chans[1]
        for s in range(4):
            planes = chans[s + 2]
            n = _NUM_BLOCKS[s]
            # apple _make_stage: SE on the last num_se_blocks indices
            n_se = 0
            if use_se_variant and s == 2:
                n_se = n // 2
            elif use_se_variant and s == 3:
                n_se = n
            sdil = stage_dil[s + 1]
            for ix in range(n):
                se = ix >= n - n_se
                orig_stride = 2 if ix == 0 else 1
                stride = 1 if sdil > 1 else orig_stride
                # depthwise 3x3 (skip branch iff original stride 1)
                y = block_cls(in_ch, 3, stride, dilation=sdil,
                              depthwise=True, n_branches=n_branches,
                              use_se=se, skip=(orig_stride == 1),
                              dtype=self.dtype,
                              name=f"stage{s + 1}_{2 * ix}")(y, train)
                # pointwise 1x1 (skip iff in==out)
                y = block_cls(planes, 1, 1, depthwise=False,
                              n_branches=n_branches, use_se=se,
                              skip=(in_ch == planes), dtype=self.dtype,
                              name=f"stage{s + 1}_{2 * ix + 1}")(y, train)
                in_ch = planes
            feats.append(y)
            if self.depth < len(feats):
                return feats
        return feats
