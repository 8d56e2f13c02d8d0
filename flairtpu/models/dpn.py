"""Flax DPN (Dual Path Networks) encoders for the smp provider, NHWC.

smp/encoders/dpn.py wraps pretrainedmodels' DPN (Chen et al.,
arXiv:1707.01629) for the reference's smp factory
(src/flair/model.py:35-41), tapping 6 pyramid features via get_stages():

- stage 1: InputBlock conv(7x7/2, or 3x3/2 for the "small" dpn68/68b)
  -> BN(eps 1e-3) -> ReLU, WITHOUT the maxpool (stride 2),
- stage 2: maxpool(3/2) + the conv2 DualPathBlocks (stride 4),
- stages 3-5: the conv3/conv4/conv5 block runs (strides 8/16/32); stage 5
  ends with the CatBnAct (``conv5_bn_ac``) so its tap is bn+relu'd.

Dual-path state is a (residual, dense) pair; stage taps 2-4 are
``relu(concat(pair))`` WITHOUT a bn (smp DPNEncoder.forward applies
F.relu on the raw concat). Each DualPathBlock:

- optional projection ``c1x1_w_s1``/``c1x1_w_s2`` (BnActConv 1x1, stride
  2 for 'down' blocks) split into (num_1x1_c, 2*inc),
- ``c1x1_a`` (1x1 -> r) -> ``c3x3_b`` (3x3 grouped, the block's stride)
  -> ``c1x1_c`` (1x1 -> num_1x1_c + inc), output split into the residual
  add and the dense concat,
- the "b" flavor (dpn68b) replaces ``c1x1_c`` with CatBnAct + two
  separate 1x1 convs ``c1x1_c1``/``c1x1_c2``.

Stage widths follow pretrainedmodels' formula: bw = 64*2^(s-2) *
(1 if small else 4), r = k_r*bw // (64*bw_factor), in_chs accumulating
+inc per block — reproducing smp's published out_channels for every
variant (asserted in tests/test_dpn.py against DPN_SPECS).

Dilated mode (deeplabv3/pan) follows smp's default make_dilated: the
'down' blocks of the dilated stages run stride 1 and their 3x3 (and all
subsequent 3x3s in the stage) get the dilation — so output_stride 16/8
work like every other conv encoder.

Flax submodule names mirror the torch key structure
(``conv{s}_{i}.c1x1_a.{bn,conv}`` etc.) so the checkpoint converter
(models/convert.py) is a pure rename.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from flairtpu.models.resnet import conv, max_pool_3x3_s2

_BN_EPS = 1e-3  # pretrainedmodels dpn BatchNorm2d(eps=0.001)
_BN_MOMENTUM = 0.9


def _bn(dtype, name):
    return nn.BatchNorm(use_running_average=None, momentum=_BN_MOMENTUM,
                        epsilon=_BN_EPS, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)


# name -> (num_init_features, k_r, groups, k_sec, inc_sec, small, b,
#          out_channels[1:])
DPN_SPECS: dict[str, dict] = {
    "dpn68": dict(init=10, k_r=128, groups=32, k_sec=(3, 4, 12, 3),
                  inc_sec=(16, 32, 32, 64), small=True, b=False,
                  out_channels=(10, 144, 320, 704, 832)),
    "dpn68b": dict(init=10, k_r=128, groups=32, k_sec=(3, 4, 12, 3),
                   inc_sec=(16, 32, 32, 64), small=True, b=True,
                   out_channels=(10, 144, 320, 704, 832)),
    "dpn92": dict(init=64, k_r=96, groups=32, k_sec=(3, 4, 20, 3),
                  inc_sec=(16, 32, 24, 128), small=False, b=False,
                  out_channels=(64, 336, 704, 1552, 2688)),
    "dpn98": dict(init=96, k_r=160, groups=40, k_sec=(3, 6, 20, 3),
                  inc_sec=(16, 32, 32, 128), small=False, b=False,
                  out_channels=(96, 336, 768, 1728, 2688)),
    "dpn107": dict(init=128, k_r=200, groups=50, k_sec=(4, 8, 20, 3),
                   inc_sec=(20, 64, 64, 128), small=False, b=False,
                   out_channels=(128, 376, 1152, 2432, 2688)),
    "dpn131": dict(init=128, k_r=160, groups=40, k_sec=(4, 8, 28, 3),
                   inc_sec=(16, 32, 32, 128), small=False, b=False,
                   out_channels=(128, 352, 832, 1984, 2688)),
}


class CatBnAct(nn.Module):
    """pretrainedmodels CatBnAct: concat (if pair) -> BN(1e-3) -> ReLU."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = jnp.concatenate(x, -1) if isinstance(x, tuple) else x
        x = _bn(self.dtype, "bn")(x, use_running_average=not train)
        return nn.relu(x)


class InputStem(nn.Module):
    """pretrainedmodels InputBlock minus the pool: conv -> BN -> ReLU."""

    features: int
    kernel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = conv(self.features, self.kernel, 2, padding=self.kernel // 2,
                 dtype=self.dtype, name="conv")(x)
        x = _bn(self.dtype, "bn")(x, use_running_average=not train)
        return nn.relu(x)


class BnActConv(nn.Module):
    """pretrainedmodels BnActConv2d: BN(1e-3) -> ReLU -> bias-free conv."""

    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = _bn(self.dtype, "bn")(x, use_running_average=not train)
        x = nn.relu(x)
        pad = 1 if self.kernel == 3 else 0
        return conv(self.features, self.kernel, self.stride,
                    padding=pad * self.dilation, groups=self.groups,
                    dilation=self.dilation, dtype=self.dtype, name="conv")(x)


class DualPathBlock(nn.Module):
    """pretrainedmodels DualPathBlock, (residual, dense) NHWC pair."""

    num_1x1_a: int  # r
    num_3x3_b: int  # r
    num_1x1_c: int  # bw
    inc: int
    groups: int
    block_type: str = "normal"  # 'proj' | 'down' | 'normal'
    b: bool = False
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        has_proj = self.block_type in ("proj", "down")
        key_stride = 2 if self.block_type == "down" and self.dilation == 1 else 1
        bw = self.num_1x1_c
        x_in = jnp.concatenate(x, -1) if isinstance(x, tuple) else x
        if has_proj:
            name = "c1x1_w_s2" if self.block_type == "down" else "c1x1_w_s1"
            x_s = BnActConv(bw + 2 * self.inc, 1, key_stride,
                            dtype=self.dtype, name=name)(x_in, train)
            x_s1, x_s2 = x_s[..., :bw], x_s[..., bw:]
        else:
            x_s1, x_s2 = x
        y = BnActConv(self.num_1x1_a, 1, dtype=self.dtype,
                      name="c1x1_a")(x_in, train)
        y = BnActConv(self.num_3x3_b, 3, key_stride, groups=self.groups,
                      dilation=self.dilation, dtype=self.dtype,
                      name="c3x3_b")(y, train)
        if self.b:
            # dpn68b flavor: CatBnAct then two separate 1x1 convs
            y = CatBnAct(self.dtype, name="c1x1_c")(y, train)
            out1 = conv(bw, 1, padding=0, dtype=self.dtype, name="c1x1_c1")(y)
            out2 = conv(self.inc, 1, padding=0, dtype=self.dtype,
                        name="c1x1_c2")(y)
        else:
            y = BnActConv(bw + self.inc, 1, dtype=self.dtype,
                          name="c1x1_c")(y, train)
            out1, out2 = y[..., :bw], y[..., bw:]
        return (x_s1 + out1, jnp.concatenate([x_s2, out2], -1))


class DPNEncoder(nn.Module):
    """smp DPNEncoder: 6 pyramid features at the get_stages() taps."""

    name_spec: str = "dpn68"
    output_stride: int = 32
    depth: int = 5
    remat: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> tuple[int, ...]:
        cfg = DPN_SPECS[self.name_spec]
        return (3,) + cfg["out_channels"][: self.depth]

    @nn.compact
    def __call__(self, x, train: bool = False) -> list[jax.Array]:
        cfg = DPN_SPECS[self.name_spec]
        small, b, groups = cfg["small"], cfg["b"], cfg["groups"]
        bw_factor = 1 if small else 4
        # stages dilated for reduced output stride (smp make_dilated order:
        # os16 dilates conv5, os8 dilates conv4+conv5)
        dil = {32: (1, 1), 16: (1, 2), 8: (2, 4)}[self.output_stride]
        stage_dil = {2: 1, 3: 1, 4: dil[0], 5: dil[1]}
        block_cls = (nn.remat(DualPathBlock, static_argnums=(2,))
                     if self.remat else DualPathBlock)

        feats = [x]
        x = x.astype(self.dtype)
        y = InputStem(cfg["init"], 3 if small else 7, dtype=self.dtype,
                      name="conv1_1")(x, train)
        feats.append(y)  # stage 1: stride 2, before the pool

        if self.depth >= 2:
            y = max_pool_3x3_s2(y)
            pair: Any = y
            for s in range(2, 6):
                if self.depth < s:
                    break
                bw = 64 * (2 ** (s - 2)) * bw_factor
                inc = cfg["inc_sec"][s - 2]
                r = (cfg["k_r"] * bw) // (64 * bw_factor)
                d = stage_dil[s]
                first = "proj" if s == 2 else "down"
                for i in range(1, cfg["k_sec"][s - 2] + 1):
                    pair = block_cls(
                        r, r, bw, inc, groups,
                        block_type=first if i == 1 else "normal", b=b,
                        dilation=d, dtype=self.dtype,
                        name=f"conv{s}_{i}")(pair, train)
                if s == 5:
                    # conv5_bn_ac (CatBnAct): stage-5 tap is bn+relu'd
                    feats.append(CatBnAct(self.dtype,
                                          name="conv5_bn_ac")(pair, train))
                else:
                    # smp DPNEncoder.forward: F.relu(cat(pair)), no bn
                    feats.append(nn.relu(jnp.concatenate(pair, -1)))
        return feats
