"""Flax InceptionV4 / InceptionResNetV2 encoders for the smp provider, NHWC.

smp/encoders/inceptionv4.py and inceptionresnetv2.py wrap pretrainedmodels'
InceptionV4 (Szegedy et al., arXiv:1602.07261) and InceptionResNetV2 for the
reference's smp factory (src/flair/model.py:35-41). Both smp encoders apply
the same "correct paddings" patch in __init__: every 3x3 conv gets padding
(1, 1) and every MaxPool2d gets padding 1, so stage shapes stay
power-of-two; the 1x7/7x1/1x3/3x1 factorized convs and the 5x5 keep
pretrainedmodels' original paddings. Both override make_dilated to raise
(pooling downsampling), so deeplabv3/deeplabv3plus/pan reject them
(registry.check_smp).

InceptionV4 taps (stage_idxs (3, 5, 9, 15) over the 22-module ``features``
Sequential; out_channels (3, 64, 192, 384, 1024, 1536)):

- stage 1: features 0-2 (3x3/2 stem + two 3x3) -> 64 ch, stride 2,
- stage 2: Mixed_3a (pool||conv /2) + Mixed_4a -> 192 ch, stride 4,
- stage 3: Mixed_5a (/2) + 3x Inception_A -> 384 ch, stride 8,
- stage 4: Inception_A + Reduction_A (/2) + 4x Inception_B -> 1024, /16,
- stage 5: 3x Inception_B + Reduction_B (/2) + 3x Inception_C -> 1536, /32.

InceptionResNetV2 taps (out_channels (3, 64, 192, 320, 1088, 1536)):

- stage 1: conv2d_1a(3x3/2) + conv2d_2a + conv2d_2b -> 64 ch, stride 2,
- stage 2: maxpool_3a + conv2d_3b(1x1) + conv2d_4a -> 192 ch, stride 4,
- stage 3: maxpool_5a + Mixed_5b + 10x Block35(scale .17) -> 320, /8,
- stage 4: Mixed_6a (/2) + 20x Block17(scale .10) -> 1088, /16,
- stage 5: Mixed_7a (/2) + 9x Block8(scale .20) + Block8(noReLU) +
  conv2d_7b(1x1 -> 1536), /32.

The residual Block35/17/8 end with a BIASED 1x1 ``conv2d`` and compute
``relu(x + scale * conv2d(cat(branches)))`` (no relu for the final
noReLU block8); branch avg-pools are 3x3/1 count_include_pad=False.

Flax submodule names mirror the torch key structure (``features{i}``,
``repeat_{j}``, ``branch1_0`` for Sequential indices) so the checkpoint
converter (models/convert.py) is a pure rename. Oracle: hand-built torch
mirrors (tests/torch_ref_inception.py) + committed key/shape manifests —
pretrainedmodels/smp are not installed here (caveat as tests/torch_ref.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from flairtpu.models.resnet import max_pool_3x3_s2

_BN_EPS = 1e-3  # pretrainedmodels inception BatchNorm2d(eps=0.001)
_BN_MOMENTUM = 0.9


def _avg_pool_3x3(x: jax.Array) -> jax.Array:
    """torch AvgPool2d(3, stride=1, padding=1, count_include_pad=False)."""
    dims, strides = (1, 3, 3, 1), (1, 1, 1, 1)
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    s = jax.lax.reduce_window(x, jnp.zeros((), x.dtype), jax.lax.add,
                              dims, strides, pad)
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    cnt = jax.lax.reduce_window(ones, jnp.zeros((), x.dtype), jax.lax.add,
                                dims, strides, pad)
    return s / cnt


class BasicConv(nn.Module):
    """pretrainedmodels BasicConv2d: bias-free conv -> BN(1e-3) -> ReLU."""

    features: int
    kernel: tuple[int, int] = (1, 1)
    stride: int = 1
    padding: tuple[int, int] = (0, 0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        ph, pw = self.padding
        x = nn.Conv(self.features, self.kernel, (self.stride, self.stride),
                    padding=((ph, ph), (pw, pw)), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=_BN_MOMENTUM,
                         epsilon=_BN_EPS, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


# branch-chain conv specs: (features, kh, kw, stride, ph, pw).  All 3x3s
# carry smp's padding patch (1, 1); factorized convs keep original paddings.
def _c1(f):
    return (f, 1, 1, 1, 0, 0)


def _c3(f, s=1):
    return (f, 3, 3, s, 1, 1)


def _c17(f):
    return (f, 1, 7, 1, 0, 3)


def _c71(f):
    return (f, 7, 1, 1, 3, 0)


def _c13(f):
    return (f, 1, 3, 1, 0, 1)


def _c31(f):
    return (f, 3, 1, 1, 1, 0)


def _chain(x, specs, prefix, train, dtype, avg_first=False):
    """A torch Sequential of BasicConv2d, names ``{prefix}_{j}`` by index;
    ``avg_first`` prepends the count_include_pad=False avg pool (index 0)."""
    j0 = 0
    if avg_first:
        x = _avg_pool_3x3(x)
        j0 = 1
    for j, (f, kh, kw, s, ph, pw) in enumerate(specs, start=j0):
        x = BasicConv(f, (kh, kw), s, (ph, pw), dtype=dtype,
                      name=f"{prefix}_{j}")(x, train)
    return x


def _cat(parts):
    return jnp.concatenate(parts, axis=-1)


# ---------------------------------------------------------------- InceptionV4


class Mixed3a(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return _cat([max_pool_3x3_s2(x),
                     BasicConv(96, (3, 3), 2, (1, 1), dtype=self.dtype,
                               name="conv")(x, train)])


class Mixed4a(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        b0 = _chain(x, [_c1(64), _c3(96)], "branch0", train, self.dtype)
        b1 = _chain(x, [_c1(64), _c17(64), _c71(64), _c3(96)], "branch1",
                    train, self.dtype)
        return _cat([b0, b1])


class Mixed5a(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return _cat([BasicConv(192, (3, 3), 2, (1, 1), dtype=self.dtype,
                               name="conv")(x, train),
                     max_pool_3x3_s2(x)])


class InceptionA(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        d = self.dtype
        return _cat([
            BasicConv(96, dtype=d, name="branch0")(x, train),
            _chain(x, [_c1(64), _c3(96)], "branch1", train, d),
            _chain(x, [_c1(64), _c3(96), _c3(96)], "branch2", train, d),
            _chain(x, [_c1(96)], "branch3", train, d, avg_first=True),
        ])


class ReductionA(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        d = self.dtype
        return _cat([
            BasicConv(384, (3, 3), 2, (1, 1), dtype=d, name="branch0")(x, train),
            _chain(x, [_c1(192), _c3(224), _c3(256, 2)], "branch1", train, d),
            max_pool_3x3_s2(x),
        ])


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        d = self.dtype
        return _cat([
            BasicConv(384, dtype=d, name="branch0")(x, train),
            _chain(x, [_c1(192), _c17(224), _c71(256)], "branch1", train, d),
            _chain(x, [_c1(192), _c71(192), _c17(224), _c71(224), _c17(256)],
                   "branch2", train, d),
            _chain(x, [_c1(128)], "branch3", train, d, avg_first=True),
        ])


class ReductionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        d = self.dtype
        return _cat([
            _chain(x, [_c1(192), _c3(192, 2)], "branch0", train, d),
            _chain(x, [_c1(256), _c17(256), _c71(320), _c3(320, 2)],
                   "branch1", train, d),
            max_pool_3x3_s2(x),
        ])


class InceptionC(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        d = self.dtype
        b0 = BasicConv(256, dtype=d, name="branch0")(x, train)
        y1 = BasicConv(384, dtype=d, name="branch1_0")(x, train)
        b1 = _cat([
            BasicConv(256, (1, 3), 1, (0, 1), dtype=d, name="branch1_1a")(y1, train),
            BasicConv(256, (3, 1), 1, (1, 0), dtype=d, name="branch1_1b")(y1, train),
        ])
        y2 = BasicConv(384, dtype=d, name="branch2_0")(x, train)
        y2 = BasicConv(448, (3, 1), 1, (1, 0), dtype=d, name="branch2_1")(y2, train)
        y2 = BasicConv(512, (1, 3), 1, (0, 1), dtype=d, name="branch2_2")(y2, train)
        b2 = _cat([
            BasicConv(256, (1, 3), 1, (0, 1), dtype=d, name="branch2_3a")(y2, train),
            BasicConv(256, (3, 1), 1, (1, 0), dtype=d, name="branch2_3b")(y2, train),
        ])
        b3 = _chain(x, [_c1(256)], "branch3", train, d, avg_first=True)
        return _cat([b0, b1, b2, b3])


class InceptionV4Encoder(nn.Module):
    """smp InceptionV4Encoder: 6 pyramid features at the get_stages() taps."""

    output_stride: int = 32
    depth: int = 5
    remat: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> tuple[int, ...]:
        return (3, 64, 192, 384, 1024, 1536)[: self.depth + 1]

    @nn.compact
    def __call__(self, x, train: bool = False) -> list[jax.Array]:
        if self.output_stride != 32:
            # smp InceptionV4Encoder.make_dilated (encoders/inceptionv4.py)
            raise ValueError(
                "InceptionV4 encoder does not support dilated mode due to "
                "pooling operation for downsampling!")
        d = self.dtype

        def mod(cls, i):
            c = nn.remat(cls, static_argnums=(2,)) if self.remat else cls
            return c(dtype=d, name=f"features{i}")

        feats = [x]
        y = BasicConv(32, (3, 3), 2, (1, 1), dtype=d, name="features0")(
            x.astype(d), train)
        y = BasicConv(32, (3, 3), 1, (1, 1), dtype=d, name="features1")(y, train)
        y = BasicConv(64, (3, 3), 1, (1, 1), dtype=d, name="features2")(y, train)
        feats.append(y)  # stride 2, 64
        if self.depth >= 2:
            y = mod(Mixed3a, 3)(y, train)
            y = mod(Mixed4a, 4)(y, train)
            feats.append(y)  # stride 4, 192
        if self.depth >= 3:
            y = mod(Mixed5a, 5)(y, train)
            for i in (6, 7, 8):
                y = mod(InceptionA, i)(y, train)
            feats.append(y)  # stride 8, 384
        if self.depth >= 4:
            y = mod(InceptionA, 9)(y, train)
            y = mod(ReductionA, 10)(y, train)
            for i in (11, 12, 13, 14):
                y = mod(InceptionB, i)(y, train)
            feats.append(y)  # stride 16, 1024
        if self.depth >= 5:
            for i in (15, 16, 17):
                y = mod(InceptionB, i)(y, train)
            y = mod(ReductionB, 18)(y, train)
            for i in (19, 20, 21):
                y = mod(InceptionC, i)(y, train)
            feats.append(y)  # stride 32, 1536
        return feats


# --------------------------------------------------------- InceptionResNetV2


class Mixed5b(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        d = self.dtype
        return _cat([
            BasicConv(96, dtype=d, name="branch0")(x, train),
            _chain(x, [_c1(48), (64, 5, 5, 1, 2, 2)], "branch1", train, d),
            _chain(x, [_c1(64), _c3(96), _c3(96)], "branch2", train, d),
            _chain(x, [_c1(64)], "branch3", train, d, avg_first=True),
        ])


class Mixed6a(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        d = self.dtype
        return _cat([
            BasicConv(384, (3, 3), 2, (1, 1), dtype=d, name="branch0")(x, train),
            _chain(x, [_c1(256), _c3(256), _c3(384, 2)], "branch1", train, d),
            max_pool_3x3_s2(x),
        ])


class Mixed7a(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        d = self.dtype
        return _cat([
            _chain(x, [_c1(256), _c3(384, 2)], "branch0", train, d),
            _chain(x, [_c1(256), _c3(288, 2)], "branch1", train, d),
            _chain(x, [_c1(256), _c3(288), _c3(320, 2)], "branch2", train, d),
            max_pool_3x3_s2(x),
        ])


class ResidualBlock(nn.Module):
    """pretrainedmodels Block35/Block17/Block8: branches -> biased 1x1
    ``conv2d`` -> ``relu(x + scale * out)`` (no relu when ``no_relu``)."""

    kind: str  # 'block35' | 'block17' | 'block8'
    scale: float
    no_relu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        d = self.dtype
        if self.kind == "block35":
            parts = [
                BasicConv(32, dtype=d, name="branch0")(x, train),
                _chain(x, [_c1(32), _c3(32)], "branch1", train, d),
                _chain(x, [_c1(32), _c3(48), _c3(64)], "branch2", train, d),
            ]
            planes = 320
        elif self.kind == "block17":
            parts = [
                BasicConv(192, dtype=d, name="branch0")(x, train),
                _chain(x, [_c1(128), _c17(160), _c71(192)], "branch1", train, d),
            ]
            planes = 1088
        else:  # block8
            parts = [
                BasicConv(192, dtype=d, name="branch0")(x, train),
                _chain(x, [_c1(192), _c13(224), _c31(256)], "branch1", train, d),
            ]
            planes = 2080
        out = nn.Conv(planes, (1, 1), use_bias=True, dtype=d,
                      param_dtype=jnp.float32, name="conv2d")(_cat(parts))
        out = x + jnp.asarray(self.scale, out.dtype) * out
        return out if self.no_relu else nn.relu(out)


class InceptionResNetV2Encoder(nn.Module):
    """smp InceptionResNetV2Encoder: 6 pyramid features at the taps."""

    output_stride: int = 32
    depth: int = 5
    remat: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> tuple[int, ...]:
        return (3, 64, 192, 320, 1088, 1536)[: self.depth + 1]

    @nn.compact
    def __call__(self, x, train: bool = False) -> list[jax.Array]:
        if self.output_stride != 32:
            # smp InceptionResNetV2Encoder.make_dilated
            raise ValueError(
                "InceptionResnetV2 encoder does not support dilated mode "
                "due to pooling operation for downsampling!")
        d = self.dtype
        block_cls = (nn.remat(ResidualBlock, static_argnums=(2,))
                     if self.remat else ResidualBlock)

        feats = [x]
        y = BasicConv(32, (3, 3), 2, (1, 1), dtype=d, name="conv2d_1a")(
            x.astype(d), train)
        y = BasicConv(32, (3, 3), 1, (1, 1), dtype=d, name="conv2d_2a")(y, train)
        y = BasicConv(64, (3, 3), 1, (1, 1), dtype=d, name="conv2d_2b")(y, train)
        feats.append(y)  # stride 2, 64
        if self.depth >= 2:
            y = max_pool_3x3_s2(y)
            y = BasicConv(80, dtype=d, name="conv2d_3b")(y, train)
            y = BasicConv(192, (3, 3), 1, (1, 1), dtype=d, name="conv2d_4a")(y, train)
            feats.append(y)  # stride 4, 192
        if self.depth >= 3:
            y = max_pool_3x3_s2(y)
            y = Mixed5b(dtype=d, name="mixed_5b")(y, train)
            for i in range(10):
                y = block_cls("block35", 0.17, dtype=d,
                              name=f"repeat_{i}")(y, train)
            feats.append(y)  # stride 8, 320
        if self.depth >= 4:
            y = Mixed6a(dtype=d, name="mixed_6a")(y, train)
            for i in range(20):
                y = block_cls("block17", 0.10, dtype=d,
                              name=f"repeat_1_{i}")(y, train)
            feats.append(y)  # stride 16, 1088
        if self.depth >= 5:
            y = Mixed7a(dtype=d, name="mixed_7a")(y, train)
            for i in range(9):
                y = block_cls("block8", 0.20, dtype=d,
                              name=f"repeat_2_{i}")(y, train)
            y = ResidualBlock("block8", 1.0, no_relu=True, dtype=d,
                              name="block8")(y, train)
            y = BasicConv(1536, dtype=d, name="conv2d_7b")(y, train)
            feats.append(y)  # stride 32, 1536
        return feats
