"""Flax timm-EfficientNet encoders for the smp provider, NHWC.

smp/encoders/timm_efficientnet.py wraps timm's ``EfficientNet`` (the
``timm-efficientnet-b0..b8``, ``timm-efficientnet-l2`` and
``timm-tf_efficientnet_lite0..4`` encoder strings the reference's factory
accepts, src/flair/model.py:35-41). timm's EfficientNet differs from the
lukemelas efficientnet-pytorch one the plain ``efficientnet-b*`` strings
use (models/efficientnet.py) in key names (``blocks.{stage}.{idx}`` nested
Sequential vs flat ``_blocks.{j}``), padding (native variants use standard
symmetric ``k//2`` torch padding, NOT TF static same), BatchNorm constants
(native: torch defaults eps 1e-5 / momentum 0.1) and block leaf names
(``conv_pw/conv_dw/conv_pwl``, ``bn1/bn2/bn3``, ``se.conv_reduce`` /
``se.conv_expand``).

Flavors (smp's get_efficientnet_kwargs / _lite_kwargs over timm arch defs):

- ``timm-efficientnet-b0..b8``/``l2`` (native): SiLU, SE (squeeze to
  ``max(1, int(0.25 * block_input))`` of the unexpanded input, silu +
  sigmoid gate), symmetric padding, BN 1e-5/0.1;
- ``timm-tf_efficientnet_lite0..4``: ReLU6, NO squeeze-excite, TF dynamic
  SAME padding (computed from the runtime feature size — static under
  jit), BN eps 1e-3, fixed 32-ch stem (``fix_stem``), and depth scaling
  that skips the first and last stage (``fix_first_last``).

Stage taps follow smp's get_stages over timm's 7 stage groups with
``stage_idxs (2, 3, 5)``: stem (stride 2), stages 0-1 (stride 4), stage 2
(stride 8), stages 3-4 (stride 16), stages 5-6 (stride 32); smp's default
make_dilated applies to the last two taps for output_stride 16/8.

The classifier head (``conv_head``/``bn2``/``classifier``) is not part of
the encoder surface, matching the established mirror convention
(tests/torch_ref_efficientnet.py). Oracle: hand-built torch mirror
(tests/torch_ref_timm_en.py) + committed key/shape manifests — timm/smp
are not installed here (caveat as tests/torch_ref.py:1-8).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from flairtpu.models.dpt import _tf_same_pad
from flairtpu.models.efficientnet import (DROP_CONNECT_RATE, _BASE_STAGES,
                                          round_filters)

# name -> (channel_multiplier, depth_multiplier, flavor)
TIMM_EFFICIENTNET_SPECS = {
    **{f"timm-efficientnet-b{i}": (w, d, "native") for i, (w, d) in enumerate(
        [(1.0, 1.0), (1.0, 1.1), (1.1, 1.2), (1.2, 1.4), (1.4, 1.8),
         (1.6, 2.2), (1.8, 2.6), (2.0, 3.1), (2.2, 3.6)])},
    "timm-efficientnet-l2": (4.3, 5.3, "native"),
    **{f"timm-tf_efficientnet_lite{i}": (w, d, "lite") for i, (w, d) in
       enumerate([(1.0, 1.0), (1.0, 1.1), (1.1, 1.2), (1.2, 1.4),
                  (1.4, 1.8)])},
}


def timm_efficientnet_plan(name: str, output_stride: int = 32) -> dict:
    """Static per-block plan over timm's 7 stage groups."""
    width, depth, flavor = TIMM_EFFICIENTNET_SPECS[name]
    lite = flavor == "lite"
    stem_ch = 32 if lite else round_filters(32, width)  # fix_stem for lite
    bn_eps = 1e-3 if lite else 1e-5  # tf_ vs native timm BN epsilon

    # smp make_dilated: get_stages()[4] (timm stages 3-4) and [5] (5-6)
    dilate_from = {32: None, 16: 5, 8: 3}[output_stride]
    stages = []
    dilation = 1
    n_blocks = 0
    for si, (r, k, s, e, cin, cout) in enumerate(_BASE_STAGES):
        if lite and si in (0, len(_BASE_STAGES) - 1):
            repeats = r  # decode_arch_def(..., fix_first_last=True)
        else:
            repeats = int(math.ceil(depth * r))
        cin_r = stem_ch if si == 0 else round_filters(cin, width)
        cout_r = round_filters(cout, width)
        if dilate_from is not None and si in (dilate_from, 5):
            if si >= dilate_from:
                dilation *= 2
        blocks = []
        for j in range(repeats):
            stride = s if j == 0 else 1
            bin_ = cin_r if j == 0 else cout_r
            dilated = dilate_from is not None and si >= dilate_from
            blocks.append(dict(
                kernel=k, stride=1 if dilated else stride,
                dilation=dilation if dilated else 1,
                expand=e, cin=bin_, cout=cout_r,
                se=None if lite else max(1, int(bin_ * 0.25)),
                skip=(stride == 1 and bin_ == cout_r),
                ds=si == 0,  # DepthwiseSeparableConv stage
            ))
            n_blocks += 1
        stages.append(blocks)
    out_channels = (stem_ch, stages[1][-1]["cout"], stages[2][-1]["cout"],
                    stages[4][-1]["cout"], stages[6][-1]["cout"])
    return dict(stem_ch=stem_ch, bn_eps=bn_eps, lite=lite, stages=stages,
                out_channels=out_channels, n_blocks=n_blocks)


class TimmEfficientNetBlock(nn.Module):
    """timm DepthwiseSeparableConv (``ds=True``) / InvertedResidual."""

    kernel: int
    stride: int
    dilation: int
    expand: int
    cin: int
    cout: int
    se: int | None
    skip: bool
    ds: bool
    lite: bool
    bn_eps: float
    drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=self.bn_eps, dtype=jnp.float32,
                                param_dtype=jnp.float32, name=name)

        def conv(ch, k, name, stride=1, groups=1, bias=False):
            return nn.Conv(ch, (k, k), strides=(stride, stride),
                           padding=((0, 0), (0, 0)) if self.lite and k > 1
                           else (k // 2) * self.dilation,
                           kernel_dilation=(self.dilation, self.dilation),
                           feature_group_count=groups, use_bias=bias,
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name=name)

        act = jax.nn.relu6 if self.lite else jax.nn.silu

        def dw(y, ch, name):
            if self.lite:
                # timm Conv2dSame: TF dynamic SAME padding at runtime
                y = _tf_same_pad(y, (self.kernel - 1) * self.dilation + 1,
                                 self.stride)
            return conv(ch, self.kernel, name, stride=self.stride,
                        groups=ch)(y)

        def squeeze(y):
            if self.se is None:
                return y
            g = jnp.mean(y.astype(jnp.float32), axis=(1, 2), keepdims=True)
            g = g.astype(self.dtype)
            g = conv(self.se, 1, "se_reduce", bias=True)(g)
            g = conv(y.shape[-1], 1, "se_expand", bias=True)(jax.nn.silu(g))
            return jax.nn.sigmoid(g.astype(jnp.float32)).astype(y.dtype) * y

        inputs = x
        if self.ds:  # conv_dw -> bn1(+act) -> se -> conv_pw -> bn2
            x = act(bn("bn1")(dw(x, self.cin, "conv_dw")))
            x = squeeze(x)
            x = bn("bn2")(conv(self.cout, 1, "conv_pw")(x))
        else:  # conv_pw -> bn1(+act) -> conv_dw -> bn2(+act) -> se ->
            #    conv_pwl -> bn3
            mid = self.cin * self.expand
            x = act(bn("bn1")(conv(mid, 1, "conv_pw")(x)))
            x = act(bn("bn2")(dw(x, mid, "conv_dw")))
            x = squeeze(x)
            x = bn("bn3")(conv(self.cout, 1, "conv_pwl")(x))
        if self.skip:
            if train and self.drop_rate > 0:
                keep = 1.0 - self.drop_rate
                rng = self.make_rng("dropout")
                mask = jax.random.bernoulli(
                    rng, keep, (x.shape[0], 1, 1, 1)).astype(x.dtype)
                x = x / keep * mask
            x = x + inputs
        return x


class TimmEfficientNetEncoder(nn.Module):
    """smp TimmEfficientNetEncoder: 6 pyramid features at get_stages taps."""

    name_spec: str = "timm-efficientnet-b0"
    output_stride: int = 32
    depth: int = 5
    remat: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> tuple[int, ...]:
        p = timm_efficientnet_plan(self.name_spec, self.output_stride)
        return ((3,) + p["out_channels"])[: self.depth + 1]

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        plan = timm_efficientnet_plan(self.name_spec, self.output_stride)
        features = [x]
        y = x.astype(self.dtype)
        if plan["lite"]:
            y = _tf_same_pad(y, 3, 2)
            pad = ((0, 0), (0, 0))
        else:
            pad = ((1, 1), (1, 1))
        y = nn.Conv(plan["stem_ch"], (3, 3), strides=(2, 2), padding=pad,
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv_stem")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=plan["bn_eps"], dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn1")(y)
        y = (jax.nn.relu6 if plan["lite"] else jax.nn.silu)(y)
        features.append(y)  # stride 2

        block_cls = (nn.remat(TimmEfficientNetBlock, static_argnums=(2,))
                     if self.remat else TimmEfficientNetBlock)
        # smp stage_idxs (2, 3, 5) over timm's stage groups
        tap_after = {1, 2, 4, 6}
        n = plan["n_blocks"]
        j = 0
        for si, blocks in enumerate(plan["stages"]):
            for i, b in enumerate(blocks):
                y = block_cls(lite=plan["lite"], bn_eps=plan["bn_eps"],
                              drop_rate=DROP_CONNECT_RATE * j / n,
                              dtype=self.dtype, name=f"s{si}_b{i}",
                              **b)(y, train)
                j += 1
            if si in tap_after:
                features.append(y)
                if len(features) == self.depth + 1:
                    return features
        return features
