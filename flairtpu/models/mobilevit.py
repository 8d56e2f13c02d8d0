"""Flax MobileViT + DeepLabV3 head (HF-provider family).

TPU-native port of transformers' ``MobileViTForSemanticSegmentation``
(modeling_mobilevit.py: MobileViTConvLayer/InvertedResidual/MobileViTLayer,
MobileViTASPP/MobileViTDeepLabV3) — the ``apple/deeplabv3-mobilevit-*``
checkpoints. Together with SegFormer/Swin/ConvNeXt/BEiT/Data2Vec and
MobileNetV2 this covers the reference HuggingFace provider's
``AutoModelForSemanticSegmentation`` registry (reference
src/flair/model.py:43-50).

Numerics mirrored from the torch implementation:
- conv -> BatchNorm(eps 1e-5) -> SiLU composites, depthwise 3x3 in the
  MobileNetV2-style inverted residuals;
- the MobileViT block's unfold: 2x2 pixel offsets become the batch axis and
  patches the sequence axis, so attention mixes *patches* at a fixed pixel
  offset (modeling_mobilevit.py MobileViTLayer.unfolding); bilinear
  (align_corners=False) resize when the map is not patch-divisible;
- pre-LN transformer (eps 1e-5) with SiLU MLP, mlp_ratio 2;
- DeepLabV3 ASPP over the stride-``output_stride`` map: 1x1 projection,
  three dilated 3x3 convs (atrous_rates), global-pool branch, 5-way concat
  -> 1x1 project -> 1x1 classifier.

The HF model emits logits at 1/output_stride resolution; as with the other
ports, this module bilinearly upsamples (align_corners=False) to the input
resolution so the flair train/zone pipelines see (B, H, W, classes).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from flairtpu.models.swin_upernet import _conv_w, _put, _resize

# neck = per-stage channels (conv_stem + 5 encoder layers), hidden = the
# transformer dims of layers 3-5 (MobileViT paper table 1 / HF configs)
MOBILEVIT_SPECS = {
    "small": dict(neck=(16, 32, 64, 96, 128, 160, 640),
                  hidden=(144, 192, 240), expand_ratio=4.0),
    "x-small": dict(neck=(16, 32, 48, 64, 80, 96, 384),
                    hidden=(96, 120, 144), expand_ratio=4.0),
    "xx-small": dict(neck=(16, 16, 24, 48, 64, 80, 320),
                     hidden=(64, 80, 96), expand_ratio=2.0),
}

_BN_EPS = 1e-5
_LN_EPS = 1e-5


def _make_divisible(value: float, divisor: int = 8) -> int:
    """modeling_mobilevit.py make_divisible (TF slim channel rounding)."""
    new_value = max(divisor, int(value + divisor / 2) // divisor * divisor)
    if new_value < 0.9 * value:
        new_value += divisor
    return int(new_value)


class ConvBN(nn.Module):
    """MobileViTConvLayer: conv(no bias) -> BN -> activation."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    act: str | None = "silu"  # config.hidden_act default
    norm: bool = True
    bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pad = (self.kernel - 1) // 2 * self.dilation
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=self.groups, use_bias=self.bias,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv")(x.astype(self.dtype))
        if self.norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=_BN_EPS, dtype=self.dtype,
                             param_dtype=jnp.float32, name="bn")(x)
        if self.act == "silu":
            x = jax.nn.silu(x)
        elif self.act == "relu":
            x = jax.nn.relu(x)
        return x


class InvertedResidual(nn.Module):
    """MobileViTInvertedResidual: 1x1 expand -> 3x3 depthwise -> 1x1 reduce."""

    features: int
    stride: int = 1
    dilation: int = 1
    expand_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        exp = _make_divisible(int(round(in_ch * self.expand_ratio)))
        y = ConvBN(exp, kernel=1, dtype=self.dtype, name="expand")(x, train)
        y = ConvBN(exp, kernel=3, stride=self.stride, groups=exp,
                   dilation=self.dilation, dtype=self.dtype, name="dw")(y, train)
        y = ConvBN(self.features, kernel=1, act=None, dtype=self.dtype,
                   name="reduce")(y, train)
        if self.stride == 1 and in_ch == self.features:
            return x + y
        return y


class TransformerLayer(nn.Module):
    """MobileViTTransformerLayer: pre-LN MHA + pre-LN SiLU MLP."""

    dim: int
    heads: int = 4
    mlp_ratio: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B', P, C)
        dense = lambda n, f: nn.Dense(f, dtype=self.dtype,
                                      param_dtype=jnp.float32, name=n)
        ln = lambda n: nn.LayerNorm(epsilon=_LN_EPS, dtype=jnp.float32,
                                    param_dtype=jnp.float32, name=n)
        head_dim = self.dim // self.heads
        y = ln("ln1")(x).astype(self.dtype)
        B, P, _ = y.shape
        q = dense("q", self.dim)(y).reshape(B, P, self.heads, head_dim)
        k = dense("k", self.dim)(y).reshape(B, P, self.heads, head_dim)
        v = dense("v", self.dim)(y).reshape(B, P, self.heads, head_dim)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(head_dim)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        y = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, P, self.dim)
        x = x + dense("proj", self.dim)(y)
        y = ln("ln2")(x).astype(self.dtype)
        y = jax.nn.silu(dense("fc1", int(self.dim * self.mlp_ratio))(y))
        return x + dense("fc2", self.dim)(y)


def _unfold(x: jax.Array, ph: int, pw: int):
    """(B, H, W, C) -> (B*ph*pw, nh*nw, C): pixel offsets to batch, patches
    to sequence (MobileViTLayer.unfolding). Returns (patches, (H, W), resized)."""
    B, H, W, C = x.shape
    nh, nw = -(-H // ph), -(-W // pw)
    resized = (nh * ph != H) or (nw * pw != W)
    if resized:
        x = _resize(x, (nh * ph, nw * pw))
    x = x.reshape(B, nh, ph, nw, pw, C)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (B, ph, pw, nh, nw, C)
    return x.reshape(B * ph * pw, nh * nw, C), (H, W), resized


def _fold(p: jax.Array, B: int, nh: int, nw: int, ph: int, pw: int,
          orig_hw, resized: bool) -> jax.Array:
    """Inverse of :func:`_unfold`."""
    C = p.shape[-1]
    x = p.reshape(B, ph, pw, nh, nw, C).transpose(0, 3, 1, 4, 2, 5)
    x = x.reshape(B, nh * ph, nw * pw, C)
    if resized:
        x = _resize(x, orig_hw)
    return x


class MobileViTBlock(nn.Module):
    """MobileViTLayer: optional IR downsample -> local convs -> global
    transformer over folded patches -> project + fuse with residual."""

    features: int
    hidden: int
    depth: int
    stride: int = 2
    dilation: int = 1
    expand_ratio: float = 4.0
    patch: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.stride == 2:
            x = InvertedResidual(
                self.features, stride=2 if self.dilation == 1 else 1,
                dilation=self.dilation // 2 if self.dilation > 1 else 1,
                expand_ratio=self.expand_ratio, dtype=self.dtype,
                name="down")(x, train)
        residual = x
        y = ConvBN(self.features, kernel=3, dtype=self.dtype,
                   name="conv_kxk")(x, train)
        y = ConvBN(self.hidden, kernel=1, act=None, norm=False,
                   dtype=self.dtype, name="conv_1x1")(y, train)
        B, H, W, _ = y.shape
        p, orig_hw, resized = _unfold(y, self.patch, self.patch)
        nh, nw = -(-H // self.patch), -(-W // self.patch)
        for k in range(self.depth):
            p = TransformerLayer(self.hidden, dtype=self.dtype,
                                 name=f"tf{k}")(p)
        p = nn.LayerNorm(epsilon=_LN_EPS, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="ln")(p).astype(self.dtype)
        y = _fold(p, B, nh, nw, self.patch, self.patch, orig_hw, resized)
        y = ConvBN(self.features, kernel=1, dtype=self.dtype,
                   name="conv_proj")(y, train)
        y = ConvBN(self.features, kernel=3, dtype=self.dtype, name="fusion")(
            jnp.concatenate([residual, y], axis=-1), train)
        return y


class MobileViTBackbone(nn.Module):
    """conv_stem + 5 stages; returns the final stride-``output_stride`` map."""

    spec: str = "small"
    output_stride: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = MOBILEVIT_SPECS[self.spec]
        neck, hidden, er = cfg["neck"], cfg["hidden"], cfg["expand_ratio"]
        x = ConvBN(neck[0], kernel=3, stride=2, dtype=self.dtype,
                   name="stem")(x, train)
        # layer0: 1 IR stage stride 1; layer1: 3 IR stages stride 2
        x = InvertedResidual(neck[1], stride=1, expand_ratio=er,
                             dtype=self.dtype, name="layer0_block0")(x, train)
        for j in range(3):
            x = InvertedResidual(neck[2], stride=2 if j == 0 else 1,
                                 expand_ratio=er, dtype=self.dtype,
                                 name=f"layer1_block{j}")(x, train)
        # layers 2-4 are MobileViT blocks; dilation per MobileViTEncoder
        dilate4 = self.output_stride == 8
        dilate5 = self.output_stride in (8, 16)
        dilation = 1
        x = MobileViTBlock(neck[3], hidden[0], depth=2, expand_ratio=er,
                           dtype=self.dtype, name="layer2")(x, train)
        if dilate4:
            dilation *= 2
        x = MobileViTBlock(neck[4], hidden[1], depth=4, dilation=dilation,
                           expand_ratio=er, dtype=self.dtype,
                           name="layer3")(x, train)
        if dilate5:
            dilation *= 2
        x = MobileViTBlock(neck[5], hidden[2], depth=3, dilation=dilation,
                           expand_ratio=er, dtype=self.dtype,
                           name="layer4")(x, train)
        return x


class MobileViTSeg(nn.Module):
    """MobileViTForSemanticSegmentation: backbone -> ASPP -> classifier.

    ``output_stride`` 16 reproduces the DeepLabV3-MobileViT geometry from the
    MobileViT paper (8 and 32 are also supported; the parameter set is
    identical, only conv dilation/stride changes).
    """

    spec: str = "small"
    classes: int = 13
    use_metadata: bool = False  # HF provider has no metadata path
    output_stride: int = 16
    atrous_rates: tuple[int, ...] = (6, 12, 18)
    aspp_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mtd=None, train: bool = False) -> jax.Array:
        del mtd  # metadata fusion is a resnet-unet (smp provider) feature
        B, H, W, _ = x.shape
        f = MobileViTBackbone(self.spec, self.output_stride,
                              dtype=self.dtype, name="backbone")(x, train)
        ch = self.aspp_channels
        branches = [ConvBN(ch, kernel=1, act="relu", dtype=self.dtype,
                           name="aspp_in")(f, train)]
        for i, rate in enumerate(self.atrous_rates):
            branches.append(ConvBN(ch, kernel=3, dilation=rate, act="relu",
                                   dtype=self.dtype,
                                   name=f"aspp_rate{i}")(f, train))
        pooled = jnp.mean(f, axis=(1, 2), keepdims=True)
        pooled = ConvBN(ch, kernel=1, act="relu", dtype=self.dtype,
                        name="aspp_pool")(pooled, train)
        branches.append(jnp.broadcast_to(pooled, branches[0].shape))
        y = ConvBN(ch, kernel=1, act="relu", dtype=self.dtype,
                   name="aspp_project")(
            jnp.concatenate(branches, axis=-1), train)
        logits = ConvBN(self.classes, kernel=1, act=None, norm=False,
                        bias=True, dtype=self.dtype, name="classifier")(y, train)
        return _resize(logits.astype(jnp.float32), (H, W))


# ---------------------------------------------------------------------------
# transformers MobileViTForSemanticSegmentation state dict -> Flax variables
# ---------------------------------------------------------------------------

def _put_convbn(params: dict, stats: dict, base: tuple, rest: list,
                arr: np.ndarray) -> None:
    """MobileViTConvLayer keys (convolution.*/normalization.*) -> ConvBN."""
    if rest[0] == "convolution":
        _put(params, base + ("conv", "kernel" if rest[1] == "weight" else "bias"),
             _conv_w(arr) if rest[1] == "weight" else arr)
    elif rest[0] == "normalization":
        tgt = {"weight": ("scale", params), "bias": ("bias", params),
               "running_mean": ("mean", stats), "running_var": ("var", stats)}
        name, tree = tgt[rest[1]]
        _put(tree, base + ("bn", name), arr)
    else:
        raise KeyError(f"unrecognized conv layer key {'.'.join(rest)!r}")


def _put_ir(params: dict, stats: dict, base: tuple, rest: list,
            arr: np.ndarray) -> None:
    """MobileViTInvertedResidual keys -> InvertedResidual subtree."""
    sub = {"expand_1x1": "expand", "conv_3x3": "dw", "reduce_1x1": "reduce"}
    _put_convbn(params, stats, base + (sub[rest[0]],), rest[1:], arr)


def hf_mobilevit_torch_to_flax(sd: dict[str, np.ndarray]) -> dict:
    """Key-exact converter (MobileViTForSemanticSegmentation layout)."""
    params: dict = {}
    stats: dict = {}
    n_aspp_rates = 1 + max((int(k.split(".")[3]) for k in sd
                            if k.startswith("segmentation_head.aspp.convs.")),
                           default=4)

    for key, arr in sd.items():
        arr = np.asarray(arr)
        parts = key.split(".")
        if key.endswith("num_batches_tracked"):
            continue
        if key.startswith("mobilevit.conv_stem."):
            _put_convbn(params, stats, ("backbone", "stem"), parts[2:], arr)
            continue
        if key.startswith("mobilevit.encoder.layer."):
            i, rest = int(parts[3]), parts[4:]
            if i in (0, 1):  # MobileNetLayer: .layer.<j>.<ir keys>
                base = ("backbone", f"layer{i}_block{rest[1]}")
                _put_ir(params, stats, base, rest[2:], arr)
                continue
            base = ("backbone", f"layer{i}")
            if rest[0] == "downsampling_layer":
                _put_ir(params, stats, base + ("down",), rest[1:], arr)
            elif rest[0] in ("conv_kxk", "conv_1x1", "conv_projection", "fusion"):
                sub = "conv_proj" if rest[0] == "conv_projection" else rest[0]
                _put_convbn(params, stats, base + (sub,), rest[1:], arr)
            elif rest[0] == "transformer":
                k, trest = rest[2], rest[3:]
                tbase = base + (f"tf{k}",)
                if trest[0] in ("layernorm_before", "layernorm_after"):
                    name = "ln1" if trest[0] == "layernorm_before" else "ln2"
                    _put(params, tbase + (name,
                                          "scale" if trest[1] == "weight" else "bias"),
                         arr)
                elif trest[:2] == ["attention", "attention"]:
                    name = trest[2][0]  # query/key/value -> q/k/v
                    _put(params, tbase + (name,
                                          "kernel" if trest[3] == "weight" else "bias"),
                         arr.T if trest[3] == "weight" else arr)
                elif trest[:2] == ["attention", "output"]:
                    _put(params, tbase + ("proj",
                                          "kernel" if trest[3] == "weight" else "bias"),
                         arr.T if trest[3] == "weight" else arr)
                elif trest[0] == "intermediate":
                    _put(params, tbase + ("fc1",
                                          "kernel" if trest[2] == "weight" else "bias"),
                         arr.T if trest[2] == "weight" else arr)
                elif trest[0] == "output":
                    _put(params, tbase + ("fc2",
                                          "kernel" if trest[2] == "weight" else "bias"),
                         arr.T if trest[2] == "weight" else arr)
                else:
                    raise KeyError(f"unrecognized transformer key {key!r}")
            elif rest[0] == "layernorm":
                _put(params, base + ("ln",
                                     "scale" if rest[1] == "weight" else "bias"),
                     arr)
            else:
                raise KeyError(f"unrecognized mobilevit layer key {key!r}")
            continue
        if key.startswith("segmentation_head.aspp.convs."):
            i, rest = int(parts[3]), parts[4:]
            if i == 0:
                _put_convbn(params, stats, ("aspp_in",), rest, arr)
            elif i == n_aspp_rates - 1:  # ASPPPooling wraps its conv in conv_1x1
                _put_convbn(params, stats, ("aspp_pool",), rest[1:], arr)
            else:
                _put_convbn(params, stats, (f"aspp_rate{i - 1}",), rest, arr)
            continue
        if key.startswith("segmentation_head.aspp.project."):
            _put_convbn(params, stats, ("aspp_project",), parts[3:], arr)
            continue
        if key.startswith("segmentation_head.classifier."):
            _put_convbn(params, stats, ("classifier",), parts[2:], arr)
            continue
        raise KeyError(f"unrecognized mobilevit checkpoint key {key!r}")

    return {"params": params, "batch_stats": stats}
