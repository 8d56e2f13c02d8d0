"""Flax MobileViTV2 + DeepLabV3 head (HF-provider family).

TPU-native port of transformers' ``MobileViTV2ForSemanticSegmentation``
(modeling_mobilevitv2.py) — the ``apple/mobilevitv2-*`` checkpoints — closing
the last ``AutoModelForSemanticSegmentation`` registry family the reference
can load (reference src/flair/model.py:43-50).

Differences from MobileViT v1 mirrored exactly:

- all widths derive from one ``width_multiplier`` via the TF-slim
  make_divisible rules (layer dims 32/64/128/256/384/512 x w, attention dims
  128/192/256 x w);
- the local conv_kxk is depthwise; conv_1x1 has no norm/activation;
- **separable (linear) self-attention**: qkv is one 1x1 projection to
  ``1 + 2C``; the 1-channel query softmaxes over the *patch* axis into
  context scores, the context vector is the score-weighted sum of keys, and
  the output is ``relu(value) * context`` — no quadratic attention matrix;
- pre/post norms are torch ``GroupNorm(num_groups=1)``, which normalizes
  over channels AND both patch axes per sample (not per-token LayerNorm);
- the v1 fusion conv is gone: fold -> 1x1 conv_projection (BN, no act);
- unfold layout is ``(B, P, N, C)``: pixel-within-patch P is an axis,
  attention mixes the N patches (v1 instead moved P into the batch).

As with the other HF ports the head's stride-``output_stride`` logits are
bilinearly upsampled (align_corners=False) to input resolution. Inference
dropouts (attn/ffn/aspp/classifier) are identity at eval time and omitted.
Parity oracle: the installed transformers implementation
(tests/test_mobilevitv2.py builds a randomly-initialized torch model and
compares logits).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from flairtpu.models.mobilevit import ConvBN, InvertedResidual
from flairtpu.models.swin_upernet import _conv_w, _put, _resize

_LN_EPS = 1e-5


def _make_divisible(value: float, divisor: int = 8,
                    min_value: int | None = None) -> int:
    """modeling_mobilevitv2.make_divisible (TF slim channel rounding)."""
    if min_value is None:
        min_value = divisor
    new_value = max(min_value, int(value + divisor / 2) // divisor * divisor)
    if new_value < 0.9 * value:
        new_value += divisor
    return int(new_value)


def mobilevitv2_dims(w: float) -> dict:
    """Per-stage channel plan for a width multiplier (MobileViTV2Encoder)."""
    return dict(
        layer0=_make_divisible(min(max(32 * w, 16), 64), 8, min_value=16),
        layers=(_make_divisible(64 * w, 16), _make_divisible(128 * w, 8),
                _make_divisible(256 * w, 8), _make_divisible(384 * w, 8),
                _make_divisible(512 * w, 8)),
        attn=tuple(_make_divisible(d * w, 8) for d in (128, 192, 256)),
    )


def _group_norm1(name: str):
    # torch GroupNorm(num_groups=1): normalize over (C, P, N) per sample,
    # per-channel affine — flax GroupNorm has identical semantics
    return nn.GroupNorm(num_groups=1, epsilon=_LN_EPS, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)


class LinearSelfAttention(nn.Module):
    """MobileViTV2LinearSelfAttention on (B, P, N, C) patches."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dense = lambda n, f: nn.Dense(f, dtype=self.dtype,
                                      param_dtype=jnp.float32, name=n)
        qkv = dense("qkv", 1 + 2 * self.dim)(x)
        query = qkv[..., :1]                       # (B, P, N, 1)
        key = qkv[..., 1:1 + self.dim]             # (B, P, N, C)
        value = qkv[..., 1 + self.dim:]
        # softmax over the patch axis N (torch dim=-1 on (B, C, P, N))
        scores = jax.nn.softmax(query.astype(jnp.float32), axis=2).astype(self.dtype)
        context = jnp.sum(key * scores, axis=2, keepdims=True)  # (B, P, 1, C)
        out = jax.nn.relu(value) * context
        return dense("out", self.dim)(out)


class SeparableTransformerLayer(nn.Module):
    """MobileViTV2TransformerLayer: GN1 -> linear attn -> +; GN1 -> FFN -> +."""

    dim: int
    ffn_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = _group_norm1("ln1")(x).astype(self.dtype)
        x = x + LinearSelfAttention(self.dim, dtype=self.dtype, name="attn")(y)
        y = _group_norm1("ln2")(x).astype(self.dtype)
        y = jax.nn.silu(nn.Dense(self.ffn_dim, dtype=self.dtype,
                                 param_dtype=jnp.float32, name="fc1")(y))
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(y)
        return x + y


def _unfold_v2(x: jax.Array, p: int):
    """(B, H, W, C) -> (B, P=p*p, N=nh*nw, C), torch-unfold pixel ordering."""
    B, H, W, C = x.shape
    assert H % p == 0 and W % p == 0, (
        f"feature map {H}x{W} not divisible by patch size {p}")
    nh, nw = H // p, W // p
    x = x.reshape(B, nh, p, nw, p, C)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (B, p, p, nh, nw, C)
    return x.reshape(B, p * p, nh * nw, C), (nh, nw)


def _fold_v2(patches: jax.Array, nh: int, nw: int, p: int) -> jax.Array:
    B, _, _, C = patches.shape
    x = patches.reshape(B, p, p, nh, nw, C).transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(B, nh * p, nw * p, C)


class MobileViTV2Block(nn.Module):
    """MobileViTV2Layer: IR downsample -> depthwise kxk + 1x1 -> separable
    transformer over (P, N) patches -> GN -> fold -> 1x1 projection."""

    features: int       # stage output channels
    attn_dim: int
    depth: int
    dilation: int = 1
    patch: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = InvertedResidual(
            self.features, stride=2 if self.dilation == 1 else 1,
            dilation=self.dilation // 2 if self.dilation > 1 else 1,
            expand_ratio=2.0, dtype=self.dtype, name="down")(x, train)
        y = ConvBN(self.features, kernel=3, groups=self.features,
                   dtype=self.dtype, name="conv_kxk")(x, train)
        y = ConvBN(self.attn_dim, kernel=1, act=None, norm=False,
                   dtype=self.dtype, name="conv_1x1")(y, train)
        p, (nh, nw) = _unfold_v2(y, self.patch)
        ffn_dim = int((2 * self.attn_dim // 16) * 16)  # ffn_multiplier 2
        for k in range(self.depth):
            p = SeparableTransformerLayer(self.attn_dim, ffn_dim,
                                          dtype=self.dtype, name=f"tf{k}")(p)
        p = _group_norm1("ln")(p).astype(self.dtype)
        y = _fold_v2(p, nh, nw, self.patch)
        return ConvBN(self.features, kernel=1, act=None, dtype=self.dtype,
                      name="conv_proj")(y, train)


class MobileViTV2Backbone(nn.Module):
    """conv_stem + 5 stages; returns the final stride-``output_stride`` map."""

    width: float = 1.0
    output_stride: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dims = mobilevitv2_dims(self.width)
        l1, l2, l3, l4, l5 = dims["layers"]
        a3, a4, a5 = dims["attn"]
        x = ConvBN(dims["layer0"], kernel=3, stride=2, dtype=self.dtype,
                   name="stem")(x, train)
        x = InvertedResidual(l1, stride=1, expand_ratio=2.0, dtype=self.dtype,
                             name="layer0_block0")(x, train)
        for j in range(2):
            x = InvertedResidual(l2, stride=2 if j == 0 else 1,
                                 expand_ratio=2.0, dtype=self.dtype,
                                 name=f"layer1_block{j}")(x, train)
        dilate4 = self.output_stride == 8
        dilate5 = self.output_stride in (8, 16)
        dilation = 1
        x = MobileViTV2Block(l3, a3, depth=2, dtype=self.dtype,
                             name="layer2")(x, train)
        if dilate4:
            dilation *= 2
        x = MobileViTV2Block(l4, a4, depth=4, dilation=dilation,
                             dtype=self.dtype, name="layer3")(x, train)
        if dilate5:
            dilation *= 2
        x = MobileViTV2Block(l5, a5, depth=3, dilation=dilation,
                             dtype=self.dtype, name="layer4")(x, train)
        return x


class MobileViTV2Seg(nn.Module):
    """MobileViTV2ForSemanticSegmentation: backbone -> ASPP(512) -> classifier.

    ``output_stride`` 16 matches the published ml-cvnets DeepLabV3 geometry
    (the parameter set is stride-independent, as with MobileViT v1).
    """

    width: float = 1.0
    classes: int = 13
    use_metadata: bool = False  # HF provider has no metadata path
    output_stride: int = 16
    atrous_rates: tuple[int, ...] = (6, 12, 18)
    aspp_channels: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mtd=None, train: bool = False) -> jax.Array:
        del mtd  # metadata fusion is a resnet-unet (smp provider) feature
        B, H, W, _ = x.shape
        f = MobileViTV2Backbone(self.width, self.output_stride,
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
# transformers MobileViTV2ForSemanticSegmentation state dict -> Flax variables
# ---------------------------------------------------------------------------

def _put_convbn(params: dict, stats: dict, base: tuple, rest: list,
                arr: np.ndarray) -> None:
    """MobileViTV2ConvLayer keys (convolution.*/normalization.*) -> ConvBN."""
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
    sub = {"expand_1x1": "expand", "conv_3x3": "dw", "reduce_1x1": "reduce"}
    _put_convbn(params, stats, base + (sub[rest[0]],), rest[1:], arr)


def _dense_from_1x1(arr: np.ndarray) -> np.ndarray:
    """torch 1x1-conv weight (O, I, 1, 1) -> flax Dense kernel (I, O)."""
    return arr[:, :, 0, 0].T


def hf_mobilevitv2_torch_to_flax(sd: dict[str, np.ndarray]) -> dict:
    """Key-exact converter (MobileViTV2ForSemanticSegmentation layout)."""
    params: dict = {}
    stats: dict = {}
    n_aspp = 1 + max((int(k.split(".")[3]) for k in sd
                      if k.startswith("segmentation_head.aspp.convs.")),
                     default=4)

    for key, arr in sd.items():
        arr = np.asarray(arr)
        parts = key.split(".")
        if key.endswith("num_batches_tracked"):
            continue
        if key.startswith("mobilevitv2.conv_stem."):
            _put_convbn(params, stats, ("backbone", "stem"), parts[2:], arr)
            continue
        if key.startswith("mobilevitv2.encoder.layer."):
            i, rest = int(parts[3]), parts[4:]
            if i in (0, 1):  # MobileNetLayer: .layer.<j>.<ir keys>
                base = ("backbone", f"layer{i}_block{rest[1]}")
                _put_ir(params, stats, base, rest[2:], arr)
                continue
            base = ("backbone", f"layer{i}")
            if rest[0] == "downsampling_layer":
                _put_ir(params, stats, base + ("down",), rest[1:], arr)
            elif rest[0] in ("conv_kxk", "conv_1x1", "conv_projection"):
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
                elif trest[:2] == ["attention", "qkv_proj"]:
                    _put(params, tbase + ("attn", "qkv",
                                          "kernel" if trest[3] == "weight" else "bias"),
                         _dense_from_1x1(arr) if trest[3] == "weight" else arr)
                elif trest[:2] == ["attention", "out_proj"]:
                    _put(params, tbase + ("attn", "out",
                                          "kernel" if trest[3] == "weight" else "bias"),
                         _dense_from_1x1(arr) if trest[3] == "weight" else arr)
                elif trest[:2] == ["ffn", "conv1"]:
                    _put(params, tbase + ("fc1",
                                          "kernel" if trest[3] == "weight" else "bias"),
                         _dense_from_1x1(arr) if trest[3] == "weight" else arr)
                elif trest[:2] == ["ffn", "conv2"]:
                    _put(params, tbase + ("fc2",
                                          "kernel" if trest[3] == "weight" else "bias"),
                         _dense_from_1x1(arr) if trest[3] == "weight" else arr)
                else:
                    raise KeyError(f"unrecognized transformer key {key!r}")
            elif rest[0] == "layernorm":
                _put(params, base + ("ln",
                                     "scale" if rest[1] == "weight" else "bias"),
                     arr)
            else:
                raise KeyError(f"unrecognized mobilevitv2 layer key {key!r}")
            continue
        if key.startswith("segmentation_head.aspp.convs."):
            i, rest = int(parts[3]), parts[4:]
            if i == 0:
                _put_convbn(params, stats, ("aspp_in",), rest, arr)
            elif i == n_aspp - 1:  # ASPPPooling wraps its conv in conv_1x1
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
        raise KeyError(f"unrecognized mobilevitv2 checkpoint key {key!r}")

    return {"params": params, "batch_stats": stats}
