"""Flax SegFormer — the HuggingFace-provider model family.

The reference's HF path wraps torch ``AutoModelForSemanticSegmentation``
(reference src/flair/model.py:43-50, zone_detect/model.py:40-49). This module
reimplements the SegFormer family (MiT-b0..b5 encoders + all-MLP decode head,
matching transformers' SegformerForSemanticSegmentation numerics) in Flax, plus
a converter from HF torch state dicts so local ``.pth``/``.ckpt`` HF
checkpoints load. Pretrained-hub downloads are not assumed (this environment
has no egress); models build from the known family geometry and load local
weights or train from scratch.

One documented deviation: HF SegFormer emits logits at 1/4 resolution and the
reference uses them as-is (breaking its own zone stitching shapes);
``upsample_logits=True`` (default) bilinearly upsamples to input resolution so
patch prediction and zone stitching are well-defined.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# (hidden dims, depths, heads, sr ratios, decoder dim)
SEGFORMER_SPECS: dict[str, dict] = {
    "b0": dict(dims=(32, 64, 160, 256), depths=(2, 2, 2, 2),
               heads=(1, 2, 5, 8), srs=(8, 4, 2, 1), dec=256),
    "b1": dict(dims=(64, 128, 320, 512), depths=(2, 2, 2, 2),
               heads=(1, 2, 5, 8), srs=(8, 4, 2, 1), dec=256),
    "b2": dict(dims=(64, 128, 320, 512), depths=(3, 4, 6, 3),
               heads=(1, 2, 5, 8), srs=(8, 4, 2, 1), dec=768),
    "b3": dict(dims=(64, 128, 320, 512), depths=(3, 4, 18, 3),
               heads=(1, 2, 5, 8), srs=(8, 4, 2, 1), dec=768),
    "b4": dict(dims=(64, 128, 320, 512), depths=(3, 8, 27, 3),
               heads=(1, 2, 5, 8), srs=(8, 4, 2, 1), dec=768),
    "b5": dict(dims=(64, 128, 320, 512), depths=(3, 6, 40, 3),
               heads=(1, 2, 5, 8), srs=(8, 4, 2, 1), dec=768),
}

_LN_EPS = 1e-6  # transformers SegformerConfig.layer_norm_eps
_BN_EPS = 1e-5


def _dense(features, name, dtype):
    return nn.Dense(features, dtype=dtype, param_dtype=jnp.float32, name=name)


def _ln(name, dtype):
    return nn.LayerNorm(epsilon=_LN_EPS, dtype=dtype, param_dtype=jnp.float32,
                        name=name)


class OverlapPatchEmbed(nn.Module):
    dim: int
    kernel: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C) -> (B, H', W', dim)
        p = self.kernel // 2
        x = nn.Conv(self.dim, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), dtype=self.dtype,
                    param_dtype=jnp.float32, name="proj")(x)
        return _ln("norm", self.dtype)(x)


class EfficientSelfAttention(nn.Module):
    dim: int
    heads: int
    sr: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, dim)
        B, H, W, C = x.shape
        hd = C // self.heads
        q = _dense(C, "query", self.dtype)(x).reshape(B, H * W, self.heads, hd)

        kv_in = x
        if self.sr > 1:
            kv_in = nn.Conv(C, (self.sr, self.sr), strides=(self.sr, self.sr),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name="sr")(x)
            kv_in = _ln("sr_norm", self.dtype)(kv_in)
        N2 = kv_in.shape[1] * kv_in.shape[2]
        k = _dense(C, "key", self.dtype)(kv_in).reshape(B, N2, self.heads, hd)
        v = _dense(C, "value", self.dtype)(kv_in).reshape(B, N2, self.heads, hd)

        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(hd).astype(q.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, H, W, C)
        return _dense(C, "out", self.dtype)(out)


class MixFFN(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, dim)
        h = _dense(self.dim * 4, "dense1", self.dtype)(x)
        h = nn.Conv(self.dim * 4, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=self.dim * 4, dtype=self.dtype,
                    param_dtype=jnp.float32, name="dwconv")(h)
        h = jax.nn.gelu(h, approximate=False)
        return _dense(self.dim, "dense2", self.dtype)(h)


class SegformerBlock(nn.Module):
    dim: int
    heads: int
    sr: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x + EfficientSelfAttention(self.dim, self.heads, self.sr,
                                       self.dtype, name="attn")(
            _ln("norm1", self.dtype)(x))
        x = x + MixFFN(self.dim, self.dtype, name="mlp")(
            _ln("norm2", self.dtype)(x))
        return x


class MiTEncoder(nn.Module):
    spec: str = "b0"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> list[jax.Array]:
        cfg = SEGFORMER_SPECS[self.spec]
        feats = []
        for i, (dim, depth, heads, sr) in enumerate(
                zip(cfg["dims"], cfg["depths"], cfg["heads"], cfg["srs"])):
            x = OverlapPatchEmbed(dim, kernel=7 if i == 0 else 3,
                                  stride=4 if i == 0 else 2, dtype=self.dtype,
                                  name=f"embed{i}")(x)
            for j in range(depth):
                x = SegformerBlock(dim, heads, sr, self.dtype,
                                   name=f"block{i}_{j}")(x)
            x = _ln(f"norm{i}", self.dtype)(x)
            feats.append(x)
        return feats


class SegformerDecodeHead(nn.Module):
    classes: int
    dec_dim: int
    dtype: Any = jnp.float32
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feats: list[jax.Array], train: bool = False):
        B, H4, W4, _ = feats[0].shape
        projected = []
        for i, f in enumerate(feats):
            p = _dense(self.dec_dim, f"linear_c{i}", self.dtype)(f)
            if p.shape[1:3] != (H4, W4):
                p = jax.image.resize(p, (B, H4, W4, self.dec_dim), "bilinear")
            projected.append(p)
        x = jnp.concatenate(projected[::-1], axis=-1)  # HF concat order
        x = nn.Conv(self.dec_dim, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="linear_fuse")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=_BN_EPS, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="batch_norm")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Conv(self.classes, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="classifier")(x)


class SegformerModel(nn.Module):
    """Drop-in peer of FlairSegmentationModel for the HF provider."""

    spec: str = "b0"
    classes: int = 19
    upsample_logits: bool = True
    use_metadata: bool = False  # HF provider has no metadata path (reference parity)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mtd=None, train: bool = False):
        B, H, W, _ = x.shape
        feats = MiTEncoder(self.spec, self.dtype, name="encoder")(
            x.astype(self.dtype))
        logits = SegformerDecodeHead(
            self.classes, SEGFORMER_SPECS[self.spec]["dec"], self.dtype,
            name="decode_head")(feats, train=train)
        logits = logits.astype(jnp.float32)
        if self.upsample_logits and logits.shape[1:3] != (H, W):
            logits = jax.image.resize(logits, (B, H, W, self.classes), "bilinear")
        return logits


def create_hf_model(org_model: str, n_classes: int, dtype, remat: bool = False,
                    remat_policy: str | None = None):
    """Build the Flax port for an HF org/model string.

    Name classification lives in flairtpu.models.registry (shared with
    config-time validation); this function only constructs. ``remat``
    currently applies to the BEiT/Data2Vec family (the largest backbones —
    beit-large training at 512^2 OOMs a 16 GB chip without it); the other
    families fit comfortably and ignore it.
    """
    from flairtpu.models.registry import hf_family

    family, spec = hf_family(org_model)
    name = org_model.lower()
    if family == "dpt":
        from flairtpu.models.dpt import DPTSeg

        # the ADE seg release was trained at 480^2 (grid 30); others at 384^2
        return DPTSeg(spec=spec, classes=n_classes, hybrid=spec == "hybrid",
                      trained_grid=30 if "ade" in name else 24, dtype=dtype)
    if family == "mobilenet_v2":
        from flairtpu.models.mobilenet_v2 import MobileNetV2Seg

        return MobileNetV2Seg(classes=n_classes, depth_multiplier=float(spec),
                              dtype=dtype)
    if family == "mobilevit":
        from flairtpu.models.mobilevit import MOBILEVIT_SPECS, MobileViTSeg

        assert spec in MOBILEVIT_SPECS
        return MobileViTSeg(spec=spec, classes=n_classes, dtype=dtype)
    if family == "mobilevitv2":
        from flairtpu.models.mobilevitv2 import MobileViTV2Seg

        return MobileViTV2Seg(width=float(spec), classes=n_classes, dtype=dtype)
    if family == "beit":
        # Data2Vec-Vision is an architectural twin of BEiT in transformers
        # (modeling_data2vec_vision.py is copied module-for-module from
        # modeling_beit.py), so both map onto BeitUperNet.
        from flairtpu.models.beit_upernet import BeitUperNet

        return BeitUperNet(spec=spec, classes=n_classes, remat=remat,
                           remat_policy=remat_policy, dtype=dtype)
    if family == "swin":
        from flairtpu.models.swin_upernet import SwinUperNet

        return SwinUperNet(spec=spec, classes=n_classes, dtype=dtype)
    if family == "convnext":
        from flairtpu.models.convnext_upernet import ConvNextUperNet

        return ConvNextUperNet(spec=spec, classes=n_classes, dtype=dtype)
    assert family == "segformer", family
    return SegformerModel(spec=spec, classes=n_classes, dtype=dtype)


# ---------------------------------------------------------------------------
# HF torch state dict -> Flax variables
# ---------------------------------------------------------------------------

def hf_torch_to_flax(sd: dict[str, np.ndarray]) -> dict:
    """Map transformers' SegformerForSemanticSegmentation keys to our tree."""
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def conv_w(a):
        return np.transpose(a, (2, 3, 1, 0))

    def dense_w(a):
        return a.T

    for key, arr in sd.items():
        arr = np.asarray(arr)
        key = key.replace("segformer.", "")
        parts = key.split(".")
        # encoder.patch_embeddings.{i}.{proj|layer_norm}.*
        if key.startswith("encoder.patch_embeddings."):
            i, mod, leaf = parts[2], parts[3], parts[4]
            dest = ("encoder", f"embed{i}", "proj" if mod == "proj" else "norm")
            if mod == "proj":
                put(params, dest + ("kernel" if leaf == "weight" else "bias",),
                    conv_w(arr) if leaf == "weight" else arr)
            else:
                put(params, dest + ("scale" if leaf == "weight" else "bias",), arr)
            continue
        # encoder.block.{i}.{j}....
        if key.startswith("encoder.block."):
            i, j = parts[2], parts[3]
            rest = parts[4:]
            base = ("encoder", f"block{i}_{j}")
            if rest[0] in ("layer_norm_1", "layer_norm_2"):
                name = "norm1" if rest[0] == "layer_norm_1" else "norm2"
                put(params, base + (name, "scale" if rest[1] == "weight" else "bias"),
                    arr)
            elif rest[0] == "attention":
                if rest[1] == "self":
                    sub = rest[2]
                    if sub in ("query", "key", "value"):
                        put(params, base + ("attn", sub,
                                            "kernel" if rest[3] == "weight" else "bias"),
                            dense_w(arr) if rest[3] == "weight" else arr)
                    elif sub == "sr":
                        put(params, base + ("attn", "sr",
                                            "kernel" if rest[3] == "weight" else "bias"),
                            conv_w(arr) if rest[3] == "weight" else arr)
                    elif sub == "layer_norm":
                        put(params, base + ("attn", "sr_norm",
                                            "scale" if rest[3] == "weight" else "bias"),
                            arr)
                else:  # attention.output.dense
                    put(params, base + ("attn", "out",
                                        "kernel" if rest[3] == "weight" else "bias"),
                        dense_w(arr) if rest[3] == "weight" else arr)
            elif rest[0] == "mlp":
                if rest[1] in ("dense1", "dense2"):
                    put(params, base + ("mlp", rest[1],
                                        "kernel" if rest[2] == "weight" else "bias"),
                        dense_w(arr) if rest[2] == "weight" else arr)
                else:  # mlp.dwconv.dwconv
                    leaf = rest[-1]
                    # torch depthwise (C_out, 1, kh, kw) -> flax (kh, kw, 1, C_out)
                    put(params, base + ("mlp", "dwconv",
                                        "kernel" if leaf == "weight" else "bias"),
                        np.transpose(arr, (2, 3, 1, 0)) if leaf == "weight" else arr)
            continue
        # encoder.layer_norm.{i}.*
        if key.startswith("encoder.layer_norm."):
            i, leaf = parts[2], parts[3]
            put(params, ("encoder", f"norm{i}",
                         "scale" if leaf == "weight" else "bias"), arr)
            continue
        # decode_head.*
        if key.startswith("decode_head."):
            rest = parts[1:]
            if rest[0] == "linear_c":
                i, leaf = rest[1], rest[3]
                put(params, ("decode_head", f"linear_c{i}",
                             "kernel" if leaf == "weight" else "bias"),
                    dense_w(arr) if leaf == "weight" else arr)
            elif rest[0] == "linear_fuse":
                put(params, ("decode_head", "linear_fuse", "kernel"), conv_w(arr))
            elif rest[0] == "batch_norm":
                leaf = rest[1]
                if leaf in ("weight", "bias"):
                    put(params, ("decode_head", "batch_norm",
                                 "scale" if leaf == "weight" else "bias"), arr)
                elif leaf == "running_mean":
                    put(stats, ("decode_head", "batch_norm", "mean"), arr)
                elif leaf == "running_var":
                    put(stats, ("decode_head", "batch_norm", "var"), arr)
            elif rest[0] == "classifier":
                leaf = rest[1]
                put(params, ("decode_head", "classifier",
                             "kernel" if leaf == "weight" else "bias"),
                    conv_w(arr) if leaf == "weight" else arr)
            continue
        if key.endswith("num_batches_tracked") or key.startswith("criterion."):
            continue
        raise KeyError(f"unrecognized HF checkpoint key {key!r}")

    return {"params": params, "batch_stats": stats}
