"""Flax BEiT backbone + UperNet head (HF-provider family).

Extends the HuggingFace-provider zoo (reference src/flair/model.py:43-50 loads
any ``AutoModelForSemanticSegmentation``; ``microsoft/beit-*-finetuned-ade-*``
instantiates ``BeitForSemanticSegmentation``) with transformers' BEiT numerics
in Flax NHWC:

- ViT encoder with pre-LN blocks, per-layer decomposed relative position bias
  (table of (2w-1)^2 + 3 entries: window pairs + cls-to-token / token-to-cls /
  cls-to-cls), layer-scale lambdas, k-projection without bias;
- checkpoint-window -> runtime-window bias-table interpolation (bilinear,
  matching BeitRelativePositionBias.forward) so 640-trained ADE checkpoints
  run on 512^2 FLAIR patches;
- the 4-level FPN adapter (fpn1: convT 2x2/2 + BN + exact-GELU + convT;
  fpn2: convT; fpn3: identity; fpn4: maxpool 2/2) over the hidden states
  selected by ``out_indices`` (HF indexes hidden_states by idx+1, i.e. the
  outputs of 0-based layers {i-2 for i in out_indices});
- the UperNet/FCN heads reuse flairtpu.models.swin_upernet modules with
  channels = hidden_size (BeitUperHead convention).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from flairtpu.models.swin_upernet import (
    FCNAuxHead,
    UperNetHead,
    _conv_w,
    _dense,
    _put,
    _resize,
)

BEIT_SPECS = {
    "base": dict(hidden=768, layers=12, heads=12, intermediate=3072,
                 out_indices=(3, 5, 7, 11)),
    "large": dict(hidden=1024, layers=24, heads=16, intermediate=4096,
                  out_indices=(7, 11, 15, 23)),
}

_LN_EPS = 1e-12  # BeitConfig.layer_norm_eps
_BN_EPS = 1e-5


def _ln12(name):
    return nn.LayerNorm(epsilon=_LN_EPS, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)


def beit_relative_position_index(wh: int, ww: int) -> np.ndarray:
    """(wh*ww+1, wh*ww+1) index into the bias table (modeling_beit.py
    generate_relative_position_index, incl. the 3 cls entries)."""
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    area = wh * ww
    index = np.zeros((area + 1, area + 1), np.int64)
    index[1:, 1:] = rel.sum(-1)
    index[0, 0:] = num_rel - 3
    index[0:, 0] = num_rel - 2
    index[0, 0] = num_rel - 1
    return index


class BeitRelPosBias(nn.Module):
    """Per-layer decomposed relative position bias with window interpolation."""

    heads: int
    trained_window: int  # window size the checkpoint's table was trained at

    @nn.compact
    def __call__(self, window: int) -> jax.Array:
        tw = self.trained_window
        table = self.param("table", nn.initializers.zeros,
                           ((2 * tw - 1) ** 2 + 3, self.heads), jnp.float32)
        if window != tw:
            # bilinear-resize the window-pair part, keep the 3 cls entries
            # (modeling_beit.py BeitRelativePositionBias.forward)
            old = table[:-3].reshape(1, 2 * tw - 1, 2 * tw - 1, self.heads)
            new = jax.image.resize(
                old, (1, 2 * window - 1, 2 * window - 1, self.heads),
                "bilinear", antialias=False)
            table = jnp.concatenate(
                [new.reshape(-1, self.heads), table[-3:]], axis=0)
        idx = beit_relative_position_index(window, window).reshape(-1)
        n = window * window + 1
        bias = table[idx].reshape(n, n, self.heads)
        return bias.transpose(2, 0, 1)  # (heads, N+1, N+1)


class BeitAttention(nn.Module):
    dim: int
    heads: int
    trained_window: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, window: int) -> jax.Array:
        B, N, C = x.shape
        hd = C // self.heads
        q = _dense(C, "query", self.dtype)(x).reshape(B, N, self.heads, hd)
        k = _dense(C, "key", self.dtype, use_bias=False)(x).reshape(
            B, N, self.heads, hd)
        v = _dense(C, "value", self.dtype)(x).reshape(B, N, self.heads, hd)
        scores = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(hd).astype(q.dtype)
        bias = BeitRelPosBias(self.heads, self.trained_window,
                              name="rel_bias")(window)
        scores = scores.astype(jnp.float32) + bias[None]
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", probs, v).reshape(B, N, C)
        return _dense(C, "proj", self.dtype)(out)


class BeitLayer(nn.Module):
    dim: int
    heads: int
    intermediate: int
    trained_window: int
    layer_scale_init: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, window: int) -> jax.Array:
        lam1 = self.param("lambda_1",
                          nn.initializers.constant(self.layer_scale_init),
                          (self.dim,), jnp.float32)
        lam2 = self.param("lambda_2",
                          nn.initializers.constant(self.layer_scale_init),
                          (self.dim,), jnp.float32)
        y = _ln12("ln_before")(x).astype(self.dtype)
        y = BeitAttention(self.dim, self.heads, self.trained_window,
                          self.dtype, name="attn")(y, window)
        x = x + (lam1 * y).astype(x.dtype)
        y = _ln12("ln_after")(x).astype(self.dtype)
        y = _dense(self.intermediate, "mlp_fc1", self.dtype)(y)
        y = jax.nn.gelu(y, approximate=False)
        y = _dense(self.dim, "mlp_fc2", self.dtype)(y)
        return x + (lam2 * y).astype(x.dtype)


class TransposeConv2x2(nn.Module):
    """torch ConvTranspose2d(kernel=2, stride=2) exact equivalent (no overlap:
    out[2h+p, 2w+q] = sum_c x[h,w,c] * W[p,q,c,:] + b)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, C, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        y = jnp.einsum("bhwc,pqcd->bhpwqd", x.astype(self.dtype),
                       kernel.astype(self.dtype))
        y = y.reshape(B, 2 * H, 2 * W, self.features)
        return y + bias.astype(y.dtype)


class BeitBackbone(nn.Module):
    """ViT trunk returning the out_indices token sequences (cls included)."""

    hidden: int
    layers: int
    heads: int
    intermediate: int
    out_indices: Sequence[int]
    trained_window: int
    # rematerialize each transformer layer on backward (nn.remat): activation
    # memory drops from O(layers) to O(1) layers — required to train
    # beit-large at 512^2 on a 16 GB chip
    remat: bool = False
    # jax.checkpoint_policies name for SELECTIVE remat (e.g. "dots_saveable"
    # saves every matmul output and only recomputes the cheap elementwise/
    # norm/softmax ops — the standard TPU transformer remat; full remat of
    # attention measured pathologically slow on this toolchain,
    # PERFORMANCE.md). None = save nothing (full recompute).
    remat_policy: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        B, H, W, _ = x.shape
        window = H // 16
        x = nn.Conv(self.hidden, (16, 16), strides=(16, 16), dtype=self.dtype,
                    param_dtype=jnp.float32, name="patch_embed")(
                        x.astype(self.dtype))
        x = x.reshape(B, -1, self.hidden)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.hidden), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype),
                                              (B, 1, self.hidden)), x], axis=1)
        # HF picks hidden_states[idx] for idx+1 in out_indices; hidden_states[i]
        # is the INPUT to layer i, so these are outputs of layers out_indices-2
        wanted = {i - 2 for i in self.out_indices}
        feats = []
        if self.remat:
            policy = (getattr(jax.checkpoint_policies, self.remat_policy)
                      if self.remat_policy else None)
            layer_cls = nn.remat(BeitLayer, static_argnums=(2,),  # (self, x, window)
                                 policy=policy)
        else:
            layer_cls = BeitLayer
        for i in range(self.layers):
            x = layer_cls(self.hidden, self.heads, self.intermediate,
                          self.trained_window, dtype=self.dtype,
                          name=f"layer{i}")(x, window)
            if i in wanted:
                feats.append(x)
        return feats


class BeitUperNet(nn.Module):
    """BeitForSemanticSegmentation peer model (NHWC, bf16-friendly)."""

    spec: str = "base"
    classes: int = 19
    with_aux_head: bool = True
    use_metadata: bool = False  # HF provider has no metadata path
    trained_window: int = 40  # beit-*-finetuned-ade trained at 640/16
    hidden: int | None = None
    layers: int | None = None
    heads: int | None = None
    intermediate: int | None = None
    out_indices: Sequence[int] | None = None
    aux_channels: int = 256
    remat: bool = False  # rematerialize transformer layers (see BeitBackbone)
    remat_policy: str | None = None  # selective-remat policy (BeitBackbone)
    dtype: Any = jnp.float32

    def _cfg(self):
        base = dict(BEIT_SPECS[self.spec])
        for k in ("hidden", "layers", "heads", "intermediate", "out_indices"):
            v = getattr(self, k)
            if v is not None:
                base[k] = v
        return base

    @nn.compact
    def __call__(self, x, mtd=None, train: bool = False, return_aux: bool = False):
        cfg = self._cfg()
        B, H, W, _ = x.shape
        pr_h, pr_w = H // 16, W // 16
        tokens = BeitBackbone(cfg["hidden"], cfg["layers"], cfg["heads"],
                              cfg["intermediate"], cfg["out_indices"],
                              self.trained_window, remat=self.remat,
                              remat_policy=self.remat_policy,
                              dtype=self.dtype, name="backbone")(x)
        maps = [t[:, 1:, :].reshape(B, pr_h, pr_w, cfg["hidden"])
                for t in tokens]
        # FPN adapter: 4x, 2x, 1x, 0.5x
        m0 = TransposeConv2x2(cfg["hidden"], self.dtype, name="fpn1_up1")(maps[0])
        m0 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=_BN_EPS, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="fpn1_bn")(m0)
        m0 = jax.nn.gelu(m0, approximate=False).astype(self.dtype)
        m0 = TransposeConv2x2(cfg["hidden"], self.dtype, name="fpn1_up2")(m0)
        m1 = TransposeConv2x2(cfg["hidden"], self.dtype, name="fpn2_up")(maps[1])
        m2 = maps[2]
        m3 = nn.max_pool(maps[3], (2, 2), strides=(2, 2))
        feats = [m0, m1, m2, m3]
        logits = UperNetHead(self.classes, channels=cfg["hidden"],
                             dtype=self.dtype, name="decode_head")(
                                 feats, train=train)
        logits = _resize(logits.astype(jnp.float32), (H, W))
        if self.with_aux_head:
            aux = FCNAuxHead(self.classes, channels=self.aux_channels,
                             dtype=self.dtype, name="auxiliary_head")(
                                 feats, train=train)
            if return_aux:
                return logits, _resize(aux.astype(jnp.float32), (H, W))
        return logits


# ---------------------------------------------------------------------------
# HF torch state dict -> Flax variables
# ---------------------------------------------------------------------------

def _put_convmodule(params, stats, base, rest, arr):
    """BeitConvModule: conv + bn (HF attribute is 'bn', UperNet's is
    'batch_norm' — accept both)."""
    if rest[0] == "conv":
        _put(params, base + ("conv", "kernel"), _conv_w(arr))
    elif rest[0] in ("bn", "batch_norm"):
        leaf = rest[1]
        if leaf == "weight":
            _put(params, base + ("bn", "scale"), arr)
        elif leaf == "bias":
            _put(params, base + ("bn", "bias"), arr)
        elif leaf == "running_mean":
            _put(stats, base + ("bn", "mean"), arr)
        elif leaf == "running_var":
            _put(stats, base + ("bn", "var"), arr)


def hf_beit_torch_to_flax(sd: dict[str, np.ndarray]) -> dict:
    """transformers BeitForSemanticSegmentation state dict -> Flax variables.

    Also accepts Data2VecVisionForSemanticSegmentation checkpoints: the
    transformers module is a verbatim architectural twin of BEiT (modules
    copied via ``# Copied from ...Beit``), differing only in the
    ``data2vec_vision.`` key prefix, which is normalized to ``beit.`` here.
    """
    sd = {k.replace("data2vec_vision.", "beit.", 1): v for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}

    def tconv_w(a):  # ConvTranspose2d (in, out, kh, kw) -> (kh, kw, in, out)
        return np.transpose(a, (2, 3, 0, 1))

    for key, arr in sd.items():
        arr = np.asarray(arr)
        parts = key.split(".")
        if key.endswith("num_batches_tracked"):
            continue
        if key == "beit.embeddings.cls_token":
            _put(params, ("backbone", "cls_token"), arr)
            continue
        if key.startswith("beit.embeddings.patch_embeddings.projection."):
            leaf = parts[-1]
            _put(params, ("backbone", "patch_embed",
                          "kernel" if leaf == "weight" else "bias"),
                 _conv_w(arr) if leaf == "weight" else arr)
            continue
        if key.startswith("beit.encoder.layer."):
            i, rest = parts[3], parts[4:]
            base = ("backbone", f"layer{i}")
            if rest[0] == "layernorm_before":
                _put(params, base + ("ln_before",
                                     "scale" if rest[1] == "weight" else "bias"), arr)
            elif rest[0] == "layernorm_after":
                _put(params, base + ("ln_after",
                                     "scale" if rest[1] == "weight" else "bias"), arr)
            elif rest[0] in ("lambda_1", "lambda_2"):
                _put(params, base + (rest[0],), arr)
            elif rest[:2] == ["attention", "attention"]:
                if rest[2] == "relative_position_bias":
                    _put(params, base + ("attn", "rel_bias", "table"), arr)
                else:  # query/key/value
                    _put(params, base + ("attn", rest[2],
                                         "kernel" if rest[3] == "weight" else "bias"),
                         arr.T if rest[3] == "weight" else arr)
            elif rest[:2] == ["attention", "output"]:
                _put(params, base + ("attn", "proj",
                                     "kernel" if rest[3] == "weight" else "bias"),
                     arr.T if rest[3] == "weight" else arr)
            elif rest[0] == "intermediate":
                _put(params, base + ("mlp_fc1",
                                     "kernel" if rest[2] == "weight" else "bias"),
                     arr.T if rest[2] == "weight" else arr)
            elif rest[0] == "output":
                _put(params, base + ("mlp_fc2",
                                     "kernel" if rest[2] == "weight" else "bias"),
                     arr.T if rest[2] == "weight" else arr)
            else:
                raise KeyError(f"unrecognized beit layer key {key!r}")
            continue
        if key.startswith("beit.layernorm"):
            continue  # identity when use_mean_pooling (segmentation configs)
        if key.startswith("fpn1.0."):
            _put(params, ("fpn1_up1", "kernel" if parts[-1] == "weight" else "bias"),
                 tconv_w(arr) if parts[-1] == "weight" else arr)
            continue
        if key.startswith("fpn1.1."):  # BatchNorm
            leaf = parts[-1]
            tgt = {"weight": ("scale", params), "bias": ("bias", params),
                   "running_mean": ("mean", stats), "running_var": ("var", stats)}
            name, tree = tgt[leaf]
            _put(tree, ("fpn1_bn", name), arr)
            continue
        if key.startswith("fpn1.3."):
            _put(params, ("fpn1_up2", "kernel" if parts[-1] == "weight" else "bias"),
                 tconv_w(arr) if parts[-1] == "weight" else arr)
            continue
        if key.startswith("fpn2.0."):
            _put(params, ("fpn2_up", "kernel" if parts[-1] == "weight" else "bias"),
                 tconv_w(arr) if parts[-1] == "weight" else arr)
            continue
        if key.startswith("decode_head."):
            rest = parts[1:]
            if rest[0] == "psp_modules":
                _put_convmodule(params, stats, ("decode_head", f"psp{rest[1]}"),
                                rest[3:], arr)
            elif rest[0] == "bottleneck":
                _put_convmodule(params, stats, ("decode_head", "bottleneck"),
                                rest[1:], arr)
            elif rest[0] == "lateral_convs":
                _put_convmodule(params, stats, ("decode_head", f"lateral{rest[1]}"),
                                rest[2:], arr)
            elif rest[0] == "fpn_convs":
                _put_convmodule(params, stats, ("decode_head", f"fpn{rest[1]}"),
                                rest[2:], arr)
            elif rest[0] == "fpn_bottleneck":
                _put_convmodule(params, stats, ("decode_head", "fpn_bottleneck"),
                                rest[1:], arr)
            elif rest[0] == "classifier":
                _put(params, ("decode_head", "classifier",
                              "kernel" if rest[1] == "weight" else "bias"),
                     _conv_w(arr) if rest[1] == "weight" else arr)
            else:
                raise KeyError(f"unrecognized decode_head key {key!r}")
            continue
        if key.startswith("auxiliary_head."):
            rest = parts[1:]
            if rest[0] == "convs":
                _put_convmodule(params, stats, ("auxiliary_head", f"conv{rest[1]}"),
                                rest[2:], arr)
            elif rest[0] == "classifier":
                _put(params, ("auxiliary_head", "classifier",
                              "kernel" if rest[1] == "weight" else "bias"),
                     _conv_w(arr) if rest[1] == "weight" else arr)
            else:
                raise KeyError(f"unrecognized auxiliary_head key {key!r}")
            continue
        raise KeyError(f"unrecognized beit checkpoint key {key!r}")

    return {"params": params, "batch_stats": stats}
