"""Flax Swin Transformer + UperNet — the reference's default HF model family.

The reference's default configs point `model_provider: HuggingFace` at
``openmmlab/upernet-swin-small`` (reference configs/flair-1-config.yaml:29-34,
flair-1-config-detect.yaml). This module reimplements transformers'
SwinBackbone + UperNetForSemanticSegmentation numerics in Flax (NHWC):

- Swin encoder: overlap-free 4x4 patch embed + LN; stages of window attention
  blocks (W-MSA / SW-MSA with relative position bias, cyclic shift, shift
  masks with -100 additive fill, zero-padding to window multiples with no pad
  mask — HF behavior, mirrored exactly); patch merging (2x2 concat in HF's
  interleave order -> LN -> linear reduction); per-out-feature LayerNorms;
  ``always_partition`` backbone semantics (shift/window never shrink).
- UperNet head: PSP pyramid pooling (adaptive avg pools 1/2/3/6 + 1x1
  conv-BN-ReLU, bilinear align_corners=False upsampling), FPN laterals +
  top-down sums, 3x3 FPN convs, concat + bottleneck, 1x1 classifier, final
  upsample to input resolution; optional FCN auxiliary head.

A converter from HF torch state dicts (``hf_upernet_torch_to_flax``) makes
local ``upernet-swin-*`` checkpoints loadable; parity is tested against the
installed transformers torch implementation with random weights (no hub
downloads in this environment).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

SWIN_SPECS = {
    "tiny": dict(embed_dim=96, depths=(2, 2, 6, 2), heads=(3, 6, 12, 24), window=7),
    "small": dict(embed_dim=96, depths=(2, 2, 18, 2), heads=(3, 6, 12, 24), window=7),
    "base": dict(embed_dim=128, depths=(2, 2, 18, 2), heads=(4, 8, 16, 32), window=7),
    "large": dict(embed_dim=192, depths=(2, 2, 18, 2), heads=(6, 12, 24, 48), window=7),
}

_LN_EPS = 1e-5  # SwinConfig.layer_norm_eps
_BN_EPS = 1e-5


def _ln(name, dtype):
    return nn.LayerNorm(epsilon=_LN_EPS, dtype=jnp.float32, param_dtype=jnp.float32,
                        name=name)


def _dense(features, name, dtype, use_bias=True):
    return nn.Dense(features, use_bias=use_bias, dtype=dtype,
                    param_dtype=jnp.float32, name=name)


def window_partition(x: jax.Array, w: int) -> jax.Array:
    """(B, H, W, C) -> (B*nW, w, w, C), HF ordering."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w, w, C)


def window_reverse(windows: jax.Array, w: int, H: int, W: int) -> jax.Array:
    C = windows.shape[-1]
    x = windows.reshape(-1, H // w, W // w, w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, H, W, C)


def relative_position_index(w: int) -> np.ndarray:
    """Static (w*w, w*w) index into the (2w-1)^2 bias table (HF formula)."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)


def shift_attention_mask(Hp: int, Wp: int, w: int, shift: int) -> np.ndarray:
    """Static (nW, w*w, w*w) additive mask for SW-MSA (HF get_attn_mask)."""
    img = np.zeros((1, Hp, Wp, 1), np.float32)
    slices = (slice(0, -w), slice(-w, -shift), slice(-shift, None))
    count = 0
    for hs in slices:
        for ws in slices:
            img[:, hs, ws, :] = count
            count += 1
    mw = img.reshape(1, Hp // w, w, Wp // w, w, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w)
    mask = mw[:, None, :] - mw[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    heads: int
    window: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xw: jax.Array, mask: np.ndarray | None):
        """xw: (B*nW, N, C) with N = window**2; mask: (nW, N, N) or None."""
        Bw, N, C = xw.shape
        hd = C // self.heads
        table = self.param(
            "rel_bias",
            nn.initializers.zeros,
            ((2 * self.window - 1) ** 2, self.heads), jnp.float32)
        idx = relative_position_index(self.window).reshape(-1)
        bias = table[idx].reshape(N, N, self.heads).transpose(2, 0, 1)

        q = _dense(C, "query", self.dtype)(xw).reshape(Bw, N, self.heads, hd)
        k = _dense(C, "key", self.dtype)(xw).reshape(Bw, N, self.heads, hd)
        v = _dense(C, "value", self.dtype)(xw).reshape(Bw, N, self.heads, hd)
        scores = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(hd).astype(q.dtype)
        scores = scores.astype(jnp.float32) + bias[None]
        if mask is not None:
            nW = mask.shape[0]
            scores = scores.reshape(Bw // nW, nW, self.heads, N, N)
            scores = scores + jnp.asarray(mask)[None, :, None]
            scores = scores.reshape(Bw, self.heads, N, N)
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", probs, v).reshape(Bw, N, C)
        return _dense(C, "proj", self.dtype)(out)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):  # (B, H, W, C)
        B, H, W, C = x.shape
        w = self.window
        shortcut = x
        y = _ln("norm1", self.dtype)(x).astype(self.dtype)
        pad_b = (w - H % w) % w
        pad_r = (w - W % w) % w
        y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r
        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
            mask = shift_attention_mask(Hp, Wp, w, self.shift)
        else:
            mask = None
        yw = window_partition(y, w).reshape(-1, w * w, C)
        yw = WindowAttention(self.dim, self.heads, w, self.dtype, name="attn")(yw, mask)
        y = window_reverse(yw.reshape(-1, w, w, C), w, Hp, Wp)
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        y = y[:, :H, :W, :]
        x = shortcut + y.astype(shortcut.dtype)

        z = _ln("norm2", self.dtype)(x).astype(self.dtype)
        z = _dense(int(self.mlp_ratio * C), "fc1", self.dtype)(z)
        z = jax.nn.gelu(z, approximate=False)
        z = _dense(C, "fc2", self.dtype)(z)
        return x + z.astype(x.dtype)


class PatchMerging(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):  # (B, H, W, C) -> (B, H/2, W/2, 2C)
        B, H, W, C = x.shape
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        f0 = x[:, 0::2, 0::2, :]
        f1 = x[:, 1::2, 0::2, :]
        f2 = x[:, 0::2, 1::2, :]
        f3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([f0, f1, f2, f3], axis=-1)
        x = _ln("norm", self.dtype)(x)
        return _dense(2 * self.dim, "reduction", self.dtype, use_bias=False)(
            x.astype(self.dtype))


class SwinBackbone(nn.Module):
    spec: str = "small"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        cfg = SWIN_SPECS[self.spec]
        E, w = cfg["embed_dim"], cfg["window"]
        # 4x4 patch embed + LN (SwinEmbeddings)
        x = nn.Conv(E, (4, 4), strides=(4, 4), dtype=self.dtype,
                    param_dtype=jnp.float32, name="patch_proj")(x.astype(self.dtype))
        x = _ln("patch_norm", self.dtype)(x).astype(self.dtype)

        feats = []
        dim = E
        for s, (depth, heads) in enumerate(zip(cfg["depths"], cfg["heads"])):
            for b in range(depth):
                x = SwinBlock(dim, heads, w, shift=0 if b % 2 == 0 else w // 2,
                              dtype=self.dtype, name=f"stage{s}_block{b}")(x)
            # out-feature norm on the before-downsampling state
            f = _ln(f"out_norm{s}", self.dtype)(x)
            feats.append(f.astype(self.dtype))
            if s < len(cfg["depths"]) - 1:
                x = PatchMerging(dim, self.dtype, name=f"downsample{s}")(x)
                dim *= 2
        return feats


# ---------------------------------------------------------------------------
# UperNet head
# ---------------------------------------------------------------------------

class ConvModule(nn.Module):
    features: int
    kernel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel), use_bias=False,
                    padding=((p, p), (p, p)), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=_BN_EPS, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


def adaptive_avg_pool(x: jax.Array, k: int) -> jax.Array:
    """torch AdaptiveAvgPool2d(k) on (B, H, W, C), static shapes."""
    B, H, W, C = x.shape
    rows = [x[:, (i * H) // k : -(-((i + 1) * H) // k), :, :].mean(axis=1)
            for i in range(k)]
    x = jnp.stack(rows, axis=1)  # (B, k, W, C)
    cols = [x[:, :, (j * W) // k : -(-((j + 1) * W) // k), :].mean(axis=2)
            for j in range(k)]
    return jnp.stack(cols, axis=2)  # (B, k, k, C)


def _resize(x, hw):
    """torch F.interpolate(bilinear, align_corners=False) equivalent.

    antialias=False is essential: torch does not low-pass filter when
    downscaling (the PSP module resizes pooled maps back onto small features).
    """
    B, _, _, C = x.shape
    return jax.image.resize(x, (B, hw[0], hw[1], C), "bilinear", antialias=False)


class UperNetHead(nn.Module):
    classes: int
    channels: int = 512
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: list[jax.Array], train: bool = False):
        top = feats[-1]
        H4, W4 = feats[0].shape[1:3]
        # PSP on the deepest feature
        psp = [top]
        for i, scale in enumerate(self.pool_scales):
            p = adaptive_avg_pool(top, scale)
            p = ConvModule(self.channels, 1, self.dtype, name=f"psp{i}")(p, train)
            psp.append(_resize(p, top.shape[1:3]))
        x = jnp.concatenate(psp, axis=-1)
        psp_out = ConvModule(self.channels, 3, self.dtype, name="bottleneck")(x, train)

        laterals = [
            ConvModule(self.channels, 1, self.dtype, name=f"lateral{i}")(f, train)
            for i, f in enumerate(feats[:-1])
        ] + [psp_out]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _resize(
                laterals[i], laterals[i - 1].shape[1:3])

        fpn = [ConvModule(self.channels, 3, self.dtype, name=f"fpn{i}")(laterals[i], train)
               for i in range(len(laterals) - 1)] + [laterals[-1]]
        fpn = [fpn[0]] + [_resize(f, (H4, W4)) for f in fpn[1:]]
        x = jnp.concatenate(fpn, axis=-1)
        x = ConvModule(self.channels, 3, self.dtype, name="fpn_bottleneck")(x, train)
        return nn.Conv(self.classes, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="classifier")(x)


class FCNAuxHead(nn.Module):
    """UperNetFCNHead: aux loss head on feats[2] (HF defaults)."""

    classes: int
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: list[jax.Array], train: bool = False):
        x = ConvModule(self.channels, 3, self.dtype, name="conv0")(feats[2], train)
        return nn.Conv(self.classes, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="classifier")(x)


class SwinUperNet(nn.Module):
    """UperNetForSemanticSegmentation(Swin backbone) peer model."""

    spec: str = "small"
    classes: int = 19
    with_aux_head: bool = True
    use_metadata: bool = False  # HF provider has no metadata path
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mtd=None, train: bool = False,
                 return_aux: bool = False):
        B, H, W, _ = x.shape
        feats = SwinBackbone(self.spec, self.dtype, name="backbone")(x)
        logits = UperNetHead(self.classes, dtype=self.dtype,
                             name="decode_head")(feats, train=train)
        logits = _resize(logits.astype(jnp.float32), (H, W))
        if self.with_aux_head:
            aux = FCNAuxHead(self.classes, dtype=self.dtype,
                             name="auxiliary_head")(feats, train=train)
            if return_aux:
                return logits, _resize(aux.astype(jnp.float32), (H, W))
        return logits


# ---------------------------------------------------------------------------
# HF torch state dict -> Flax variables
# ---------------------------------------------------------------------------

def _put(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv_w(a):
    return np.transpose(a, (2, 3, 1, 0))


def convert_upernet_head_key(key: str, arr: np.ndarray, params: dict,
                             stats: dict) -> bool:
    """Handle decode_head.* / auxiliary_head.* keys (shared by all UperNet
    backbones). Returns True when the key was consumed."""
    parts = key.split(".")

    def put_convmodule(base, rest):
        if rest[0] == "conv":
            _put(params, base + ("conv", "kernel"), _conv_w(arr))
        elif rest[0] == "batch_norm":
            leaf = rest[1]
            if leaf == "weight":
                _put(params, base + ("bn", "scale"), arr)
            elif leaf == "bias":
                _put(params, base + ("bn", "bias"), arr)
            elif leaf == "running_mean":
                _put(stats, base + ("bn", "mean"), arr)
            elif leaf == "running_var":
                _put(stats, base + ("bn", "var"), arr)

    if key.startswith("decode_head."):
        rest = parts[1:]
        if rest[0] == "psp_modules":
            put_convmodule(("decode_head", f"psp{rest[1]}"), rest[3:])
        elif rest[0] == "bottleneck":
            put_convmodule(("decode_head", "bottleneck"), rest[1:])
        elif rest[0] == "lateral_convs":
            put_convmodule(("decode_head", f"lateral{rest[1]}"), rest[2:])
        elif rest[0] == "fpn_convs":
            put_convmodule(("decode_head", f"fpn{rest[1]}"), rest[2:])
        elif rest[0] == "fpn_bottleneck":
            put_convmodule(("decode_head", "fpn_bottleneck"), rest[1:])
        elif rest[0] == "classifier":
            _put(params, ("decode_head", "classifier",
                          "kernel" if rest[1] == "weight" else "bias"),
                 _conv_w(arr) if rest[1] == "weight" else arr)
        return True
    if key.startswith("auxiliary_head."):
        rest = parts[1:]
        if rest[0] == "convs":
            put_convmodule(("auxiliary_head", f"conv{rest[1]}"), rest[2:])
        elif rest[0] == "classifier":
            _put(params, ("auxiliary_head", "classifier",
                          "kernel" if rest[1] == "weight" else "bias"),
                 _conv_w(arr) if rest[1] == "weight" else arr)
        return True
    return False


def hf_upernet_torch_to_flax(sd: dict[str, np.ndarray]) -> dict:
    params: dict = {}
    stats: dict = {}
    put = _put
    conv_w = _conv_w

    for key, arr in sd.items():
        arr = np.asarray(arr)
        parts = key.split(".")
        if key.endswith("num_batches_tracked") or "relative_position_index" in key:
            continue
        if key.startswith("backbone.embeddings.patch_embeddings.projection."):
            leaf = parts[-1]
            put(params, ("backbone", "patch_proj",
                         "kernel" if leaf == "weight" else "bias"),
                conv_w(arr) if leaf == "weight" else arr)
            continue
        if key.startswith("backbone.embeddings.norm."):
            put(params, ("backbone", "patch_norm",
                         "scale" if parts[-1] == "weight" else "bias"), arr)
            continue
        if key.startswith("backbone.encoder.layers."):
            s = parts[3]
            if parts[4] == "blocks":
                b, rest = parts[5], parts[6:]
                base = ("backbone", f"stage{s}_block{b}")
                if rest[0] in ("layernorm_before", "layernorm_after"):
                    name = "norm1" if rest[0] == "layernorm_before" else "norm2"
                    put(params, base + (name, "scale" if rest[1] == "weight" else "bias"),
                        arr)
                elif rest[0] == "attention":
                    if rest[1] == "self":
                        if rest[2] == "relative_position_bias_table":
                            put(params, base + ("attn", "rel_bias"), arr)
                        else:  # query/key/value
                            put(params, base + ("attn", rest[2],
                                                "kernel" if rest[3] == "weight" else "bias"),
                                arr.T if rest[3] == "weight" else arr)
                    else:  # attention.output.dense
                        put(params, base + ("attn", "proj",
                                            "kernel" if rest[3] == "weight" else "bias"),
                            arr.T if rest[3] == "weight" else arr)
                elif rest[0] == "intermediate":
                    put(params, base + ("fc1",
                                        "kernel" if rest[2] == "weight" else "bias"),
                        arr.T if rest[2] == "weight" else arr)
                elif rest[0] == "output":
                    put(params, base + ("fc2",
                                        "kernel" if rest[2] == "weight" else "bias"),
                        arr.T if rest[2] == "weight" else arr)
            elif parts[4] == "downsample":
                base = ("backbone", f"downsample{s}")
                if parts[5] == "reduction":
                    put(params, base + ("reduction", "kernel"), arr.T)
                else:  # norm
                    put(params, base + ("norm",
                                        "scale" if parts[6] == "weight" else "bias"), arr)
            continue
        if key.startswith("backbone.hidden_states_norms.stage"):
            i = int(parts[2].removeprefix("stage")) - 1
            put(params, ("backbone", f"out_norm{i}",
                         "scale" if parts[-1] == "weight" else "bias"), arr)
            continue
        if convert_upernet_head_key(key, arr, params, stats):
            continue
        raise KeyError(f"unrecognized upernet checkpoint key {key!r}")

    return {"params": params, "batch_stats": stats}
