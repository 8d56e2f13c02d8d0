"""Flax ConvNeXt backbone + UperNet head (HF-provider family).

Completes the UperNet backbone coverage the reference's HuggingFace provider
exposes (reference src/flair/model.py:43-50): transformers'
``openmmlab/upernet-convnext-*`` numerics in Flax, reusing the UperNet
head/aux-head modules and the shared checkpoint-key converter from
:mod:`flairtpu.models.swin_upernet`.

ConvNeXt block (HF modeling_convnext.py ConvNextLayer): depthwise 7x7 conv ->
LayerNorm (eps 1e-6) -> Linear 4C -> exact GELU -> Linear C -> layer-scale
gamma -> residual. Stages downsample with LayerNorm + 2x2/2 conv; the stem is
a 4x4/4 conv + LayerNorm; per-out-feature LayerNorms follow the backbone.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from flairtpu.models.swin_upernet import (
    FCNAuxHead,
    UperNetHead,
    _put,
    _conv_w,
    _resize,
    convert_upernet_head_key,
)

CONVNEXT_SPECS = {
    "tiny": dict(dims=(96, 192, 384, 768), depths=(3, 3, 9, 3)),
    "small": dict(dims=(96, 192, 384, 768), depths=(3, 3, 27, 3)),
    "base": dict(dims=(128, 256, 512, 1024), depths=(3, 3, 27, 3)),
    "large": dict(dims=(192, 384, 768, 1536), depths=(3, 3, 27, 3)),
    "xlarge": dict(dims=(256, 512, 1024, 2048), depths=(3, 3, 27, 3)),
}

_LN_EPS = 1e-6  # ConvNextLayerNorm default


def _ln6(name):
    return nn.LayerNorm(epsilon=_LN_EPS, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)


class ConvNextBlock(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):  # (B, H, W, C)
        residual = x
        y = nn.Conv(self.dim, (7, 7), padding=((3, 3), (3, 3)),
                    feature_group_count=self.dim, dtype=self.dtype,
                    param_dtype=jnp.float32, name="dwconv")(x.astype(self.dtype))
        y = _ln6("norm")(y).astype(self.dtype)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="pwconv1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="pwconv2")(y)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,),
                           jnp.float32)
        return residual + (gamma * y).astype(residual.dtype)


class ConvNextBackbone(nn.Module):
    spec: str = "tiny"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        cfg = CONVNEXT_SPECS[self.spec]
        x = nn.Conv(cfg["dims"][0], (4, 4), strides=(4, 4), dtype=self.dtype,
                    param_dtype=jnp.float32, name="stem_conv")(x.astype(self.dtype))
        x = _ln6("stem_norm")(x).astype(self.dtype)
        feats = []
        for s, (dim, depth) in enumerate(zip(cfg["dims"], cfg["depths"])):
            if s > 0:
                x = _ln6(f"downsample{s}_norm")(x).astype(self.dtype)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                            param_dtype=jnp.float32, name=f"downsample{s}_conv")(x)
            for b in range(depth):
                x = ConvNextBlock(dim, self.dtype, name=f"stage{s}_block{b}")(x)
            f = _ln6(f"out_norm{s}")(x)
            feats.append(f.astype(self.dtype))
        return feats


class ConvNextUperNet(nn.Module):
    """UperNetForSemanticSegmentation(ConvNeXt backbone) peer model."""

    spec: str = "tiny"
    classes: int = 19
    with_aux_head: bool = True
    use_metadata: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mtd=None, train: bool = False, return_aux: bool = False):
        B, H, W, _ = x.shape
        feats = ConvNextBackbone(self.spec, self.dtype, name="backbone")(x)
        logits = UperNetHead(self.classes, dtype=self.dtype,
                             name="decode_head")(feats, train=train)
        logits = _resize(logits.astype(jnp.float32), (H, W))
        if self.with_aux_head:
            aux = FCNAuxHead(self.classes, dtype=self.dtype,
                             name="auxiliary_head")(feats, train=train)
            if return_aux:
                return logits, _resize(aux.astype(jnp.float32), (H, W))
        return logits


def hf_convnext_upernet_torch_to_flax(sd: dict[str, np.ndarray]) -> dict:
    """transformers UperNet(ConvNeXt) state dict -> Flax variables."""
    params: dict = {}
    stats: dict = {}

    for key, arr in sd.items():
        arr = np.asarray(arr)
        parts = key.split(".")
        if key.endswith("num_batches_tracked"):
            continue
        if convert_upernet_head_key(key, arr, params, stats):
            continue
        if key.startswith("backbone.embeddings.patch_embeddings."):
            leaf = parts[-1]
            _put(params, ("backbone", "stem_conv",
                          "kernel" if leaf == "weight" else "bias"),
                 _conv_w(arr) if leaf == "weight" else arr)
            continue
        if key.startswith("backbone.embeddings.layernorm."):
            _put(params, ("backbone", "stem_norm",
                          "scale" if parts[-1] == "weight" else "bias"), arr)
            continue
        if key.startswith("backbone.encoder.stages."):
            s = parts[3]
            if parts[4] == "downsampling_layer":
                which, leaf = parts[5], parts[6]
                if which == "0":  # LayerNorm
                    _put(params, ("backbone", f"downsample{s}_norm",
                                  "scale" if leaf == "weight" else "bias"), arr)
                else:  # conv
                    _put(params, ("backbone", f"downsample{s}_conv",
                                  "kernel" if leaf == "weight" else "bias"),
                         _conv_w(arr) if leaf == "weight" else arr)
            elif parts[4] == "layers":
                b, rest = parts[5], parts[6:]
                base = ("backbone", f"stage{s}_block{b}")
                if rest[0] == "dwconv":
                    _put(params, base + ("dwconv",
                                         "kernel" if rest[1] == "weight" else "bias"),
                         _conv_w(arr) if rest[1] == "weight" else arr)
                elif rest[0] == "layernorm":
                    _put(params, base + ("norm",
                                         "scale" if rest[1] == "weight" else "bias"),
                         arr)
                elif rest[0] in ("pwconv1", "pwconv2"):
                    _put(params, base + (rest[0],
                                         "kernel" if rest[1] == "weight" else "bias"),
                         arr.T if rest[1] == "weight" else arr)
                elif rest[0] == "layer_scale_parameter":
                    _put(params, base + ("gamma",), arr)
            continue
        if key.startswith("backbone.hidden_states_norms.stage"):
            i = int(parts[2].removeprefix("stage")) - 1
            _put(params, ("backbone", f"out_norm{i}",
                          "scale" if parts[-1] == "weight" else "bias"), arr)
            continue
        raise KeyError(f"unrecognized convnext-upernet checkpoint key {key!r}")

    return {"params": params, "batch_stats": stats}
