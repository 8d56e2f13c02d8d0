"""smp Mix-Vision-Transformer (mit_b0..b5) encoder for the smp provider.

smp/encoders/mix_transformer.py vendors NVlabs' SegFormer backbone and the
reference accepts ``mit_b*_<arch>`` strings through its smp factory
(src/flair/model.py:35-41).  The numerics are identical to HuggingFace's
SegFormer encoder (both derive from the NVlabs code), so this wrapper
reuses the Flax modules from :mod:`flairtpu.models.segformer` — which are
logit-parity-tested against the *installed* transformers library — and
only adds the smp encoder surface:

- 6-feature pyramid ``[x, dummy, f1(s4), f2(s8), f3(s16), f4(s32)]`` where
  the stride-2 slot is a zero-channel dummy tensor (smp's
  MixVisionTransformerEncoder.forward creates ``torch.empty(B, 0, H/2,
  W/2)`` because the backbone has no stride-2 stage); decoders concatenate
  it as a no-op skip exactly like smp's torch decoders do,
- ``out_channels = (3, 0, *embed_dims)``,
- ``make_dilated`` raises (smp: "MixVisionTransformer encoder does not
  support dilated mode"), so deeplabv3/deeplabv3plus/pan reject mit
  encoders at registry time,
- in_channels is fixed at 3 (smp's set_in_channels raises for anything
  else) — enforced at config/factory time (models/registry.py) and
  rechecked here at trace time.

Stage/block geometry comes from segformer.SEGFORMER_SPECS (b0..b5).
Checkpoint keys (``encoder.patch_embed{s}.*``, ``encoder.block{s}.{j}.*``
with fused ``kv``, ``encoder.norm{s}.*``) are mapped — kv split into
key/value — in models/convert.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from flairtpu.models.segformer import (SEGFORMER_SPECS, OverlapPatchEmbed,
                                       SegformerBlock, _ln)

MIT_SPECS = tuple(f"mit_{k}" for k in SEGFORMER_SPECS)  # mit_b0..mit_b5


class MiTSmpEncoder(nn.Module):
    """smp MixVisionTransformerEncoder: 6 features, zero-channel s2 dummy."""

    name_spec: str = "mit_b0"
    output_stride: int = 32
    depth: int = 5
    remat: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> tuple[int, ...]:
        dims = SEGFORMER_SPECS[self.name_spec[len("mit_"):]]["dims"]
        return (3, 0) + tuple(dims[: self.depth - 1])

    @nn.compact
    def __call__(self, x, train: bool = False) -> list[jax.Array]:
        if self.output_stride != 32:
            # smp MixVisionTransformerEncoder.make_dilated
            raise ValueError(
                "MixVisionTransformer encoder does not support dilated mode")
        if x.shape[-1] != 3:
            # smp MixVisionTransformerEncoder.set_in_channels
            raise ValueError(
                "MixVisionTransformer encoder does not support in_channels "
                "setting other than 3")
        cfg = SEGFORMER_SPECS[self.name_spec[len("mit_"):]]
        block_cls = (nn.remat(SegformerBlock) if self.remat
                     else SegformerBlock)

        B, H, W, _ = x.shape
        x = x.astype(self.dtype)
        feats = [x, jnp.zeros((B, H // 2, W // 2, 0), x.dtype)]
        y = x
        for i, (dim, depth, heads, sr) in enumerate(
                zip(cfg["dims"], cfg["depths"], cfg["heads"], cfg["srs"])):
            if i >= self.depth - 1:
                break
            y = OverlapPatchEmbed(dim, kernel=7 if i == 0 else 3,
                                  stride=4 if i == 0 else 2, dtype=self.dtype,
                                  name=f"embed{i}")(y)
            for j in range(depth):
                y = block_cls(dim, heads, sr, self.dtype,
                              name=f"block{i}_{j}")(y)
            y = _ln(f"norm{i}", self.dtype)(y)
            feats.append(y)
        return feats
