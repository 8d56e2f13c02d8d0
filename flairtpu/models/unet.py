"""Flax U-Net decoder + segmentation head (smp 0.3.3 topology).

Matches segmentation-models-pytorch's UnetDecoder exactly: 5 decoder blocks,
channels (256, 128, 64, 32, 16), nearest-neighbor 2x upsampling, skip
concatenation, two Conv3x3+BN+ReLU per block, and a 3x3 conv head — the model
the reference instantiates via ``smp.create_model(arch='unet', ...)``
(reference src/flair/model.py:35-41).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from flairtpu.models.resnet import batch_norm, conv

DEFAULT_DECODER_CHANNELS = (256, 128, 64, 32, 16)


def upsample2x_nearest(x: jax.Array) -> jax.Array:
    """Exact equivalent of torch F.interpolate(scale_factor=2, mode='nearest')."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class DecoderBlock(nn.Module):
    """upsample 2x -> concat skip -> (conv3x3 + BN + ReLU) x2."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool):
        x = upsample2x_nearest(x)
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = conv(self.features, 3, use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = batch_norm(self.dtype, "bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = conv(self.features, 3, use_bias=False, dtype=self.dtype, name="conv2")(x)
        x = batch_norm(self.dtype, "bn2")(x, use_running_average=not train)
        return nn.relu(x)


class UnetDecoder(nn.Module):
    """Consumes encoder features [input, f1..f5]; returns the full-res map.

    smp semantics: drop the stride-1 input feature, reverse, deepest feature is
    the head, the rest are skips; block i upsamples and fuses skip i (the last
    block has no skip).
    """

    decoder_channels: Sequence[int] = DEFAULT_DECODER_CHANNELS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: list[jax.Array], train: bool = False):
        feats = features[1:][::-1]
        x, skips = feats[0], feats[1:]
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            x = DecoderBlock(ch, dtype=self.dtype, name=f"block{i}")(x, skip, train)
        return x


class SegmentationHead(nn.Module):
    """3x3 conv to class logits (smp SegmentationHead, upsampling=1)."""

    classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return conv(self.classes, 3, use_bias=True, dtype=self.dtype, name="conv")(x)
