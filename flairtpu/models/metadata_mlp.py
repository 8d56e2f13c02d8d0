"""Metadata MLP encoder + encoder-feature fusion.

Reproduces the reference's MetadataMLP (src/flair/model.py:82-92): three
Linear->Dropout(0.4)->ReLU stages 45->64->32->16, and the fusion rule
(src/flair/model.py:56-62): the 16-d embedding is broadcast over the deepest
encoder feature map such that every channel at spatial row h receives
``mlp_out[h]`` (the torch code reshapes (B,16) -> (B,1,16,1) and repeats to
(B,512,16,16), indexing the embedding by the H axis). This requires the
deepest feature map to be 16x16, i.e. 512x512 inputs — the FLAIR patch size.

Note the reference constructor crashes on this path (bare ``model_provider``
NameError at src/flair/model.py:32, bug #1 in SURVEY.md); the semantics below
are what that code implements once the typo is fixed.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class MetadataMLP(nn.Module):
    dtype: Any = jnp.float32
    dropout_rate: float = 0.4

    @nn.compact
    def __call__(self, mtd: jax.Array, train: bool = False) -> jax.Array:
        x = mtd.astype(self.dtype)
        for i, width in enumerate((64, 32, 16)):
            x = nn.Dense(width, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"fc{i}")(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
            x = nn.relu(x)
        return x


def fuse_metadata(deep_feature: jax.Array, embedding: jax.Array) -> jax.Array:
    """Add the 16-d embedding to a (B, H, W, C) feature map, indexed by H."""
    B, H, W, C = deep_feature.shape
    if H != embedding.shape[-1]:
        raise ValueError(
            f"metadata fusion requires the deepest feature height ({H}) to equal "
            f"the embedding size ({embedding.shape[-1]}); use 512x512 inputs"
        )
    return deep_feature + embedding[:, :, None, None].astype(deep_feature.dtype)
