"""Flax MAnet decoder (smp 0.3.3 decoders/manet/decoder.py).

MAnet (Multi-scale Attention Net, arXiv:2009.02130) as shipped by
segmentation_models_pytorch 0.3.3 — one of the two architectures the
reference's ``smp.create_model`` accepts (src/flair/model.py:35-41) that
round 2 left unported. smp is not installed in this image; the numerical
oracle is the hand-built torch mirror ``tests/torch_ref.py::ResNet34MAnet``
(smp-exact key names), hardened by the committed key/shape manifests
(tests/smp_manifests/, see tests/test_smp_manifest.py).

Topology, reproduced exactly including smp's quirks:

- ``center`` PAB block: 1x1 top/center projections to ``pab_channels``, 3x3
  bottom conv, position-attention ``softmax`` applied over the FLATTENED
  (hw x hw) map (``Softmax(dim=1)`` on ``view(B, -1)`` — a global softmax,
  not row-wise), and the attended (hw, C) tensor *reinterpreted* as
  (C, h, w) via reshape (smp performs no transpose back); both reproduced
  bit-for-bit since published checkpoints were trained through them.
- four MFAB blocks: 3x3+1x1 Conv2dReLU "hl" squeeze to the skip width, 2x
  nearest upsample, two squeeze-excitation gates (one over the upsampled x,
  one over the skip) whose sigmoid outputs are SUMMED before the gating
  multiply, concat skip, two 3x3 Conv2dReLU.
- final block (no skip) is the plain unet DecoderBlock.

Head: kernel 3, no extra upsampling (full-stride encoder).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from flairtpu.models.resnet import batch_norm, conv
from flairtpu.models.unet import DecoderBlock, upsample2x_nearest

DEFAULT_DECODER_CHANNELS = (256, 128, 64, 32, 16)


class PABlock(nn.Module):
    """smp PAB: position-wise attention over the deepest feature map."""

    pab_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        B, H, W, C = x.shape
        top = conv(self.pab_channels, 1, padding=0, use_bias=True,
                   dtype=self.dtype, name="top_conv")(x)
        center = conv(self.pab_channels, 1, padding=0, use_bias=True,
                      dtype=self.dtype, name="center_conv")(x)
        bottom = conv(C, 3, use_bias=True, dtype=self.dtype,
                      name="bottom_conv")(x)
        hw = H * W
        top = top.reshape(B, hw, self.pab_channels)
        center = center.reshape(B, hw, self.pab_channels)
        bottom = bottom.reshape(B, hw, C)
        # sp_map[b,i,j] = <center_i, top_j>; smp softmaxes the *flattened*
        # (hw*hw) map (Softmax(dim=1) on view(B, -1)) — a global softmax
        sp = jnp.einsum("bip,bjp->bij", center, top)
        sp = jax.nn.softmax(sp.reshape(B, hw * hw).astype(jnp.float32),
                            axis=-1).reshape(B, hw, hw).astype(x.dtype)
        att = jnp.einsum("bij,bjc->bic", sp, bottom)  # (B, hw, C)
        # smp reshapes (B, hw, C) memory directly to (B, C, h, w) — a
        # reinterpretation, not a transpose; NHWC equivalent below
        att = att.reshape(B, C, H, W).transpose(0, 2, 3, 1)
        x = x + att
        return conv(C, 3, use_bias=True, dtype=self.dtype, name="out_conv")(x)


class _SqueezeExcite(nn.Module):
    """smp MFAB SE gate: GAP -> 1x1 reduce -> ReLU -> 1x1 expand -> sigmoid."""

    channels: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        reduced = max(1, self.channels // self.reduction)
        y = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        y = y.astype(self.dtype)
        y = conv(reduced, 1, padding=0, use_bias=True, dtype=self.dtype,
                 name="fc0")(y)
        y = nn.relu(y)
        y = conv(self.channels, 1, padding=0, use_bias=True, dtype=self.dtype,
                 name="fc1")(y)
        return jax.nn.sigmoid(y.astype(jnp.float32)).astype(self.dtype)


class MFABBlock(nn.Module):
    """smp MFAB: hl squeeze -> upsample -> dual-SE gate -> concat -> convs.

    Param names conv1/bn1/conv2/bn2 keep the fusion convs on the same
    converter path as the unet DecoderBlock (convert._BLOCK_RE).
    """

    features: int
    skip_channels: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array,
                 train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        y = conv(in_ch, 3, dtype=self.dtype, name="hl0_conv")(x)
        y = batch_norm(self.dtype, "hl0_bn")(y, use_running_average=not train)
        y = nn.relu(y)
        y = conv(self.skip_channels, 1, padding=0, dtype=self.dtype,
                 name="hl1_conv")(y)
        y = batch_norm(self.dtype, "hl1_bn")(y, use_running_average=not train)
        y = nn.relu(y)
        y = upsample2x_nearest(y)
        att_hl = _SqueezeExcite(self.skip_channels, self.reduction,
                                dtype=self.dtype, name="se_hl")(y)
        att_ll = _SqueezeExcite(self.skip_channels, self.reduction,
                                dtype=self.dtype, name="se_ll")(skip)
        y = y * (att_hl + att_ll)
        y = jnp.concatenate([y, skip.astype(y.dtype)], axis=-1)
        y = conv(self.features, 3, dtype=self.dtype, name="conv1")(y)
        y = batch_norm(self.dtype, "bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = conv(self.features, 3, dtype=self.dtype, name="conv2")(y)
        y = batch_norm(self.dtype, "bn2")(y, use_running_average=not train)
        return nn.relu(y)


class MAnetDecoder(nn.Module):
    """smp MAnetDecoder: PAB center + MFAB blocks (plain block when no skip)."""

    decoder_channels: Sequence[int] = DEFAULT_DECODER_CHANNELS
    pab_channels: int = 64
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: list[jax.Array], train: bool = False):
        feats = features[1:][::-1]
        x, skips = feats[0], feats[1:]
        x = PABlock(self.pab_channels, dtype=self.dtype, name="center")(x, train)
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            if skip is not None and skip.shape[-1] > 0:
                # smp builds MFAB only for skip_channels > 0; zero-channel
                # skips (the mit encoders' stride-2 dummy) get the plain
                # block, like smp's `if skip_ch > 0 else DecoderBlock`
                x = MFABBlock(ch, skip.shape[-1], self.reduction,
                              dtype=self.dtype, name=f"block{i}")(x, skip, train)
            else:
                x = DecoderBlock(ch, dtype=self.dtype,
                                 name=f"block{i}")(x, skip, train)
        return x
