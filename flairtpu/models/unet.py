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


@jax.custom_vjp
def upsample2x_nearest(x: jax.Array) -> jax.Array:
    """Exact equivalent of torch F.interpolate(scale_factor=2, mode='nearest').

    Carries a hand-written VJP: autodiff of the repeat lowers to
    broadcast+reduce pairs that materialize (B, H, W/2, 2, C)-shaped temps in
    the train step (the decoder backward's largest allocations in the XLA
    memory dump); the explicit 2x2 window sum is the same math with a clean
    reshape-reduce layout.
    """
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _up2x_fwd(x):
    return upsample2x_nearest(x), None


def _up2x_bwd(_, g):
    B, H2, W2, C = g.shape
    return (g.reshape(B, H2 // 2, 2, W2 // 2, 2, C).sum(axis=(2, 4)),)


upsample2x_nearest.defvjp(_up2x_fwd, _up2x_bwd)


class DecoderBlock(nn.Module):
    """upsample 2x -> concat skip -> (conv3x3 + BN + ReLU) x2.

    setup-style so the inner-crop decode path can run ``_convs`` on an
    already-upsampled-and-cropped extent with the same parameters.
    """

    features: int
    dtype: Any = jnp.float32

    def setup(self):
        self.conv1 = conv(self.features, 3, use_bias=False, dtype=self.dtype)
        self.bn1 = batch_norm(self.dtype)
        self.conv2 = conv(self.features, 3, use_bias=False, dtype=self.dtype)
        self.bn2 = batch_norm(self.dtype)

    def __call__(self, x, skip, train: bool):
        x = upsample2x_nearest(x)
        return self._convs(x, skip, train)

    def _convs(self, x, skip, train: bool):
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = self.conv1(x)
        x = self.bn1(x, use_running_average=not train)
        x = nn.relu(x)
        x = self.conv2(x)
        x = self.bn2(x, use_running_average=not train)
        return nn.relu(x)


def plan_inner_crops(size: int, margin: int, n_blocks: int = 5,
                     conv_halo: int = 3) -> list[dict]:
    """Backward interval plan to decode only the inner (margin-cropped) region.

    For zone inference with exact clipping, only ``[margin, size-margin)`` of
    the decoder output is ever used — but convolutions are local, so each
    decoder block only needs its output on the downstream-needed region plus
    a halo. Walking the need backward through (two 3x3 convs = +2) and
    (2x nearest upsample = halve indices), each block computes a small
    interior extent instead of the full tile; the results are BIT-IDENTICAL
    to full-tile decoding on the needed region (clamped crops coincide with
    physical tile edges, so zero-padding matches there too).

    ``conv_halo`` covers the block's own convs plus the downstream head conv.
    Returns per-block dicts {post: (lo, hi), pre: (lo, hi)}: ``post`` is the
    extent the block computes (its output offset is post[0]) in its own
    output resolution; ``pre`` is the crop of the block's pre-upsample input.
    """
    lo, hi = margin - 1, size - margin + 1  # head 3x3 input needed at 1/1
    plans: list[dict] = []
    for i in range(n_blocks - 1, -1, -1):
        extent = size >> (n_blocks - 1 - i)  # block i output resolution
        lo_c, hi_c = max(lo - 2, 0), min(hi + 2, extent)
        pre = (lo_c // 2, -(-hi_c // 2))
        plans.append({"block": i, "post": (lo_c, hi_c), "pre": pre})
        lo, hi = pre
    return list(reversed(plans))


class UnetDecoder(nn.Module):
    """Consumes encoder features [input, f1..f5]; returns the full-res map.

    smp semantics: drop the stride-1 input feature, reverse, deepest feature is
    the head, the rest are skips; block i upsamples and fuses skip i (the last
    block has no skip).

    With ``inner_margin`` set (zone exact-clipping fast path), decodes only
    the interior extent per :func:`plan_inner_crops` and returns
    ``(x, offset)`` — the caller applies the head and crops
    ``[margin-offset-? ...]`` relative to ``offset``.
    """

    decoder_channels: Sequence[int] = DEFAULT_DECODER_CHANNELS
    # rematerialize decoder blocks on backward (training memory knob; the
    # inner-margin inference path never takes it)
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: list[jax.Array], train: bool = False,
                 inner_margin: int | None = None):
        feats = features[1:][::-1]
        x, skips = feats[0], feats[1:]
        if inner_margin is None:
            block = (nn.remat(DecoderBlock, static_argnums=(3,))
                     if self.remat else DecoderBlock)  # (self, x, skip, train)
            for i, ch in enumerate(self.decoder_channels):
                skip = skips[i] if i < len(skips) else None
                x = block(ch, dtype=self.dtype, name=f"block{i}")(x, skip, train)
            return x

        size = features[0].shape[1]  # square tiles
        plans = plan_inner_crops(size, inner_margin, len(self.decoder_channels))
        p0 = plans[0]["pre"]
        x = x[:, p0[0]:p0[1], p0[0]:p0[1], :]
        off = p0[0]  # x covers [off, off+extent) at its resolution
        for i, ch in enumerate(self.decoder_channels):
            lo, hi = plans[i]["post"]
            x = upsample2x_nearest(x)  # covers [2*off, ...)
            x = x[:, lo - 2 * off : hi - 2 * off, lo - 2 * off : hi - 2 * off, :]
            skip = skips[i][:, lo:hi, lo:hi, :] if i < len(skips) else None
            # inline DecoderBlock body minus its upsample (params identical)
            x = DecoderBlock(ch, dtype=self.dtype,
                             name=f"block{i}")._convs(x, skip, train)
            off = lo
        return x, off


class UnetPlusPlusDecoder(nn.Module):
    """smp 0.3.3 UnetPlusPlusDecoder (decoders/unetplusplus/decoder.py).

    Nested dense skip pathways: node x_{d}_{l} at depth d, layer l fuses the
    upsampled deeper node with ALL same-depth shallower nodes plus the encoder
    skip. Parity oracle: tests/torch_ref.py::ResNet34UnetPlusPlus (smp is not
    installed in this environment; key names mirror smp's
    ``decoder.blocks.x_{d}_{l}.conv{1,2}``).
    """

    decoder_channels: Sequence[int] = DEFAULT_DECODER_CHANNELS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: list[jax.Array], train: bool = False):
        feats = features[1:][::-1]  # deepest first: (f5, f4, f3, f2, f1)
        depth = len(self.decoder_channels) - 1  # 4
        dense: dict[str, jax.Array] = {}
        for layer_idx in range(depth):
            for depth_idx in range(depth - layer_idx):
                if layer_idx == 0:
                    out = DecoderBlock(self.decoder_channels[depth_idx]
                                       if depth_idx == 0 else
                                       feats[depth_idx + 1].shape[-1],
                                       dtype=self.dtype,
                                       name=f"x_{depth_idx}_{depth_idx}")(
                        feats[depth_idx], feats[depth_idx + 1], train)
                    dense[f"x_{depth_idx}_{depth_idx}"] = out
                else:
                    l = depth_idx + layer_idx
                    cat = jnp.concatenate(
                        [dense[f"x_{idx}_{l}"]
                         for idx in range(depth_idx + 1, l + 1)]
                        + [feats[l + 1]], axis=-1)
                    out_ch = (self.decoder_channels[l] if depth_idx == 0
                              else feats[l + 1].shape[-1])
                    dense[f"x_{depth_idx}_{l}"] = DecoderBlock(
                        out_ch, dtype=self.dtype,
                        name=f"x_{depth_idx}_{l}")(
                            dense[f"x_{depth_idx}_{l - 1}"], cat, train)
        dense[f"x_0_{depth}"] = DecoderBlock(
            self.decoder_channels[-1], dtype=self.dtype,
            name=f"x_0_{depth}")(dense[f"x_0_{depth - 1}"], None, train)
        return dense[f"x_0_{depth}"]


class SegmentationHead(nn.Module):
    """Conv to class logits (smp SegmentationHead; unet uses kernel 3,
    deeplabv3plus kernel 1 — upsampling applied by the caller)."""

    classes: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return conv(self.classes, self.kernel, use_bias=True, dtype=self.dtype,
                    name="conv")(x)
