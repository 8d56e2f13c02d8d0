"""Fused device ops for the zone-detect hot path.

The reference's inference loop materializes full softmax probabilities and
ships them to the host per batch (reference src/zone_detect/compare.py:20-39:
softmax -> .cpu().numpy() of (B, K, H, W) float32). Here the device emits only
what stitching needs:

- :func:`softmax_argmax` — one fused pass producing (argmax, max-probability)
  per pixel. maxprob == 1/sum(exp(x - max)) so the full softmax tensor never
  exists in HBM; D2H volume drops by ~K/2 (19-class: ~9.5x).
- :func:`scatter_accumulate` — sequential tile blend-scatter into a
  device-resident zone accumulator (overlap stitching without the reference's
  raster read-back, compare.py:106-108).

Both compile to plain XLA. A hand-written Pallas kernel for softmax_argmax
was benchmarked on the v5e chip (benchmarks/decoder_split.py methodology,
batch 128 x 256^2 x 19) and measured 18x SLOWER than XLA's fused reduce
(40.9 ms vs 2.3 ms; 0.25 ms once XLA also fuses the downstream uint8
conversion): with K=19 the class axis pads to 128 lanes, wasting ~85% of
VPU bandwidth, while XLA reduces over the minor axis without materializing
the padded layout. The kernel was removed — an over-class reduction is a
case where the compiler beats a naive custom kernel. The gather/scatter
side is likewise bounded by benchmarks/zone_movement_floor.py at ~1.3% of
device compute, so scatter_accumulate stays a lax.scan +
dynamic_update_slice DMA loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# fused softmax + argmax + max-probability
# ---------------------------------------------------------------------------

def softmax_argmax_ref(logits: jax.Array) -> tuple[jax.Array, jax.Array]:
    """logits (..., K) -> (argmax int32, maxprob f32), one fused XLA pass."""
    x = logits.astype(jnp.float32)
    m = jnp.max(x, axis=-1, keepdims=True)
    arg = jnp.argmax(x, axis=-1).astype(jnp.int32)
    s = jnp.sum(jnp.exp(x - m), axis=-1)
    return arg, 1.0 / s


# single implementation on every backend; the alias preserves the public
# name used across the zone programs and tests
softmax_argmax = softmax_argmax_ref


# ---------------------------------------------------------------------------
# sequential tile scatter-accumulate (overlap stitching on device)
# ---------------------------------------------------------------------------

def scatter_accumulate(acc: jax.Array, tiles: jax.Array,
                       origins: jax.Array, weights: jax.Array | None = None):
    """acc[(r0:r0+h, c0:c0+w, :)] += tiles[i] * weights, sequentially per tile.

    acc: (H, W, K) f32; tiles: (N, h, w, K); origins: (N, 2) int32 (row, col),
    pre-clipped so windows lie inside acc; weights: (h, w) or None.
    Sequential semantics make overlapping tiles accumulate exactly (the TPU
    grid executes in order; lax.scan mirrors that on every backend).
    """
    if weights is not None:
        tiles = tiles * weights[None, :, :, None]

    def body(a, tw):
        tile, origin = tw
        r0, c0 = origin[0], origin[1]
        h, w, k = tile.shape
        cur = jax.lax.dynamic_slice(a, (r0, c0, 0), (h, w, k))
        return jax.lax.dynamic_update_slice(a, cur + tile, (r0, c0, 0)), None

    acc, _ = jax.lax.scan(body, acc, (tiles.astype(acc.dtype), origins))
    return acc
