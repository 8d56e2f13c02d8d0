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

softmax_argmax has a Pallas TPU kernel with a pure-jnp fallback (used on CPU
and as the parity oracle in tests); ``FLAIRTPU_NO_PALLAS=1`` forces the
fallback. scatter_accumulate compiles to a sequential DMA loop via
lax.scan + dynamic_update_slice — benchmarks/zone_movement_floor.py measures
the whole gather+scatter side of the zone program at a few percent of device
compute, so a hand-written Pallas scatter has nothing meaningful to win.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _use_pallas() -> bool:
    if os.environ.get("FLAIRTPU_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# fused softmax + argmax + max-probability
# ---------------------------------------------------------------------------

def softmax_argmax_ref(logits: jax.Array) -> tuple[jax.Array, jax.Array]:
    """jnp reference: logits (..., K) -> (argmax int32, maxprob f32)."""
    x = logits.astype(jnp.float32)
    m = jnp.max(x, axis=-1, keepdims=True)
    arg = jnp.argmax(x, axis=-1).astype(jnp.int32)
    s = jnp.sum(jnp.exp(x - m), axis=-1)
    return arg, 1.0 / s


def _sa_kernel(x_ref, arg_ref, prob_ref):
    x = x_ref[:].astype(jnp.float32)  # (T, K)
    m = jnp.max(x, axis=1, keepdims=True)
    arg = jnp.argmax(x, axis=1).astype(jnp.int32)
    s = jnp.sum(jnp.exp(x - m), axis=1)
    arg_ref[:] = arg[:, None]
    prob_ref[:] = (1.0 / s)[:, None]


@partial(jax.jit, static_argnames=("block",))
def _softmax_argmax_pallas(flat: jax.Array, block: int = 1024):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, k = flat.shape
    grid = (pl.cdiv(n, block),)
    arg, prob = pl.pallas_call(
        _sa_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((block, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ),
    )(flat)
    return arg[:, 0], prob[:, 0]


def softmax_argmax(logits: jax.Array) -> tuple[jax.Array, jax.Array]:
    """logits (..., K) -> (argmax int32 (...), maxprob f32 (...))."""
    shape = logits.shape[:-1]
    k = logits.shape[-1]
    if not _use_pallas():
        return softmax_argmax_ref(logits)
    n = int(np.prod(shape))
    block = 1024
    pad = (-n) % block
    flat = logits.reshape(n, k)
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    arg, prob = _softmax_argmax_pallas(flat, block=block)
    return arg[:n].reshape(shape), prob[:n].reshape(shape)


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
