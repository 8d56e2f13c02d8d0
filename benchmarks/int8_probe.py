"""Is int8 MXU throughput worth a quantized zone-inference path on this chip?

The v5e datasheet lists 394 TOPS int8 vs 197 TFLOP/s bf16 — a nominal 2x.
Whether XLA:TPU actually lowers int8 `dot_general`/`conv_general_dilated`
(with `preferred_element_type=int32`) to native int8 MXU passes, and whether
the 2x survives at the flagship model's conv geometries (low channel counts
in the U-Net decoder), decides if post-training quantization is the next
perf frontier or a no-win like the Pallas epilogues and the s2d stem
(PERFORMANCE.md). This probe times bf16 vs int8 at three representative
shapes before any quantization code is written.

Methodology: chained data-dependent calls + one scalar D2H fetch +
chain-length differencing (CLAUDE.md timing hazards).

Usage: python benchmarks/int8_probe.py
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def chain_time(fn, x0, n1=2, n2=8, reps=3) -> float:
    """Seconds per call, dispatch/fetch latency cancelled by differencing."""
    import jax.numpy as jnp

    def chain(k):
        t0 = time.perf_counter()
        x = x0
        out = None
        for _ in range(k):
            out = fn(x)
            # next input depends on this output -> calls serialize on device
            x = x0 + (out.ravel()[0] * 0).astype(x0.dtype)
        np.asarray(jnp.sum(out.astype(jnp.float32)))
        return time.perf_counter() - t0

    chain(1)  # compile + warm
    return min((chain(n2) - chain(n1)) / (n2 - n1) for _ in range(reps))


def main() -> None:
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)

    # --- pure matmul: the MXU speed-of-light check -------------------------
    N = 4096
    a8 = jnp.asarray(rng.integers(-127, 127, (N, N)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, (N, N)), jnp.int8)
    abf = a8.astype(jnp.bfloat16)
    bbf = b8.astype(jnp.bfloat16)

    mm_bf = jax.jit(lambda x: x @ bbf)
    mm_i8 = jax.jit(partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32))
    t_bf = chain_time(mm_bf, abf)
    t_i8 = chain_time(lambda x: mm_i8(x, b8), a8)
    fl = 2.0 * N ** 3
    print(f"matmul {N}^3: bf16 {t_bf * 1e3:7.2f} ms = {fl / t_bf / 1e12:6.1f} TFLOP/s"
          f" | int8 {t_i8 * 1e3:7.2f} ms = {fl / t_i8 / 1e12:6.1f} TOP/s"
          f" | ratio {t_bf / t_i8:.2f}x")

    # --- convs at flagship geometries --------------------------------------
    # (label, batch, H, W, Cin, Cout, k, stride): an encoder-stage conv
    # (lane-full), a mid decoder conv, and the low-channel decoder tail that
    # bounds the flagship MFU (PERFORMANCE.md).
    cases = [
        ("enc 3x3 256->256 @64^2", 32, 64, 64, 256, 256, 3, 1),
        ("dec 3x3 192->128 @128^2", 32, 128, 128, 192, 128, 3, 1),
        ("dec 3x3 32->16 @512^2", 8, 512, 512, 32, 16, 3, 1),
    ]
    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    for label, B, H, W, Ci, Co, k, s in cases:
        x = rng.integers(-127, 127, (B, H, W, Ci))
        w = rng.integers(-7, 7, (k, k, Ci, Co))
        xbf, wbf = jnp.asarray(x, jnp.bfloat16), jnp.asarray(w, jnp.bfloat16)
        x8, w8 = jnp.asarray(x, jnp.int8), jnp.asarray(w, jnp.int8)

        conv_bf = jax.jit(lambda v: jax.lax.conv_general_dilated(
            v, wbf, (s, s), "SAME", dimension_numbers=dn))
        conv_i8 = jax.jit(lambda v: jax.lax.conv_general_dilated(
            v, w8, (s, s), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32))
        t_bf = chain_time(conv_bf, xbf)
        try:
            t_i8 = chain_time(conv_i8, x8)
        except Exception as e:  # int8 conv may not lower on this backend
            print(f"conv {label}: bf16 {t_bf * 1e3:7.2f} ms | int8 FAILED: "
                  f"{type(e).__name__}: {str(e)[:120]}")
            continue
        fl = 2.0 * k * k * Ci * Co * (H // s) * (W // s) * B
        print(f"conv {label}: bf16 {t_bf * 1e3:7.2f} ms = "
              f"{fl / t_bf / 1e12:6.1f} TFLOP/s | int8 {t_i8 * 1e3:7.2f} ms = "
              f"{fl / t_i8 / 1e12:6.1f} TOP/s | ratio {t_bf / t_i8:.2f}x")


if __name__ == "__main__":
    main()
