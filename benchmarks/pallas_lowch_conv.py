"""Stage 1 of the fused low-channel decoder experiment (ROADMAP r5 #1).

The production zone program measures 0.48 MFU against a 0.83 compiler
ceiling (zone_hlo_floor), and the decoder+head slice runs at ~28% MFU
(decoder_split: 17.3 ms vs ~4.8 ms at peak for ~0.94 TFLOP/batch). The
hypothesis is the 16-64-channel tail. Before writing any kernel, this
script measures each isolated tail op the way XLA runs it today
(conv3x3 + folded-BN bias + ReLU, bf16, batch 128, inner-decode extents)
and states each against ITS OWN roofline:

    floor_ms = max(flops / MXU peak, bytes / HBM peak)

so the verdict is "XLA achieves X% of the op's floor" per op — the number
a Pallas kernel has to beat. Shapes are the resnet34-unet inner-decode
decoder tail at the FLAIR production geometry (512 tile / 128 margin):
block3 (136^2, 128->32->32), block4 (262^2, 32->16->16), head (16->19).

Timing per CLAUDE.md: chained data-dependent dispatches, one D2H fetch,
differenced chain lengths. Usage: python benchmarks/pallas_lowch_conv.py

CAVEAT (first TPU run, recorded in PERFORMANCE.md round 5): isolated
single-op jits are NOT a faithful instrument here — standalone programs
pick entry/exit layouts for 16-channel NHWC arrays that the in-context op
never pays (measured "54 ms" for the head conv alone vs 17.3 ms for the
ENTIRE decoder+head in context, and sub-floor negative readings for the
fast ops where chain-differencing noise dominates). Use the xplane trace
of the real program (benchmarks/trace_zone_forward.py) for per-op truth;
this script is kept as the record of why.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PEAK_FLOPS = 197e12
PEAK_HBM = 819e9

# (name, H, cin, cout) — conv3x3 SAME, bias, relu at batch B
TAIL_OPS = [
    ("b3c1", 136, 128, 32),
    ("b3c2", 136, 32, 32),
    ("b4c1", 262, 32, 16),
    ("b4c2", 262, 16, 16),
    ("head", 262, 16, 19),
]


def main():
    import jax
    import jax.numpy as jnp

    B = int(os.environ.get("BATCH", "128"))
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    rng = np.random.default_rng(0)

    def timed(fn, x, short=2, long=10, reps=3):
        def chain(n):
            out, xx = None, x
            for _ in range(n):
                out = fn(xx)
                xx = xx.at[0, 0, 0, 0].set(out[0, 0, 0, 0].astype(xx.dtype)
                                           * 1e-6)
            t0 = time.perf_counter()
            np.asarray(out[0, 0, 0, 0].astype(jnp.float32))
            return time.perf_counter() - t0

        chain(1)
        return min((chain(long) - chain(short)) / (long - short)
                   for _ in range(reps))

    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    for name, H, cin, cout in TAIL_OPS:
        w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, dtype)
        b = jnp.asarray(rng.standard_normal(cout), dtype)

        def op(x, w=w, b=b):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
            return jax.nn.relu(y + b)

        x = jnp.asarray(rng.standard_normal((B, H, H, cin)), dtype)
        f = jax.jit(op)
        dt = timed(f, x)
        flops = 2.0 * 9 * cin * cout * H * H * B
        bytes_ = (B * (H + 2) * (H + 2) * cin + B * H * H * cout) * x.dtype.itemsize
        t_mxu = flops / PEAK_FLOPS
        t_hbm = bytes_ / PEAK_HBM
        floor = max(t_mxu, t_hbm)
        print(json.dumps({
            "op": name, "shape": f"{H}^2 {cin}->{cout}", "batch": B,
            "measured_ms": round(dt * 1e3, 3),
            "t_mxu_ms": round(t_mxu * 1e3, 3),
            "t_hbm_ms": round(t_hbm * 1e3, 3),
            "bound": "mxu" if t_mxu > t_hbm else "hbm",
            "pct_of_floor": round(100 * floor / dt, 1),
            "mxu_eff_pct": round(100 * t_mxu / dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
