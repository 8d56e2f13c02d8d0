"""Measure the strided-head inner decode (windowed align-corners upsample).

VERDICT r4 next #5: deeplabv3plus/fpn/pan emit stride-4 logit maps and
pspnet/deeplabv3 stride-8; the production exact-clipping path previously
upsampled them to the full 512^2x19 tile and then cropped the margins.
factory.decode's inner_margin path now computes ONLY the interior rows/cols
of the align-corners upsample by subsetting the weight-matrix einsum's rows
(ulp-level agreement, argmax-exact — tests/test_models.py). A two-tap
gather+lerp reformulation of the upsample was measured 2.4x SLOWER than the
dense einsum (gathers run on the VPU, the redundant MACs ride the MXU) and
rejected — PERFORMANCE.md round-5.

This times the zone forward (512 tile / 128 margin / 19 classes, argmax
epilogue like the production program) full-decode+crop vs inner for each
strided arch, chained-diff per CLAUDE.md. Usage:
    python benchmarks/strided_inner_decode.py
    ARCHS=deeplabv3plus,fpn BATCHES=64,128 python benchmarks/strided_inner_decode.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SIZE, MARGIN, K = 512, 128, 19


def main():
    import jax
    import jax.numpy as jnp

    from flairtpu.models.factory import FlairSegmentationModel, init_model
    from flairtpu.ops.fused import softmax_argmax

    rng = np.random.default_rng(0)
    archs = os.environ.get("ARCHS", "deeplabv3plus,fpn,pspnet").split(",")
    batches = [int(b) for b in os.environ.get("BATCHES", "128").split(",")]
    encoder = os.environ.get("ENCODER", "resnet34")
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    def timed(fn, x, short=2, long=8, reps=3):
        def chain(n):
            out, xx = None, x
            for _ in range(n):
                out = fn(xx)
                xx = xx.at[0, 0, 0, 0].set(out[0][0, 0, 0].astype(jnp.float32)
                                           * 1e-6)
            t0 = time.perf_counter()
            np.asarray(out[0][0, 0, 0])
            return time.perf_counter() - t0

        chain(1)  # compile
        return min((chain(long) - chain(short)) / (long - short)
                   for _ in range(reps))

    for arch in archs:
        model = FlairSegmentationModel(encoder_name=encoder, arch=arch,
                                       classes=K, dtype=dtype)
        params, stats = init_model(model, (1, SIZE, SIZE, 5))
        variables = {"params": params, "batch_stats": stats}
        m, S = MARGIN, SIZE

        def fwd_full(x):
            logits = model.apply(variables, x, train=False)
            return softmax_argmax(logits[:, m:S - m, m:S - m, :])

        def fwd_inner(x):
            logits = model.apply(variables, x, train=False, inner_margin=m)
            return softmax_argmax(logits)

        for batch in batches:
            x = jnp.asarray(rng.integers(0, 255, (batch, SIZE, SIZE, 5))
                            .astype(np.float32) / 255.0)
            f_full = jax.jit(fwd_full)
            f_inner = jax.jit(fwd_inner)
            agree = float((np.asarray(f_full(x)[0]) ==
                           np.asarray(f_inner(x)[0])).mean())
            row = {"arch": arch, "batch": batch, "argmax_agree": agree}
            for name, fn in (("full", f_full), ("inner", f_inner)):
                try:
                    dt = timed(fn, x)
                    row[f"{name}_patches_per_sec"] = round(batch / dt, 1)
                except Exception as e:
                    row[f"{name}_error"] = str(e).splitlines()[0][:140]
            if "full_patches_per_sec" in row and "inner_patches_per_sec" in row:
                row["speedup"] = round(row["inner_patches_per_sec"]
                                       / row["full_patches_per_sec"], 3)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
