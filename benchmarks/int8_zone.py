"""Measure the int8 PTQ encoder (models/quantize.py) on the zone forward.

The v5e datasheet rates int8 MXU throughput at 2x bf16 (394 TOPS vs 197
TFLOP/s) and the zone forward is encoder-dominated (~70% — PERFORMANCE.md),
so a full int8 encoder win would bound at ~1.5x end-to-end forward. This
measures the production inner-decode forward (resnet34-unet, 512/128, 19
classes) float-bf16 vs int8-quantized at batch 128/256, printing one JSON
line per point, after checking argmax agreement between the two paths.

Timing per CLAUDE.md: chained data-dependent dispatches, ONE D2H fetch,
differenced chain lengths. Usage: python benchmarks/int8_zone.py
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

    from flairtpu.models.factory import create_model, init_model
    from flairtpu.models.quantize import quantize_model

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = {"model_framework": {
        "model_provider": "SegmentationModelsPytorch",
        "SegmentationModelsPytorch": {"encoder_decoder": "resnet34_unet"}},
        "n_classes": K, "channels": [1, 2, 3, 4, 5],
        "norma_task": [{"norm_type": "scaling", "norm_means": [],
                        "norm_stds": []}]}
    model = create_model(cfg, dtype=dtype)
    params, stats = init_model(model, (1, SIZE, SIZE, 5))

    rng = np.random.default_rng(0)
    calib = [rng.integers(0, 255, (8, SIZE, SIZE, 5)).astype(np.uint8)
             for _ in range(2)]
    # sweep the decoder quantization depth (0 = encoder-only int8)
    depths = [int(d) for d in
              os.environ.get("DEC_BLOCKS", "0,1,2,3,5").split(",")]
    variables = {"params": params, "batch_stats": stats}

    def make_fwd(m):
        def fwd(x):
            logits = m.apply(variables, x, train=False, inner_margin=MARGIN)
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)
        return jax.jit(fwd)

    f_float = make_fwd(model)
    variants = [("float", f_float)]
    xs = jnp.asarray(rng.integers(0, 255, (2, SIZE, SIZE, 5))
                     .astype(np.float32) / 255.0)
    a = np.asarray(f_float(xs))
    for d in depths:
        qmodel = quantize_model({**cfg, "int8_decoder": d}, model, params,
                                stats, calib)
        f_q = make_fwd(qmodel)
        agree = float((a == np.asarray(f_q(xs))).mean())
        print(json.dumps({"check": f"argmax agreement int8(dec={d}) vs float",
                          "agree": round(agree, 4)}), flush=True)
        variants.append((f"int8_dec{d}", f_q))

    def timed(fn, x, short=2, long=8, reps=2):
        def chain(n):
            out, xx = None, x
            for _ in range(n):
                out = fn(xx)
                xx = xx.at[0, 0, 0, 0].set(out[0, 0, 0].astype(jnp.float32)
                                           * 1e-6)
            t0 = time.perf_counter()
            np.asarray(out[0, 0, 0])
            return time.perf_counter() - t0

        chain(1)  # compile
        return min((chain(long) - chain(short)) / (long - short)
                   for _ in range(reps))

    batches = [int(b) for b in os.environ.get("BATCHES", "128").split(",")]
    for batch in batches:
        x = jnp.asarray(rng.integers(0, 255, (batch, SIZE, SIZE, 5))
                        .astype(np.float32) / 255.0)
        for name, fn in variants:
            try:
                dt = timed(fn, x)
                print(json.dumps({
                    "variant": name, "batch": batch,
                    "patches_per_sec": round(batch / dt, 1),
                    "ms_per_batch": round(dt * 1e3, 1)}), flush=True)
            except Exception as e:
                print(json.dumps({"variant": name, "batch": batch,
                                  "error": str(e).splitlines()[0][:140]}),
                      flush=True)


if __name__ == "__main__":
    main()
