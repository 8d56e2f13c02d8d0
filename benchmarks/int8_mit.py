"""Measure int8 PTQ for the MiT attention family on the zone forward.

Builder ROADMAP r5 #2 / VERDICT r4 next #8: qkv/proj/mlp dense matmuls +
strided embed/sr convs run w8a8 (models/quantize_mit.py) while LN/softmax/
GELU/dwconv and the activation x activation einsums stay float. This
times the production inner-decode zone forward (mit_b*_unet, 512/128, 19
classes, RGB — mit encoders are 3-channel by smp parity) float-bf16 vs
int8 at batch 128, with argmax agreement, chained-diff per CLAUDE.md.

Usage: python benchmarks/int8_mit.py       [MODELS=mit_b0,mit_b2 BATCH=128]
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
    rng = np.random.default_rng(0)
    B = int(os.environ.get("BATCH", "128"))
    models = os.environ.get("MODELS", "mit_b0,mit_b2").split(",")

    def timed(fn, x, short=2, long=8, reps=3):
        def chain(n):
            out, xx = None, x
            for _ in range(n):
                out = fn(xx)
                xx = xx.at[0, 0, 0, 0].set(out[0, 0, 0].astype(jnp.float32)
                                           * 1e-6)
            t0 = time.perf_counter()
            np.asarray(out[0, 0, 0])
            return time.perf_counter() - t0

        chain(1)
        return min((chain(long) - chain(short)) / (long - short)
                   for _ in range(reps))

    for enc in models:
        cfg = {"model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {"encoder_decoder": f"{enc}_unet"}},
            "n_classes": K, "channels": [1, 2, 3],
            "norma_task": [{"norm_type": "scaling", "norm_means": [],
                            "norm_stds": []}],
            "int8_decoder": int(os.environ.get("DEC_BLOCKS", "2"))}
        model = create_model(cfg, dtype=dtype)
        params, stats = init_model(model, (1, SIZE, SIZE, 3))
        variables = {"params": params, "batch_stats": stats}
        calib = [rng.integers(0, 255, (8, SIZE, SIZE, 3)).astype(np.uint8)
                 for _ in range(2)]
        qmodel = quantize_model(cfg, model, params, stats, calib,
                                float_dtype=dtype if on_tpu else None)

        def make_fwd(m):
            def fwd(x):
                logits = m.apply(variables, x, train=False,
                                 inner_margin=MARGIN)
                return jnp.argmax(logits, axis=-1).astype(jnp.uint8)
            return jax.jit(fwd)

        f_float, f_q = make_fwd(model), make_fwd(qmodel)
        x = jnp.asarray(rng.integers(0, 255, (B, SIZE, SIZE, 3))
                        .astype(np.float32) / 255.0)
        agree = float((np.asarray(f_float(x)) == np.asarray(f_q(x))).mean())
        row = {"model": f"{enc}_unet", "batch": B,
               "argmax_agree": round(agree, 4)}
        for name, fn in (("float", f_float), ("int8", f_q)):
            dt = timed(fn, x)
            row[f"{name}_patches_per_sec"] = round(B / dt, 1)
        row["speedup"] = round(row["int8_patches_per_sec"]
                               / row["float_patches_per_sec"], 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
