"""Measure the space-to-depth stem repack on the zone-inference forward.

Round-2 verdict "top_next": the 5-channel 7x7/s2 stem and 64-channel early
convs under-fill the 128-wide MXU; the standard TPU ResNet transform folds
the stem into a space-to-depth (resnet.StemConv s2d=True) — identical math
and checkpoint layout, different tiling.

Variants measured on the flagship resnet34-unet inner-decode forward at the
production 512/128 geometry (one JSON line each):
  baseline / s2d stem x batch 128 / 256 (inference fits larger batches
  than training). Also asserts s2d == baseline numerics first.

Timing per CLAUDE.md: chained data-dependent dispatches, ONE D2H fetch,
differenced chain lengths to cancel the tunnel's fixed fetch latency.
"""

from __future__ import annotations

import json
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

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = {"model_framework": {
        "model_provider": "SegmentationModelsPytorch",
        "SegmentationModelsPytorch": {"encoder_decoder": "resnet34_unet"}},
        "n_classes": K, "channels": [1, 2, 3, 4, 5]}
    model = create_model(cfg, dtype=dtype)
    model_s2d = create_model(dict(cfg, s2d_stem=True), dtype=dtype)
    params, stats = init_model(model, (1, SIZE, SIZE, 5))

    def make_fwd(m):
        def fwd(p, s, x):
            logits = m.apply({"params": p, "batch_stats": s}, x, train=False,
                             inner_margin=MARGIN)
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)
        return jax.jit(fwd)

    f_base, f_s2d = make_fwd(model), make_fwd(model_s2d)

    # numeric equivalence (same params tree: s2d is execution-only)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(0, 255, (2, SIZE, SIZE, 5))
                     .astype(np.float32) / 255.0)
    a = np.asarray(f_base(params, stats, xs))
    b = np.asarray(f_s2d(params, stats, xs))
    agree = float((a == b).mean())
    print(json.dumps({"check": "s2d argmax agreement", "agree": agree}),
          flush=True)
    # random-init bf16 logits tie everywhere, so summation-order changes flip
    # ~1% of argmax pixels (the fp32 logit-level equivalence is locked by
    # tests/test_models.py::test_s2d_stem_numerically_equivalent)
    assert agree > 0.95, "s2d stem diverged from baseline"

    def timed(fn, p, s, x, short=2, long=8, reps=2):
        def chain(n):
            out = None
            xx = x
            for _ in range(n):
                out = fn(p, s, xx)
                # data dependence so the chain cannot be reordered/elided
                xx = xx.at[0, 0, 0, 0].set(out[0, 0, 0].astype(jnp.float32)
                                           * 1e-6)
            t0 = time.perf_counter()
            np.asarray(out[0, 0, 0])
            return time.perf_counter() - t0

        chain(1)  # compile
        return min((chain(long) - chain(short)) / (long - short)
                   for _ in range(reps))

    for batch in (128, 256):
        x = jnp.asarray(rng.integers(0, 255, (batch, SIZE, SIZE, 5))
                        .astype(np.float32) / 255.0)
        for name, fn in (("baseline", f_base), ("s2d", f_s2d)):
            try:
                dt = timed(fn, params, stats, x)
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
