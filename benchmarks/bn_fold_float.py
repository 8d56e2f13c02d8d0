"""Float BN-fold experiment: pure-bf16 folded conv walk vs the BN-module path.

The zone trace (trace_zone_forward.py) shows the production float forward
carries f32 BatchNorm epilogues and f32 intermediates (the stem emits a
f32[128,256,256,64] feature = 2.1 GB/batch written + re-read by the pool),
because inference BN arithmetic stays fp32 for torch parity. At inference
BN is a per-channel affine that folds into the conv (exactly the algebra
models/quantize.py uses for int8) — folding and running the whole walk in
bf16 removes every BN epilogue and f32 round trip.

This measures the production inner-decode forward + argmax epilogue:
  (a) the float Flax path (BN modules, f32 BN math)      — baseline
  (b) BN-folded bf16 conv walk (quantize.py walks, no int8) — candidate
and prints argmax agreement + chained-diff throughput at batch 128.

Usage: python benchmarks/bn_fold_float.py
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
    from flairtpu.models.quantize import (fold_encoder, fold_unet_decoder,
                                          walk_features, walk_unet_decode)
    from flairtpu.ops.fused import softmax_argmax

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
    variables = {"params": params, "batch_stats": stats}

    folded_enc = {k: {"w": v["w"].astype(dtype), "b": v["b"].astype(dtype)}
                  for k, v in fold_encoder(params, stats).items()}
    folded_dec = {k: {"w": v["w"].astype(dtype), "b": v["b"].astype(dtype)}
                  for k, v in fold_unet_decoder(params, stats).items()}
    head = params["segmentation_head"]["conv"]
    head_w = head["kernel"].astype(dtype)
    head_b = head["bias"].astype(dtype)
    _DN = ("NHWC", "HWIO", "NHWC")

    def folded_conv(site_table):
        def conv_fn(name, x, stride=1, padding=1, dilation=1, groups=1):
            c = site_table[name]
            y = jax.lax.conv_general_dilated(
                x, c["w"], (stride, stride),
                ((padding, padding), (padding, padding)),
                rhs_dilation=(dilation, dilation), feature_group_count=groups,
                dimension_numbers=_DN)
            return y + c["b"]
        return conv_fn

    def fwd_float(x):
        logits = model.apply(variables, x, train=False, inner_margin=MARGIN)
        cls, prob = softmax_argmax(logits)
        return cls.astype(jnp.uint8), jnp.round(prob * 255).astype(jnp.uint8)

    def fwd_folded(x):
        feats = walk_features("resnet34", folded_conv(folded_enc),
                              x.astype(dtype))
        y, off = walk_unet_decode(folded_conv(folded_dec), feats, MARGIN)
        logits = jax.lax.conv_general_dilated(
            y, head_w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=_DN) + head_b
        m, S = MARGIN, SIZE
        logits = logits[:, m - off:S - m - off, m - off:S - m - off, :]
        cls, prob = softmax_argmax(logits.astype(jnp.float32))
        return cls.astype(jnp.uint8), jnp.round(prob * 255).astype(jnp.uint8)

    rng = np.random.default_rng(0)
    B = int(os.environ.get("BATCH", "128"))
    x = jnp.asarray(rng.integers(0, 255, (B, SIZE, SIZE, 5))
                    .astype(np.float32) / 255.0)

    # composition: int8 encoder + deep decoder (dec=2) with the folded
    # float sites in bf16 (quantize_model float_dtype — the bn_fold knob)
    from flairtpu.models.quantize import quantize_model

    calib = [rng.integers(0, 255, (8, SIZE, SIZE, 5)).astype(np.uint8)
             for _ in range(2)]
    qmodel = quantize_model({**cfg, "int8_decoder": 2}, model, params, stats,
                            calib, float_dtype=dtype)

    def fwd_int8_fold(xx):
        logits = qmodel.apply(variables, xx, train=False, inner_margin=MARGIN)
        cls, prob = softmax_argmax(logits)
        return cls.astype(jnp.uint8), jnp.round(prob * 255).astype(jnp.uint8)

    f_a, f_b = jax.jit(fwd_float), jax.jit(fwd_folded)
    f_c = jax.jit(fwd_int8_fold)
    ca = np.asarray(f_a(x)[0])
    cb = np.asarray(f_b(x)[0])
    cc = np.asarray(f_c(x)[0])
    print(json.dumps({"check": "argmax agreement folded-bf16 vs float",
                      "agree": round(float((ca == cb).mean()), 5)}), flush=True)
    print(json.dumps({"check": "argmax agreement int8+fold vs float",
                      "agree": round(float((ca == cc).mean()), 5)}), flush=True)

    def timed(fn, short=2, long=8, reps=3):
        def chain(n):
            out, xx = None, x
            for _ in range(n):
                out = fn(xx)
                xx = xx.at[0, 0, 0, 0].set(out[0][0, 0, 0].astype(jnp.float32)
                                           * 1e-6)
            t0 = time.perf_counter()
            np.asarray(out[0][0, 0, 0])
            return time.perf_counter() - t0

        chain(1)
        return min((chain(long) - chain(short)) / (long - short)
                   for _ in range(reps))

    for name, fn in (("float", f_a), ("folded_bf16", f_b),
                     ("int8_dec2_fold", f_c)):
        dt = timed(fn)
        print(json.dumps({"variant": name,
                          "patches_per_sec": round(B / dt, 1),
                          "ms_per_batch": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
