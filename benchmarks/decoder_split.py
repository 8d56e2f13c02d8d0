"""Where does zone forward compute go: encoder vs decoder vs head?

Times three jitted programs at the production zone geometry (512^2 5-ch
bf16, inner-decode margin 128, batch configurable): encoder-only, encoder +
decoder (inner), and the full forward + fused softmax/argmax. Differences
give the decoder and head shares, which decide whether a hand-written
Pallas decoder block is worth pursuing (the gather/scatter side is already
bounded at ~1.3% by zone_movement_floor.py).

Timing methodology (tunnel hazard, see CLAUDE.md): chained data-dependent
calls (a scalar from call i perturbs input i+1), one D2H fetch at the end,
two chain lengths differenced so the seconds-level fetch latency cancels.

Usage: python benchmarks/decoder_split.py [--batch 128]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SIZE, MARGIN = 512, 128


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--short", type=int, default=4)
    ap.add_argument("--long", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from flairtpu.models.factory import create_model, init_model
    from flairtpu.ops.fused import softmax_argmax

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    config = {
        "model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {"encoder_decoder": "resnet34_unet"},
        },
        "channels": [1, 2, 3, 4, 5], "n_classes": 19,
    }
    model = create_model(config, dtype=dtype)
    params, batch_stats = init_model(model, (1, SIZE, SIZE, 5))
    variables = {"params": params, "batch_stats": batch_stats}

    B = args.batch
    x0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, SIZE, SIZE, 5)),
        jnp.float32)

    def _enc(m, x, train=False):
        return m.encoder(x.astype(m.dtype), train=train)

    def encoder_only(x):
        feats = model.apply(variables, x, method=_enc)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    def full_inner(x):
        logits = model.apply(variables, x, train=False, inner_margin=MARGIN)
        return jnp.sum(logits)

    def full_inner_fused(x):
        logits = model.apply(variables, x, train=False, inner_margin=MARGIN)
        cls, conf = softmax_argmax(logits)
        return jnp.sum(conf.astype(jnp.float32)) + jnp.sum(cls)

    def timed(tag, fn):
        step = jax.jit(lambda x: fn(x))

        def chain(n):
            s = jnp.float32(0.0)
            for i in range(n):
                s = s + step(x0 + (s * 1e-12))
            t0 = time.perf_counter()
            float(np.asarray(s))  # the only reliable completion fence
            return time.perf_counter() - t0

        chain(1)  # compile
        per_call = []
        for _ in range(3):
            t_short = chain(args.short)
            t_long = chain(args.long)
            per_call.append((t_long - t_short) / (args.long - args.short))
        dt = min(per_call)
        print(f"{tag:24s} {dt * 1e3:8.1f} ms/call   {B / dt:8.1f} patches/s")
        return dt

    t_enc = timed("encoder", encoder_only)
    t_full = timed("enc+decoder(inner)+head", full_inner)
    t_fused = timed("+ fused softmax/argmax", full_inner_fused)
    print(f"decoder+head share: {(t_full - t_enc) / t_full * 100:.1f}% "
          f"({(t_full - t_enc) * 1e3:.1f} ms)")
    print(f"softmax/argmax add: {(t_fused - t_full) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
