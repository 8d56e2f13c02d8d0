"""Single-point train-step probe for the round-4 MFU investigation.

Measures the flagship resnet34-unet train step (512², 19 classes) with the
chained-diff methodology under one experimental condition per invocation
(XLA/libtpu flags must be set before backend init, so conditions are separate
processes):

    BATCH=128                 per-chip batch (default 128)
    BN_BF16=1                 BatchNorm math in bf16 instead of fp32 via the
                              production `bn_dtype` train-config knob (stat
                              reductions are HBM-bound fp32 traffic)
    ACCUM=2                   accumulate_steps (microbatch = BATCH/ACCUM)
    REMAT=1                   jax.checkpoint encoder/decoder blocks
    LIBTPU_INIT_ARGS=...      e.g. --xla_tpu_enable_latency_hiding_scheduler=true

Prints one JSON line: condition + patches/s + train MFU (194.08 GF/patch over
the 197 TFLOP/s bf16 peak; bench.py:train_flops_per_patch).

Run on the TPU:  python benchmarks/train_mfu_probe.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    batch = int(os.environ.get("BATCH", "128"))
    bn_bf16 = bool(os.environ.get("BN_BF16"))
    accum = int(os.environ.get("ACCUM", "1"))
    remat = bool(os.environ.get("REMAT"))

    from benchmarks.remat_accum import measure

    config = {
        "model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {"encoder_decoder": "resnet34_unet"},
        },
        "use_metadata": False, "use_augmentation": True, "use_weights": True,
        "channels": [1, 2, 3, 4, 5],
        "norm_type": "scaling", "norm_means": [], "norm_stds": [],
        "classes": {i: [0 if i in (15, 16, 17, 19) else 1, f"c{i}"]
                    for i in range(1, 20)},
        "learning_rate": 0.02, "seed": 0,
        "batch_size": batch, "remat": remat, "accumulate_steps": accum,
        "bn_dtype": "bfloat16" if bn_bf16 else "float32",
    }
    res = measure(config, size=int(os.environ.get("SIZE", "512")))
    pps = res.get("patches_per_sec", 0.0) or 0.0
    print(json.dumps({
        "batch": batch, "bn_bf16": bn_bf16, "accum": accum, "remat": remat,
        "libtpu_args": os.environ.get("LIBTPU_INIT_ARGS", ""),
        **res,
        "train_mfu": round(194.08e9 * pps / 197e12, 4) if pps else None,
    }), flush=True)


if __name__ == "__main__":
    main()
