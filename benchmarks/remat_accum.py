"""Measure train-step throughput & fit envelope: batch x remat x accumulate.

Round-3 verdict item #6: remat (jax.checkpoint on encoder/decoder blocks)
plus accumulate_steps should let effective batch exceed the 16 GB chip's
plain-step ceiling (batch 256 OOMed in round 2) and beit-large 512^2 train
at all. This script measures the flagship resnet34-unet step at several
(batch, remat, accumulate) points and a beit-large smoke, printing one JSON
line per point; results are recorded in PERFORMANCE.md.

Run on the TPU:  python benchmarks/remat_accum.py
CPU quick mode:  BENCH_QUICK=1 JAX_PLATFORMS=cpu python benchmarks/remat_accum.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

# run as a script from anywhere; PYTHONPATH breaks the axon plugin discovery
# on this image, so self-insert instead
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def measure(config: dict, size: int = 512, steps_short: int = 2,
            steps_long: int = 6) -> dict:
    import jax

    from flairtpu.train.loop import SegmentationTrainer

    bs = config["batch_size"]
    try:
        trainer = SegmentationTrainer(config)
        trainer.replicate_to_mesh()
        step = trainer.train_step()
        rng = np.random.default_rng(0)
        batch = {
            "img": rng.integers(0, 255, (bs, size, size, 5)).astype(np.uint8),
            "msk": rng.integers(0, 19, (bs, size, size)).astype(np.int32),
        }
        img, msk, mtd = trainer._put(batch)
        jax.block_until_ready(img)
        state = [trainer.params, trainer.batch_stats, trainer.opt_state,
                 jax.random.PRNGKey(0)]

        def chain(n):
            p, s, o, key = state
            loss = None
            for _ in range(n):
                p, s, o, loss, cm, key = step(p, s, o, img, msk, mtd, key)
            state[:] = [p, s, o, key]
            t0 = time.perf_counter()
            float(np.asarray(loss))  # D2H fetch forces completion (CLAUDE.md)
            return time.perf_counter() - t0

        chain(1)  # compile
        per_step = (chain(steps_long) - chain(steps_short)) / (steps_long - steps_short)
        return {"ok": True, "patches_per_sec": round(bs / per_step, 2),
                "step_ms": round(per_step * 1000, 1)}
    except Exception as e:  # OOM -> RESOURCE_EXHAUSTED XlaRuntimeError
        msg = str(e)
        oom = "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg.lower() \
            or "exhausted" in msg.lower()
        return {"ok": False, "oom": oom, "error": msg.splitlines()[0][:160]}


def main() -> None:
    quick = bool(os.environ.get("BENCH_QUICK"))
    size = 64 if quick else 512

    base = {
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
    }
    points = [
        dict(batch_size=128, remat=False, accumulate_steps=1),
        dict(batch_size=128, remat=True, accumulate_steps=1),
        dict(batch_size=256, remat=False, accumulate_steps=1),  # r2: OOM
        dict(batch_size=256, remat=True, accumulate_steps=1),
        dict(batch_size=256, remat=False, accumulate_steps=2),
        dict(batch_size=512, remat=True, accumulate_steps=4),
    ]
    if quick:
        points = [dict(p, batch_size=max(2, p["batch_size"] // 64))
                  for p in points[:4]]
    only = os.environ.get("BENCH_ONLY")  # "resnet" | "beit" | unset (both)
    if only != "beit":
        for p in points:
            cfg = dict(base, **p)
            res = measure(cfg, size=size)
            print(json.dumps({"model": "resnet34_unet", "size": size, **p,
                              **res}), flush=True)

    # beit-large 512^2 smoke: remat=True must fit where False OOMs; the
    # dots_saveable point is the selective-remat policy (save matmul
    # outputs, recompute elementwise/norm/softmax) vs full recompute
    for remat, policy in ((False, None), (True, None),
                          (True, "dots_saveable")):
        cfg = dict(base, model_framework={
            "model_provider": "HuggingFace",
            "HuggingFace": {"org_model": "microsoft/beit-large-finetuned-ade-640-640"}},
            batch_size=4 if not quick else 2, remat=remat,
            remat_policy=policy, auxiliary_loss_weight=0.4)
        if quick or only == "resnet":
            continue
        res = measure(cfg, size=size, steps_short=1, steps_long=3)
        print(json.dumps({"model": "beit-large", "size": size,
                          "batch_size": cfg["batch_size"], "remat": remat,
                          "remat_policy": policy, **res}), flush=True)


if __name__ == "__main__":
    main()
