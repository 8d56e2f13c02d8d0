"""Compiler-grounded roofline floor for the production train step.

Round-4 verdict deliverable (VERDICT r3 #2): since the batch>=256 /
accumulate levers are environmentally blocked (the tunnel's remote-compile
helper 500s on every >=256-batch training program) and the measured train
MFU tops out ~0.22-0.29, the alternative deliverable is a floor analysis
backed by the compiler's view of the program — not just wall-clock ratios.

Methodology:
 1. jit-lower the EXACT production train step (SegmentationTrainer at
    batch 128, 512^2, the reference training geometry) for the ambient
    backend and compile it.
 2. Read XLA's own cost analysis of the optimized executable: total flops
    and total "bytes accessed" (XLA's estimate of HBM traffic after all
    fusion decisions).
 3. Parse the optimized HLO entry computation and bucket per-op HBM bytes
    by opcode (convolution custom-calls vs fusions vs copies/reshapes), so
    the floor decomposes into "MXU work" and "unavoidable-by-XLA HBM
    traffic".
 4. Floor model: convolutions can hide their own HBM traffic behind MXU
    work (max), but the non-conv fusion bytes are pure bandwidth time —
        floor_s = max(flops/peak_flops, conv_bytes/bw) + other_bytes/bw
    against v5e peaks (197 TFLOP/s bf16, 819 GB/s HBM).

Prints one JSON line with the floor, its decomposition, and the implied
MFU ceiling; PERFORMANCE.md "train-step roofline floor" records the run.

Run on the TPU:  python benchmarks/train_hlo_floor.py
CPU quick mode:  BENCH_QUICK=1 python benchmarks/train_hlo_floor.py
(CPU compiles a different fusion plan — numbers are indicative only.)
"""

from __future__ import annotations

import json
import os
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PEAK_FLOPS = 197e12  # v5e bf16
PEAK_HBM = 819e9     # v5e HBM GB/s

_DTYPE_BYTES = {"f64": 8, "s64": 8, "u64": 8, "c64": 8,
                "f32": 4, "s32": 4, "u32": 4,
                "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
                "s8": 1, "u8": 1, "pred": 1}

_SHAPE_RE = re.compile(r"\b(f64|s64|u64|c64|f32|s32|u32|bf16|f16|s16|u16|s8|u8|pred)\[([0-9,]*)\]")
_OP_RE = re.compile(r"^\s+(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(?:\()?\s*(?:f64|s64|u64|c64|f32|s32|u32|bf16|f16|s16|u16|s8|u8|pred|tuple)"
                    r".*?\s([a-z][a-z0-9\-]*)\(")


def _shape_bytes(m: re.Match) -> int:
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dt]


def parse_entry_bytes(hlo: str) -> dict:
    """Bucket per-op HBM bytes (output + operands, no-reuse model) by opcode
    over the ENTRY computation of optimized HLO text."""
    lines = hlo.splitlines()
    # the ENTRY computation runs from the line starting with 'ENTRY' to its
    # closing brace at column 0
    try:
        start = next(i for i, l in enumerate(lines) if l.startswith("ENTRY"))
    except StopIteration:
        return {}
    buckets: dict[str, float] = {}
    n_while = 0
    for line in lines[start + 1:]:
        if line.startswith("}"):
            break
        om = _OP_RE.match(line)
        if not om:
            continue
        op = om.group(1)
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast", "after-all"):
            continue  # aliasing / no data movement of their own
        if op == "while":
            n_while += 1
        total = sum(_shape_bytes(m) for m in _SHAPE_RE.finditer(line))
        buckets[op] = buckets.get(op, 0.0) + total
    buckets["_while_ops"] = n_while  # bodies not walked; flag if present
    return buckets


def main() -> None:
    quick = bool(os.environ.get("BENCH_QUICK"))
    if quick:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from flairtpu.train.loop import SegmentationTrainer

    bs = int(os.environ.get("BATCH", "16" if quick else "128"))
    size = int(os.environ.get("SIZE", "64" if quick else "512"))
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
        "learning_rate": 0.02, "seed": 0, "batch_size": bs,
        "bn_dtype": os.environ.get("BN_DTYPE", "float32"),
    }
    trainer = SegmentationTrainer(config)
    trainer.replicate_to_mesh()
    step = trainer.train_step()
    rng = np.random.default_rng(0)
    batch = {
        "img": rng.integers(0, 255, (bs, size, size, 5)).astype(np.uint8),
        "msk": rng.integers(0, 19, (bs, size, size)).astype(np.int32),
    }
    img, msk, mtd = trainer._put(batch)
    args = (trainer.params, trainer.batch_stats, trainer.opt_state,
            img, msk, mtd, jax.random.PRNGKey(0))
    lowered = step.lower(*args)
    compiled = lowered.compile()

    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0] if ca else {}
    flops = float(ca.get("flops", 0.0))
    bytes_total = float(ca.get("bytes accessed", 0.0))

    buckets = parse_entry_bytes(compiled.as_text())
    n_while = buckets.pop("_while_ops", 0)
    conv_bytes = sum(v for k, v in buckets.items()
                     if k in ("convolution", "custom-call"))
    other_bytes = sum(v for k, v in buckets.items()
                      if k not in ("convolution", "custom-call"))
    parsed_total = conv_bytes + other_bytes
    # scale the parsed split to XLA's own bytes-accessed total when
    # available (the no-reuse parse overcounts operand re-reads XLA holds
    # in VMEM)
    scale = bytes_total / parsed_total if (bytes_total and parsed_total) else 1.0

    t_mxu = flops / PEAK_FLOPS
    t_conv_hbm = conv_bytes * scale / PEAK_HBM
    t_other_hbm = other_bytes * scale / PEAK_HBM
    floor_s = max(t_mxu, t_conv_hbm) + t_other_hbm
    top = sorted(((k, v * scale) for k, v in buckets.items()),
                 key=lambda kv: -kv[1])[:8]
    out = {
        "batch": bs, "size": size, "backend": jax.default_backend(),
        "bn_dtype": config["bn_dtype"],
        "xla_flops": flops, "xla_bytes_accessed": bytes_total,
        "parsed_bytes_noreuse": parsed_total,
        "parse_scale": round(scale, 4),
        "conv_bytes": conv_bytes * scale, "other_bytes": other_bytes * scale,
        "while_ops_unwalked": n_while,
        "t_mxu_ms": round(t_mxu * 1e3, 2),
        "t_conv_hbm_ms": round(t_conv_hbm * 1e3, 2),
        "t_other_hbm_ms": round(t_other_hbm * 1e3, 2),
        "floor_ms": round(floor_s * 1e3, 2),
        "floor_patches_per_sec": round(bs / floor_s, 1) if floor_s else None,
        "mfu_ceiling": round(t_mxu / floor_s, 4) if floor_s else None,
        "top_ops_bytes": {k: round(v / 1e9, 3) for k, v in top},
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
