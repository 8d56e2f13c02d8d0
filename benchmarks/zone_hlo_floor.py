"""Compiler-grounded roofline for the PRODUCTION zone-inference program.

The inference-side analog of train_hlo_floor.py: the headline number
(bench.py, 1,951 p/s chained / 0.478 MFU on v5e) is measured wall-clock;
this script asks the compiler what the same program costs. It lowers the
EXACT device-resident exact-clipping program bench.py measures — one jitted
lax.scan over tile batches fusing dynamic-slice gather -> bf16 inner-margin
forward -> softmax/argmax -> dynamic-update-slice stitch, batch 128 on a
4096^2 5-ch zone (zone/device_engine.py:130 `_run_exact`) — and reads back
XLA's cost analysis of the optimized executable (flops + bytes accessed,
both of which include `while` bodies x trip counts).

Interpretation guard (same caveat as benchmarks/model_census.py): XLA's
HLO-level "bytes accessed" overcounts real HBM traffic because VMEM
residency is not modeled, so the bytes-roofline is a PESSIMISTIC estimate,
not a true floor; flops/peak IS a true floor. The script prints both
brackets plus where the measured number lands between them, so the headline
MFU claim is grounded in the compiler's accounting rather than wall-clock
ratios alone.

Run on the TPU:  python benchmarks/zone_hlo_floor.py
CPU quick mode:  BENCH_QUICK=1 python benchmarks/zone_hlo_floor.py
(CPU compiles a different fusion plan — numbers are indicative only.)
"""

from __future__ import annotations

import json
import os
import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PEAK_FLOPS = 197e12  # v5e bf16
PEAK_HBM = 819e9     # v5e HBM bytes/s


def main() -> None:
    quick = bool(os.environ.get("BENCH_QUICK"))
    if quick:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from flairtpu.models.factory import create_model, init_model
    from flairtpu.zone.device_engine import DeviceZoneRunner
    from flairtpu.zone.grid import slice_grid

    # bench.py production geometry (quick mode shrinks everything)
    ZONE = 512 if quick else 4096
    SIZE = 128 if quick else 512
    MARGIN = SIZE // 4
    BATCH = int(os.environ.get("BATCH", "4" if quick else "128"))
    N_CLASSES = 19

    config = {
        "model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {"encoder_decoder": "resnet34_unet"},
        },
        "channels": [1, 2, 3, 4, 5],
        "img_pixels_detection": SIZE,
        "margin": MARGIN,
        "output_type": "argmax",
        "n_classes": N_CLASSES,
        "batch_size": BATCH,
        "norma_task": [{"norm_type": "scaling", "norm_means": [],
                        "norm_stds": []}],
    }
    dtype = jnp.float32 if quick else jnp.bfloat16
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        model = create_model(config, dtype=dtype)
        params, batch_stats = init_model(model, (1, SIZE, SIZE, 5))
    runner = DeviceZoneRunner(config, model, params, batch_stats)

    stride = SIZE - 2 * MARGIN
    grid = slice_grid(ZONE, ZONE, SIZE, MARGIN, stride, None, None)
    n_tiles = len(list(grid.tiles))
    n_batches = -(-n_tiles // BATCH)
    pad = ((MARGIN, MARGIN), (MARGIN, MARGIN))

    fn = partial(runner._run_exact, out_hw=(ZONE, ZONE), pad=pad)
    zone_aval = jax.ShapeDtypeStruct((ZONE, ZONE, 5), jnp.uint8)
    org_aval = jax.ShapeDtypeStruct((n_batches, BATCH, 2), jnp.int32)
    inner_aval = jax.ShapeDtypeStruct((n_batches, BATCH, 2), jnp.int32)
    compiled = jax.jit(fn).lower(zone_aval, org_aval, inner_aval).compile()

    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    flops = float(ca.get("flops", 0.0))
    bytes_total = float(ca.get("bytes accessed", 0.0))
    n_padded = n_batches * BATCH

    t_mxu = flops / PEAK_FLOPS
    t_hbm = bytes_total / PEAK_HBM
    floor_s = max(t_mxu, t_hbm)
    out = {
        "zone": ZONE, "size": SIZE, "margin": MARGIN, "batch": BATCH,
        "backend": jax.default_backend(),
        "tiles": n_tiles, "padded_tiles": n_padded,
        "xla_flops": flops,
        "xla_gflops_per_patch": round(flops / n_padded / 1e9, 2),
        "xla_bytes_accessed": bytes_total,
        "xla_bytes_per_patch_mb": round(bytes_total / n_padded / 1e6, 1),
        "arith_intensity": round(flops / bytes_total, 1) if bytes_total else None,
        # true ceiling (FLOPs at peak MXU) and pessimistic bytes bracket
        "mxu_ceiling_patches_per_sec": round(n_padded / t_mxu, 1) if t_mxu else None,
        "costmodel_patches_per_sec": round(n_padded / floor_s, 1) if floor_s else None,
        "costmodel_mfu": round(t_mxu / floor_s, 4) if floor_s else None,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
