"""Does lax.scan unrolling buy anything in the zone exact-clipping program?

The production program (zone/device_engine._run_exact) is two nested scans:
an outer scan over tile batches (gather -> forward -> fused softmax/argmax)
and an inner scan over the batch doing two dynamic_update_slice per tile.
PERFORMANCE.md accounts the chained compute rate (1907 p/s) vs pure forward
(2126 p/s) as ~1.3% gather/scatter (zone_movement_floor) plus unexplained
"scan overhead". This measures program variants with `unroll` on either scan
to see whether XLA's per-iteration scheduling is the residual.

Methodology: chained data-dependent calls + one scalar fetch + chain-length
differencing (CLAUDE.md timing hazards). Usage:
  python benchmarks/zone_scan_unroll.py [--batch 128]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SIZE, MARGIN, ZONE = 512, 128, 4096


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--combos", default="1:1,1:8,1:128,2:1,2:8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from flairtpu.models.factory import create_model, init_model
    from flairtpu.zone.device_engine import DeviceZoneRunner
    from flairtpu.zone.grid import slice_grid

    B = args.batch
    config = {
        "model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {"encoder_decoder": "resnet34_unet"},
        },
        "channels": [1, 2, 3, 4, 5],
        "img_pixels_detection": SIZE, "margin": MARGIN,
        "output_type": "argmax", "n_classes": 19, "batch_size": B,
        "norma_task": [{"norm_type": "scaling", "norm_means": [],
                        "norm_stds": []}],
    }
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = create_model(config, dtype=dtype)
    params, stats = init_model(model, (1, SIZE, SIZE, 5))
    runner = DeviceZoneRunner(config, model, params, stats)

    from flairtpu.ops.fused import softmax_argmax

    rng = np.random.default_rng(0)
    zone_np = rng.integers(0, 255, (ZONE, ZONE, 5)).astype(np.uint8)
    grid = slice_grid(ZONE, ZONE, SIZE, MARGIN, SIZE - 2 * MARGIN, None, None)
    m, S = MARGIN, SIZE
    s = S - 2 * m
    tiles = list(grid.tiles)
    n = len(tiles)
    n_pad = (-n) % B
    all_tiles = tiles + [tiles[-1]] * n_pad
    ob = np.array([(t.row0 + m, t.col0 + m) for t in all_tiles],
                  np.int32).reshape(-1, B, 2)
    inner = np.array([(min(t.irow0, ZONE - s), min(t.icol0, ZONE - s))
                      for t in all_tiles], np.int32).reshape(-1, B, 2)
    print(f"{n} tiles, batch {B}, {ob.shape[0]} outer steps")

    def build(unroll_outer: int, unroll_inner: int):
        def run(zone, origins, inner_pos):
            zone = jnp.pad(zone, ((m, m), (m, m), (0, 0)))

            def step(carry, batch):
                cls_plane, prob_plane = carry
                org, ipos = batch
                logits = runner._forward_inner(runner._gather(zone, org))
                cls, prob = softmax_argmax(logits)
                cls = cls.astype(jnp.uint8)
                prob_u8 = jnp.round(prob * 255).astype(jnp.uint8)

                def put(carry, tile):
                    cp, pp, c, p = carry[0], carry[1], tile[0], tile[1]
                    r0, c0 = tile[2][0], tile[2][1]
                    cp = jax.lax.dynamic_update_slice(cp, c, (r0, c0))
                    pp = jax.lax.dynamic_update_slice(pp, p, (r0, c0))
                    return (cp, pp), None

                (cls_plane, prob_plane), _ = jax.lax.scan(
                    put, (cls_plane, prob_plane), (cls, prob_u8, ipos),
                    unroll=unroll_inner)
                return (cls_plane, prob_plane), None

            init = (jnp.zeros((ZONE, ZONE), jnp.uint8),
                    jnp.zeros((ZONE, ZONE), jnp.uint8))
            (cp, pp), _ = jax.lax.scan(step, init, (origins, inner_pos),
                                       unroll=unroll_outer)
            return cp, pp

        return jax.jit(run)

    zone_dev = jax.device_put(zone_np)
    ob_j = jax.device_put(jnp.asarray(ob))
    inner_j = jax.device_put(jnp.asarray(inner))

    for combo in args.combos.split(","):
        uo, ui = (int(x) for x in combo.split(":"))
        fn = build(uo, ui)

        def chain(k: int) -> float:
            t0 = time.perf_counter()
            o = ob_j
            cls = prob = None
            for _ in range(k):
                cls, prob = fn(zone_dev, o, inner_j)
                o = ob_j + ((cls[0, 0].astype(jnp.int32)
                             + prob[0, 0].astype(jnp.int32)) & 0)
            np.asarray(jnp.sum(cls.astype(jnp.int32))
                       + jnp.sum(prob.astype(jnp.int32)))
            return time.perf_counter() - t0

        t0 = time.perf_counter()
        chain(1)  # compile + warm
        compile_s = time.perf_counter() - t0
        n1, n2 = 2, 6
        per_call = min((chain(n2) - chain(n1)) / (n2 - n1) for _ in range(3))
        print(f"unroll outer={uo} inner={ui}: {per_call * 1000:7.1f} ms/zone "
              f"= {n / per_call:7.1f} p/s  (first call {compile_s:.1f}s)")


if __name__ == "__main__":
    main()
