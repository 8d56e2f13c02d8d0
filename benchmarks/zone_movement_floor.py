"""Bound what a Pallas gather/scatter could buy the zone program.

Times the device-resident zone program (gather -> forward -> fused
softmax/argmax -> scatter) against a no-model variant (same gather and
scatter shapes, trivial per-tile payload). The difference is conv compute;
the no-model time is the data-movement floor that a custom Pallas
gather/scatter kernel could at best eliminate. Run on the TPU.

Timing methodology (tunnel hazard, see CLAUDE.md): jax.block_until_ready
can return EARLY on the tunneled backend, and every real fetch carries
seconds of fixed latency. The floor is therefore measured by chaining
data-dependent calls (output planes feed the next call), forcing completion
with one scalar D2H fetch, and differencing two chain lengths so the fixed
fetch latency cancels. Measured on the v5e chip: 3.2 ms/zone (256 tiles,
batch 128) = ~1.3% of the 242 ms device compute — a hand-written Pallas
gather/scatter has nothing meaningful to win.

Usage: python benchmarks/zone_movement_floor.py [--batch 128]
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
    args = ap.parse_args()

    import tempfile

    import jax
    import jax.numpy as jnp

    from flairtpu.io import TiffReader
    from flairtpu.io.tiff import Affine, write_array
    from flairtpu.models.factory import create_model, init_model
    from flairtpu.zone.device_engine import DeviceZoneRunner
    from flairtpu.zone.grid import slice_grid

    config = {
        "model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {"encoder_decoder": "resnet34_unet"},
        },
        "channels": [1, 2, 3, 4, 5],
        "img_pixels_detection": SIZE, "margin": MARGIN,
        "output_type": "argmax", "n_classes": 19, "batch_size": args.batch,
        "norma_task": [{"norm_type": "scaling", "norm_means": [], "norm_stds": []}],
    }
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = create_model(config, dtype=dtype)
    params, stats = init_model(model, (1, SIZE, SIZE, 5))
    runner = DeviceZoneRunner(config, model, params, stats)

    rng = np.random.default_rng(0)
    zone_np = rng.integers(0, 255, (5, ZONE, ZONE)).astype(np.uint8)
    tmp = Path(tempfile.mkdtemp()) / "zone.tif"
    write_array(tmp, zone_np, transform=Affine.from_origin(0, 1000, 0.2, 0.2),
                crs=2154, compress=None)

    with TiffReader(tmp) as reader:
        grid = slice_grid(reader.width, reader.height, SIZE, MARGIN,
                          SIZE - 2 * MARGIN, reader.transform, reader.crs)
        print(f"{len(grid)} tiles, batch {args.batch}")
        t0 = time.perf_counter()
        runner.run(reader, grid, "exact-clipping")
        c0 = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = runner.run(reader, grid, "exact-clipping")
        dt_full = time.perf_counter() - t0
    print(f"full program: first {c0:.2f}s, steady {dt_full:.3f}s end-to-end "
          f"({len(grid) / dt_full:.0f} p/s incl. H2D/D2H)")
    compute = out.get("compute_seconds")
    if compute:
        print(f"  compute_seconds {compute:.3f} "
              f"({len(grid) / compute:.0f} p/s device compute)")

    # movement floor: same gather + scatter shapes, trivial payload
    B = args.batch
    m, S = MARGIN, SIZE
    s = S - 2 * m
    zone_hw = np.ascontiguousarray(np.moveaxis(zone_np, 0, -1))
    zone_pad = np.pad(zone_hw, ((m, m), (m, m), (0, 0)))
    origins = grid.tile_origins() + m  # padded coords, always in range
    inner = np.stack([np.clip(grid.tile_origins()[:, 0] + m, 0, ZONE - s),
                      np.clip(grid.tile_origins()[:, 1] + m, 0, ZONE - s)], 1)
    pad_n = (-len(origins)) % B
    if pad_n:
        origins = np.concatenate([origins, np.repeat(origins[-1:], pad_n, 0)])
        inner = np.concatenate([inner, np.repeat(inner[-1:], pad_n, 0)])
    origins = origins.reshape(-1, B, 2).astype(np.int32)
    inner = inner.reshape(-1, B, 2).astype(np.int32)

    @jax.jit
    def floor_prog(planes, zone, org_b, inner_b):
        def step(carry, batch):
            cls_plane, prob_plane = carry
            org, ipos = batch
            tiles_u8 = jax.vmap(
                lambda o: jax.lax.dynamic_slice(zone, (o[0], o[1], 0),
                                                (S, S, 5)))(org)
            crop = tiles_u8[:, m:S - m, m:S - m, :]
            # xor with a carry pixel: makes each chained call depend on the
            # previous output so calls cannot be reordered/elided
            cls, prob = crop[..., 0] ^ cls_plane[0, 0], crop[..., 1]

            def put(c, t):
                cp, pp = c
                cc, p, rc = t
                cp = jax.lax.dynamic_update_slice(cp, cc, (rc[0], rc[1]))
                pp = jax.lax.dynamic_update_slice(pp, p, (rc[0], rc[1]))
                return (cp, pp), None

            (cls_plane, prob_plane), _ = jax.lax.scan(
                put, (cls_plane, prob_plane), (cls, prob, ipos))
            return (cls_plane, prob_plane), None

        (cp, pp), _ = jax.lax.scan(step, planes, (org_b, inner_b))
        return cp, pp

    zone_dev = jax.device_put(zone_pad)
    org_dev = jax.device_put(origins)
    inner_dev = jax.device_put(inner)

    def chain(n):
        """n chained floor calls, completion forced by a scalar D2H fetch;
        returns wall seconds (includes one fixed tunnel fetch latency)."""
        planes = (jnp.zeros((ZONE, ZONE), jnp.uint8),
                  jnp.zeros((ZONE, ZONE), jnp.uint8))
        t0 = time.perf_counter()
        for _ in range(n):
            planes = floor_prog(planes, zone_dev, org_dev, inner_dev)
        np.asarray(jnp.sum(planes[0].astype(jnp.int32)))
        return time.perf_counter() - t0

    chain(1)  # compile + warm
    n1, n2 = 2, 10
    dt_floor = min((chain(n2) - chain(n1)) / (n2 - n1) for _ in range(3))
    base = compute or dt_full
    print(f"gather+scatter floor (no model, device-resident, chained diff): "
          f"{dt_floor * 1000:.1f} ms = {100 * dt_floor / base:.1f}% of device compute")
    print(f"-> upper bound on any Pallas gather/scatter win: "
          f"{dt_floor * 1000:.1f} ms/zone")


if __name__ == "__main__":
    main()
