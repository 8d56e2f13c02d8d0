"""Device-resident zone inference: gather -> forward -> stitch entirely on-TPU.

The flagship fast path (BASELINE.json north star: "fused tile-gather ->
batched forward -> weighted-blend scatter"). The whole zone raster is uploaded
to HBM once (uint8, margin-padded), a single jitted program lax.scans over
tile batches — dynamic-slice gather, normalize, bf16 U-Net forward, fused
softmax/argmax (fused XLA), dynamic-update-slice stitch into device-resident
output planes — and the stitched planes come back in ONE device-to-host
transfer.

Versus the reference loop (src/zone_detect/main.py:398-427: per-batch H2D,
full-softmax D2H, per-patch GDAL write) this removes every per-batch host
round-trip; a 4096x4096 zone is 1 H2D (~90 MB) + 1 D2H (~34 MB) total. All
four stitching modes run on device:

- exact-clipping: disjoint inner-region writes (last-write-wins scan order
  matches the host writer's tile order);
- average / average_weights: f32 prob accumulation + divisor plane, final
  argmax/scale on device (padded duplicate tiles contribute zero via a valid
  mask);
- max: best-confidence merge.

Falls back to the streaming host engine when the zone + accumulators exceed
the device-memory budget (FLAIRTPU_DEVICE_ZONE_BYTES, default 6 GiB).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from flairtpu.data.normalize import normalize_device
from flairtpu.ops.fused import scatter_accumulate, softmax_argmax
from flairtpu.zone.grid import TileGrid
from flairtpu.zone.weights import patch_weights

DEFAULT_BUDGET = 6 << 30

# Outer tile-batch scans unroll 2 iterations per loop step: measured +1.2%
# to +2.5% on the v5e chip (benchmarks/zone_scan_unroll.py; PERFORMANCE.md
# "queued TPU measurements") by halving per-iteration scheduling overhead.
# Inner scatter scans stay rolled (neutral at 8, -10% fully unrolled).
OUTER_UNROLL = 2


# mesh-aware placement lives with the other multiprocess helpers; the
# reference has no analog — zone inference is strictly single-device there
# (src/zone_detect/main.py:398-427)
from flairtpu.parallel.mesh import global_put as _global_put


def device_budget_bytes() -> int:
    return int(os.environ.get("FLAIRTPU_DEVICE_ZONE_BYTES", DEFAULT_BUDGET))


def estimate_bytes(grid: TileGrid, n_channels: int, n_classes: int,
                   method: str, output_type: str = "argmax") -> int:
    Hp = grid.height + 2 * grid.margin
    Wp = grid.width + 2 * grid.margin
    zone = Hp * Wp * n_channels
    if output_type == "class_prob":
        acc = Hp * Wp * n_classes  # K uint8 probability planes (exact clipping)
    elif method in ("average", "average_weights"):
        acc = Hp * Wp * (n_classes + 1) * 4
    else:
        acc = Hp * Wp * 6
    return zone + acc


class DeviceZoneRunner:
    """Builds and runs the scanned on-device zone program."""

    def __init__(self, config: dict, model, params, batch_stats):
        self.config = config
        self.model = model
        self.params = params
        self.batch_stats = batch_stats
        self.size = int(config["img_pixels_detection"])
        self.margin = int(config["margin"])
        self.batch = int(config.get("batch_size", 8))
        self.n_classes = int(config["n_classes"])
        self.output_type = config["output_type"]
        norma = config["norma_task"][0]
        self.norm = dict(norm_type=norma["norm_type"],
                         means=tuple(norma.get("norm_means") or ()),
                         stds=tuple(norma.get("norm_stds") or ()))
        # compiled-program cache: (method, geometry) -> jitted fn. jax.jit of a
        # fresh partial() recompiles every call; reuse across runs of one zone
        # and across the compare sweep's repeated geometries.
        self._programs: dict[tuple, object] = {}

    def _program(self, key: tuple, build):
        fn = self._programs.get(key)
        if fn is None:
            fn = jax.jit(build())
            self._programs[key] = fn
        return fn

    # -- shared pieces --

    def _forward(self, tiles_u8):
        x = normalize_device(tiles_u8, src_dtype=np.uint8, **self.norm)
        return self.model.apply(
            {"params": self.params, "batch_stats": self.batch_stats}, x, train=False)

    def _forward_inner(self, tiles_u8):
        """Margin-cropped logits; unet decodes only the interior
        (plan_inner_crops, bit-identical) and the strided-head archs window
        the head upsample (factory.decode, ulp-level agreement)."""
        from flairtpu.models.factory import INNER_DECODE_ARCHS

        m, S = self.margin, self.size
        if m > 0 and getattr(self.model, "arch", None) in INNER_DECODE_ARCHS:
            x = normalize_device(tiles_u8, src_dtype=np.uint8, **self.norm)
            return self.model.apply(
                {"params": self.params, "batch_stats": self.batch_stats}, x,
                train=False, inner_margin=m)
        return self._forward(tiles_u8)[:, m:S - m, m:S - m, :]

    def _gather(self, zone, origins):
        S = self.size
        C = zone.shape[-1]
        return jax.vmap(
            lambda rc: jax.lax.dynamic_slice(zone, (rc[0], rc[1], 0), (S, S, C))
        )(origins)

    # -- programs per stitching mode --

    def _run_exact(self, zone, origins, inner_pos, out_hw, pad):
        """exact-clipping: scatter cropped (cls, prob) into output planes."""
        zone = jnp.pad(zone, (pad[0], pad[1], (0, 0)))
        S, m = self.size, self.margin
        s = S - 2 * m
        H, W = out_hw

        def step(carry, batch):
            cls_plane, prob_plane = carry
            org, ipos = batch
            logits = self._forward_inner(self._gather(zone, org))
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
                put, (cls_plane, prob_plane), (cls, prob_u8, ipos))
            return (cls_plane, prob_plane), None

        init = (jnp.zeros((H, W), jnp.uint8), jnp.zeros((H, W), jnp.uint8))
        (cls_plane, prob_plane), _ = jax.lax.scan(
            step, init, (origins, inner_pos), unroll=OUTER_UNROLL)
        return cls_plane, prob_plane

    def _run_exact_probs(self, zone, origins, inner_pos, out_hw, pad):
        """exact-clipping class_prob: scatter margin-cropped uint8 softmax
        probabilities into K planes. The reference forces exact clipping for
        class_prob regardless of stitch method (compare.py:68), and the
        streaming path's ExactClipStitcher (needs='cropped_probs') does the
        same — this keeps the device path bit-identical to it."""
        zone = jnp.pad(zone, (pad[0], pad[1], (0, 0)))
        S, m = self.size, self.margin
        H, W = out_hw
        K = self.n_classes

        def step(plane, batch):
            org, ipos = batch
            logits = self._forward_inner(self._gather(zone, org))
            probs = jnp.round(
                jax.nn.softmax(logits.astype(jnp.float32), axis=-1) * 255
            ).astype(jnp.uint8)

            def put(plane, tile):
                p, rc = tile
                return jax.lax.dynamic_update_slice(
                    plane, p, (rc[0], rc[1], 0)), None

            plane, _ = jax.lax.scan(put, plane, (probs, ipos))
            return plane, None

        plane, _ = jax.lax.scan(step, jnp.zeros((H, W, K), jnp.uint8),
                                (origins, inner_pos), unroll=OUTER_UNROLL)
        return plane

    def _run_accumulate(self, zone, origins, valid, weighted, out_hw, pad):
        """average / average_weights: accumulate probs + divisor on device."""
        zone = jnp.pad(zone, (pad[0], pad[1], (0, 0)))
        S, m = self.size, self.margin
        Hp, Wp = out_hw  # padded accumulation planes
        K = self.n_classes
        w = (jnp.asarray(patch_weights(S), jnp.float32) if weighted
             else jnp.ones((S, S), jnp.float32))

        def step(carry, batch):
            acc, div = carry
            org, val = batch
            probs = jax.nn.softmax(self._forward(self._gather(zone, org)), axis=-1)
            contrib = probs * (w[None, :, :, None] * val[:, None, None, None])
            acc = scatter_accumulate(acc, contrib, org)
            dcontrib = (w[None] * val[:, None, None])[..., None]
            div = scatter_accumulate(div[..., None], dcontrib, org)[..., 0]
            return (acc, div), None

        init = (jnp.zeros((Hp, Wp, K), jnp.float32), jnp.zeros((Hp, Wp), jnp.float32))
        (acc, div), _ = jax.lax.scan(step, init, (origins, valid),
                                     unroll=OUTER_UNROLL)
        mean = acc / jnp.maximum(div, 1e-8)[:, :, None]
        # class_prob never reaches this program (it is forced to exact
        # clipping, reference compare.py:68) so argmax output is the only case
        cls = jnp.argmax(mean, axis=-1).astype(jnp.uint8)
        prob = jnp.round(jnp.max(mean, axis=-1) * 255).astype(jnp.uint8)
        return cls, prob

    def _run_exact_sharded(self, mesh, zone, origins, inner_pos, out_hw):
        """Multi-chip exact-clipping: forward sharded over the 'data' axis.

        Phase 1 (shard_map): each device scans its share of tile batches —
        gather from the replicated zone, forward, fused argmax — producing
        margin-cropped uint8 tiles; no cross-device traffic until the output
        all-gather. Phase 2 (replicated): sequential scatter of the (small)
        uint8 tiles into the output planes.
        """
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        S, m = self.size, self.margin
        s = S - 2 * m
        H, W = out_hw

        def local_forward(zone_l, origins_l):  # origins_l (n_local, B, 2)
            def step(_, org):
                logits = self._forward_inner(self._gather(zone_l, org))
                cls, prob = softmax_argmax(logits)
                return None, (cls.astype(jnp.uint8),
                              jnp.round(prob * 255).astype(jnp.uint8))

            _, (cls, prob) = jax.lax.scan(step, None, origins_l,
                                          unroll=OUTER_UNROLL)
            return cls.reshape(-1, s, s), prob.reshape(-1, s, s)

        sharded_fwd = shard_map(
            local_forward, mesh=mesh,
            in_specs=(P(), P("data")), out_specs=P("data"))

        cls_tiles, prob_tiles = sharded_fwd(zone, origins)

        def scatter(cls_tiles, prob_tiles, inner_pos):
            def put(carry, tile):
                cp, pp = carry
                c, p, rc = tile
                cp = jax.lax.dynamic_update_slice(cp, c, (rc[0], rc[1]))
                pp = jax.lax.dynamic_update_slice(pp, p, (rc[0], rc[1]))
                return (cp, pp), None

            init = (jnp.zeros((H, W), jnp.uint8), jnp.zeros((H, W), jnp.uint8))
            (cp, pp), _ = jax.lax.scan(put, init,
                                       (cls_tiles, prob_tiles, inner_pos))
            return cp, pp

        return jax.jit(scatter)(cls_tiles, prob_tiles,
                                inner_pos.reshape(-1, 2))

    def _run_exact_probs_sharded(self, mesh, zone, origins, inner_pos, out_hw):
        """Multi-chip class_prob: forward sharded over 'data', K-plane scatter.

        Same two-phase shape as :meth:`_run_exact_sharded` — per-device scan
        produces margin-cropped uint8 probability tiles (no cross-device
        traffic until the output all-gather), then a replicated sequential
        scatter writes the (H, W, K) plane in tile order, bit-identical to
        the single-device :meth:`_run_exact_probs`."""
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        S, m = self.size, self.margin
        s = S - 2 * m
        H, W = out_hw
        K = self.n_classes

        def local_forward(zone_l, origins_l):  # origins_l (n_local, B, 2)
            def step(_, org):
                logits = self._forward_inner(self._gather(zone_l, org))
                probs = jnp.round(
                    jax.nn.softmax(logits.astype(jnp.float32), axis=-1) * 255
                ).astype(jnp.uint8)
                return None, probs

            _, probs = jax.lax.scan(step, None, origins_l,
                                    unroll=OUTER_UNROLL)
            return probs.reshape(-1, s, s, K)

        sharded_fwd = shard_map(
            local_forward, mesh=mesh, in_specs=(P(), P("data")),
            out_specs=P("data"))
        prob_tiles = sharded_fwd(zone, origins)

        def scatter(prob_tiles, inner_pos):
            def put(plane, tile):
                p, rc = tile
                return jax.lax.dynamic_update_slice(
                    plane, p, (rc[0], rc[1], 0)), None

            plane, _ = jax.lax.scan(put, jnp.zeros((H, W, K), jnp.uint8),
                                    (prob_tiles, inner_pos))
            return plane

        return jax.jit(scatter)(prob_tiles, inner_pos.reshape(-1, 2))

    def _run_accumulate_sharded(self, mesh, zone, origins, valid, weighted,
                                out_hw):
        """Multi-chip average / average_weights: each device accumulates
        probability + divisor planes over its share of tile batches, then a
        psum over 'data' merges them (reference behavior to match:
        compare.py:118-130 under the SURVEY §2.5 plan — shard the tile grid).
        Scatter-adds commute, so the merged accumulator equals the sequential
        one up to f32 summation order."""
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        S, m = self.size, self.margin
        Hp, Wp = out_hw
        K = self.n_classes
        w = (jnp.asarray(patch_weights(S), jnp.float32) if weighted
             else jnp.ones((S, S), jnp.float32))

        def local(zone_l, origins_l, valid_l):
            def step(carry, batch):
                acc, div = carry
                org, val = batch
                probs = jax.nn.softmax(
                    self._forward(self._gather(zone_l, org)), axis=-1)
                contrib = probs * (w[None, :, :, None] * val[:, None, None, None])
                acc = scatter_accumulate(acc, contrib, org)
                dcontrib = (w[None] * val[:, None, None])[..., None]
                div = scatter_accumulate(div[..., None], dcontrib, org)[..., 0]
                return (acc, div), None

            # the accumulators vary per device (each sums its own tiles);
            # mark the replicated zero-init as 'data'-varying for shard_map
            init = jax.lax.pcast(
                (jnp.zeros((Hp, Wp, K), jnp.float32),
                 jnp.zeros((Hp, Wp), jnp.float32)), ("data",), to="varying")
            (acc, div), _ = jax.lax.scan(step, init, (origins_l, valid_l),
                                         unroll=OUTER_UNROLL)
            acc = jax.lax.psum(acc, "data")
            div = jax.lax.psum(div, "data")
            mean = acc / jnp.maximum(div, 1e-8)[:, :, None]
            cls = jnp.argmax(mean, axis=-1).astype(jnp.uint8)
            prob = jnp.round(jnp.max(mean, axis=-1) * 255).astype(jnp.uint8)
            return cls, prob

        fn = shard_map(local, mesh=mesh,
                       in_specs=(P(), P("data"), P("data")), out_specs=P())
        return fn(zone, origins, valid)

    def _run_max_sharded(self, mesh, zone, origins, out_hw):
        """Multi-chip max stitch: per-device best-confidence planes, merged by
        a first-wins argmax over the device axis (matches the sequential
        strictly-greater update order: earlier tiles live on earlier devices)."""
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        S = self.size
        Hp, Wp = out_hw

        def local(zone_l, origins_l):
            def step(carry, org):
                best_p, best_c = carry
                cls, prob = softmax_argmax(self._forward(self._gather(zone_l, org)))
                cls = cls.astype(jnp.uint8)

                def put(carry, tile):
                    bp, bc = carry
                    c, p, rc = tile
                    r0, c0 = rc[0], rc[1]
                    cur_p = jax.lax.dynamic_slice(bp, (r0, c0), (S, S))
                    cur_c = jax.lax.dynamic_slice(bc, (r0, c0), (S, S))
                    better = p > cur_p
                    bp = jax.lax.dynamic_update_slice(
                        bp, jnp.where(better, p, cur_p), (r0, c0))
                    bc = jax.lax.dynamic_update_slice(
                        bc, jnp.where(better, c, cur_c), (r0, c0))
                    return (bp, bc), None

                (best_p, best_c), _ = jax.lax.scan(
                    put, (best_p, best_c), (cls, prob, org))
                return (best_p, best_c), None

            init = jax.lax.pcast(
                (jnp.zeros((Hp, Wp), jnp.float32),
                 jnp.zeros((Hp, Wp), jnp.uint8)), ("data",), to="varying")
            (best_p, best_c), _ = jax.lax.scan(step, init, origins_l,
                                               unroll=OUTER_UNROLL)
            return best_p[None], best_c[None]

        fn = shard_map(local, mesh=mesh,
                       in_specs=(P(), P("data")), out_specs=P("data"))
        bp, bc = fn(zone, origins)  # (n_dev, Hp, Wp), device-sharded on axis 0

        def merge(bp, bc):
            idx = jnp.argmax(bp, axis=0)  # ties -> lowest device (first wins)
            prob = jnp.take_along_axis(bp, idx[None], axis=0)[0]
            cls = jnp.take_along_axis(bc, idx[None], axis=0)[0]
            return cls, jnp.round(prob * 255).astype(jnp.uint8)

        return jax.jit(merge)(bp, bc)

    def _run_exact_banded(self, zone_np: np.ndarray, tiles, pad_lo: int,
                          out_hw, n_bands: int):
        """Pipelined exact-clipping: row bands overlap H2D / compute / D2H.

        The zone stays on the host; each band uploads only its slab (rows it
        gathers from), dispatches the band program asynchronously, and the
        previous band's (small) output planes are fetched while the next band
        computes. Hides most of the per-zone transfer latency that a single
        monolithic program serializes (one H2D -> compute -> one D2H).
        """
        S, m, B = self.size, self.margin, self.batch
        s = S - 2 * m
        Ho, Wo = out_hw

        # rows enumerate bottom-up in the grid (grid.py), so the unbanded scan
        # writes high row0 first and LOW row0 last; realigned-row overlaps are
        # won by the upper row. Process bands in descending row order so the
        # band containing lower rows still writes last.
        rows = sorted({t.row0 for t in tiles}, reverse=True)
        n_bands = max(1, min(n_bands, len(rows)))
        per = -(-len(rows) // n_bands)
        bands = [set(rows[i * per:(i + 1) * per]) for i in range(n_bands)]
        bands = [b for b in bands if b]

        # uniform compiled shapes across bands
        slab_h = max(max(r for r in b) - min(r for r in b) for b in bands) + S
        out_h = max(
            min(max(r for r in b) + S - m, Ho) - max(min(r for r in b) + m, 0)
            for b in bands)

        def band_prog(slab, origins, inner_pos):
            def step(carry, batch):
                cls_plane, prob_plane = carry
                org, ipos = batch
                logits = self._forward_inner(self._gather(slab, org))
                cls, prob = softmax_argmax(logits)
                cls = cls.astype(jnp.uint8)
                prob_u8 = jnp.round(prob * 255).astype(jnp.uint8)

                def put(carry, tile):
                    cp, pp = carry
                    c, p, rc = tile
                    cp = jax.lax.dynamic_update_slice(cp, c, (rc[0], rc[1]))
                    pp = jax.lax.dynamic_update_slice(pp, p, (rc[0], rc[1]))
                    return (cp, pp), None

                (cls_plane, prob_plane), _ = jax.lax.scan(
                    put, (cls_plane, prob_plane), (cls, prob_u8, ipos))
                return (cls_plane, prob_plane), None

            init = (jnp.zeros((out_h, Wo), jnp.uint8),
                    jnp.zeros((out_h, Wo), jnp.uint8))
            (cp, pp), _ = jax.lax.scan(step, init, (origins, inner_pos),
                                       unroll=OUTER_UNROLL)
            return cp, pp

        prog = self._program(("exact-banded", out_h, Wo, slab_h, S, m, B),
                             lambda: band_prog)

        cls_out = np.zeros((Ho, Wo), np.uint8)
        prob_out = np.zeros((Ho, Wo), np.uint8)
        pending = None  # (result, out_lo, valid_h)

        for band in bands:
            btiles = [t for t in tiles if t.row0 in band]
            r_lo = min(t.row0 for t in btiles) + pad_lo  # padded-zone coords
            out_lo = max(min(t.row0 for t in btiles) + m, 0)
            valid_h = min(max(t.row0 for t in btiles) + S - m, Ho) - out_lo
            n = len(btiles)
            n_pad = (-n) % B
            btiles = btiles + [btiles[-1]] * n_pad
            origins = np.array(
                [(t.row0 + pad_lo - r_lo, t.col0 + pad_lo) for t in btiles],
                np.int32).reshape(-1, B, 2)
            inner = np.array(
                [(min(max(t.irow0 - out_lo, 0), out_h - s),
                  min(t.icol0, Wo - s)) for t in btiles],
                np.int32).reshape(-1, B, 2)
            slab = zone_np[r_lo : r_lo + slab_h]
            if slab.shape[0] < slab_h:
                slab = np.pad(slab, ((0, slab_h - slab.shape[0]), (0, 0), (0, 0)))
            res = prog(jax.device_put(slab), jnp.asarray(origins),
                       jnp.asarray(inner))
            if pending is not None:
                self._collect_band(pending, cls_out, prob_out)
            pending = (res, out_lo, valid_h)
        if pending is not None:
            self._collect_band(pending, cls_out, prob_out)
        return cls_out, prob_out

    @staticmethod
    def _collect_band(pending, cls_out, prob_out):
        (cp, pp), out_lo, valid_h = pending
        cls_out[out_lo : out_lo + valid_h] = np.asarray(cp)[:valid_h]
        prob_out[out_lo : out_lo + valid_h] = np.asarray(pp)[:valid_h]

    def _run_max(self, zone, origins, out_hw, pad):
        zone = jnp.pad(zone, (pad[0], pad[1], (0, 0)))
        S = self.size
        Hp, Wp = out_hw

        def step(carry, org):
            best_p, best_c = carry
            cls, prob = softmax_argmax(self._forward(self._gather(zone, org)))
            cls = cls.astype(jnp.uint8)

            def put(carry, tile):
                bp, bc = carry
                c, p, rc = tile
                r0, c0 = rc[0], rc[1]
                cur_p = jax.lax.dynamic_slice(bp, (r0, c0), (S, S))
                cur_c = jax.lax.dynamic_slice(bc, (r0, c0), (S, S))
                better = p > cur_p
                bp = jax.lax.dynamic_update_slice(bp, jnp.where(better, p, cur_p), (r0, c0))
                bc = jax.lax.dynamic_update_slice(bc, jnp.where(better, c, cur_c), (r0, c0))
                return (bp, bc), None

            (best_p, best_c), _ = jax.lax.scan(put, (best_p, best_c), (cls, prob, org))
            return (best_p, best_c), None

        init = (jnp.zeros((Hp, Wp), jnp.float32), jnp.zeros((Hp, Wp), jnp.uint8))
        (best_p, best_c), _ = jax.lax.scan(step, init, origins,
                                           unroll=OUTER_UNROLL)
        return best_c, jnp.round(best_p * 255).astype(jnp.uint8)

    # -- host orchestration --

    def run(self, reader, grid: TileGrid, method: str, mesh=None,
            staged: dict | None = None) -> dict:
        """Returns host arrays: {'cls','prob'} or {'probs'} (class_prob).

        With a multi-device ``mesh``, every mode (all four stitch methods and
        both output types) shards tile batches over the 'data' axis
        (shard_map).
        ``staged`` (from :func:`flairtpu.zone.engine.stage_zone`) supplies a
        pre-read zone and an already-in-flight H2D transfer.
        """
        import time

        S, m, B = self.size, self.margin, self.batch
        H, W = grid.height, grid.width
        n_dev = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
        # all four stitch modes AND both output types shard the tile grid
        # over the 'data' axis when a multi-device mesh is given
        use_sharded = mesh is not None and n_dev > 1
        if use_sharded:
            from jax.sharding import PartitionSpec as P

            rep, dsh = P(), P("data")
            gput = partial(_global_put, mesh=mesh)
            if jax.process_count() > 1:
                # the shard_map programs close over the model state; on a
                # multi-host mesh it must be a global (replicated) array,
                # not a process-local buffer
                self.params = jax.tree_util.tree_map(
                    lambda a: gput(a, spec=rep), self.params)
                self.batch_stats = jax.tree_util.tree_map(
                    lambda a: gput(a, spec=rep), self.batch_stats)
                # fold / int8 models carry weights OUTSIDE the params tree
                # (FoldedZoneModel.enc_folded/dec_folded, QuantizedZoneModel
                # .qparams/dec_qparams/dec_folded) that the programs also
                # close over — re-place those as globals too
                for attr in ("enc_folded", "dec_folded", "qparams",
                             "dec_qparams"):
                    tree = getattr(self.model, attr, None)
                    if tree:
                        setattr(self.model, attr, jax.tree_util.tree_map(
                            lambda a: gput(a, spec=rep)
                            if hasattr(a, "dtype") else a, tree))
        # pad the zone so every full patch window is a valid static slice:
        # origins live in [0, H+2m-S] (grid clamps the last row/col), so m on
        # each side exactly covers every S-row gather; zones smaller than a
        # patch need extra tail padding so the padded extent reaches S
        pad_lo = m
        pad_hi_r = max(m, S - H - m)
        pad_hi_c = max(m, S - W - m)
        t0 = time.perf_counter()
        if staged is not None:
            # zone pre-read (and its H2D possibly already in flight) by
            # engine.stage_zone — sweep combos and batch mode reuse/overlap it
            zone_np = staged["zone_np"]
            t_read = float(staged.get("read_seconds", 0.0))
        else:
            zone_np = np.ascontiguousarray(
                np.moveaxis(reader.read(self.config["channels"]), 0, -1))  # (H, W, C)
            t_read = time.perf_counter() - t0
        pad = ((pad_lo, pad_hi_r), (pad_lo, pad_hi_c))

        tiles = grid.tiles
        n = len(tiles)
        n_pad = (-n) % (B * n_dev if use_sharded else B)
        # pad with duplicates of the last tile: exact/max modes rewrite the
        # same values (harmless); accumulate modes mask them with valid=0
        all_tiles = tiles + [tiles[-1]] * n_pad
        origins = np.array(
            [(t.row0 + pad_lo, t.col0 + pad_lo) for t in all_tiles], np.int32)
        valid = np.array([1.0] * n + [0.0] * n_pad, np.float32)

        t0 = time.perf_counter()
        ob = origins.reshape(-1, B, 2)
        vb = valid.reshape(-1, B)
        timings: dict[str, float] = {}
        # banded/sharded exact paths ship the zone themselves; every other
        # (monolithic) program gathers from one device-resident upload
        n_bands = int(os.environ.get("FLAIRTPU_ZONE_BANDS", "1"))
        banded = (method == "exact-clipping" and self.output_type == "argmax"
                  and not use_sharded and n_bands > 1
                  and len({t.row0 for t in tiles}) >= n_bands)
        zone_dev = None
        if not (banded or use_sharded):
            th = time.perf_counter()
            if staged is not None and staged.get("zone_dev") is not None:
                # transfer started by stage_zone; the wait here is only the
                # residual (0 when it overlapped earlier work)
                zone_dev = jax.block_until_ready(staged["zone_dev"])
            else:
                zone_dev = jax.block_until_ready(jax.device_put(zone_np))
            timings["h2d_seconds"] = time.perf_counter() - th

        zone_rep = None
        if use_sharded:
            # replicated padded-zone upload, cached on the staged dict so
            # sweep combinations with the same padding reuse the transfer —
            # mirrors the single-device zone_dev staging in stage_zone
            if staged is not None and staged.get("_rep_pad") == pad \
                    and staged.get("_rep_zone") is not None:
                zone_rep = staged["_rep_zone"]
            else:
                th = time.perf_counter()
                zone_rep = gput(np.pad(zone_np, (pad[0], pad[1], (0, 0))),
                                spec=rep)
                timings["h2d_seconds"] = time.perf_counter() - th
                if staged is not None:
                    staged["_rep_pad"] = pad
                    staged["_rep_zone"] = zone_rep

        def _timed_compute(fn, *args):
            tc = time.perf_counter()
            out = jax.block_until_ready(fn(*args))
            timings["compute_seconds"] = time.perf_counter() - tc
            td = time.perf_counter()
            host = jax.tree_util.tree_map(np.asarray, out)
            timings["d2h_seconds"] = time.perf_counter() - td
            return host

        if self.output_type == "class_prob":
            # class_prob forces exact clipping for every method, matching the
            # reference (compare.py:68) and the streaming ExactClipStitcher
            s = S - 2 * m
            inner = np.array([(t.irow0, t.icol0) for t in all_tiles], np.int32)
            Ho, Wo = max(H, s), max(W, s)
            inner[:, 0] = np.minimum(inner[:, 0], Ho - s)
            inner[:, 1] = np.minimum(inner[:, 1], Wo - s)
            if use_sharded:
                probs = np.asarray(self._run_exact_probs_sharded(
                    mesh, zone_rep, gput(ob, spec=dsh),
                    gput(inner.reshape(-1, B, 2), spec=rep),
                    out_hw=(Ho, Wo)))[:H, :W]
            else:
                fn = self._program(("exact-probs", Ho, Wo, S, m, self.batch, pad),
                                   lambda: partial(self._run_exact_probs,
                                                   out_hw=(Ho, Wo), pad=pad))
                probs = _timed_compute(fn, zone_dev, jnp.asarray(ob),
                                       jnp.asarray(inner.reshape(-1, B, 2)))[:H, :W]
            result = {"probs": np.moveaxis(probs, -1, 0)}
        elif method == "exact-clipping":
            s = S - 2 * m
            inner = np.array([(t.irow0, t.icol0) for t in all_tiles], np.int32)
            # clamp so the static s x s write stays in-plane (inner regions of
            # realigned tiles already satisfy this when H,W >= s)
            Ho, Wo = max(H, s), max(W, s)
            inner[:, 0] = np.minimum(inner[:, 0], Ho - s)
            inner[:, 1] = np.minimum(inner[:, 1], Wo - s)
            # banding multiplies transfer COUNT (overlapping slabs + per-band
            # readbacks); on links with high per-transfer latency (the tunneled
            # dev TPU) that loses to the monolithic single-upload program
            # (measured 43 vs 63 patches/s), so it is opt-in for hardware with
            # proper DMA overlap
            if use_sharded:
                cls, prob = self._run_exact_sharded(
                    mesh, zone_rep, gput(ob, spec=dsh),
                    gput(inner.reshape(-1, B, 2), spec=rep), out_hw=(Ho, Wo))
                packed = np.asarray(jnp.stack([cls, prob]))
            elif banded:
                zone_padded = np.pad(zone_np, (pad[0], pad[1], (0, 0)))
                cls, prob = self._run_exact_banded(
                    zone_padded, tiles, pad_lo, out_hw=(Ho, Wo), n_bands=n_bands)
                packed = np.stack([cls, prob])
            else:
                fn = self._program(("exact", Ho, Wo, S, m, self.batch, pad),
                                   lambda: partial(self._run_exact, out_hw=(Ho, Wo), pad=pad))
                # device program packs both planes: one D2H round trip
                pfn = lambda z, o, i: jnp.stack(fn(z, o, i))  # noqa: E731
                packed = _timed_compute(pfn, zone_dev, jnp.asarray(ob),
                                        jnp.asarray(inner.reshape(-1, B, 2)))
            result = {"cls": packed[0, :H, :W], "prob": packed[1, :H, :W]}
        elif method in ("average", "average_weights"):
            Hp, Wp = H + pad_lo + pad_hi_r, W + pad_lo + pad_hi_c
            if use_sharded:
                cls, prob = self._run_accumulate_sharded(
                    mesh, zone_rep, gput(ob, spec=dsh),
                    gput(vb, spec=dsh), weighted=(method == "average_weights"),
                    out_hw=(Hp, Wp))
                packed = np.asarray(jnp.stack([cls, prob]))
            else:
                fn = self._program((method, Hp, Wp, S, m, self.batch, pad),
                                   lambda: partial(self._run_accumulate,
                                                   weighted=(method == "average_weights"),
                                                   out_hw=(Hp, Wp), pad=pad))
                pfn = lambda z, o, v: jnp.stack(fn(z, o, v))  # noqa: E731
                packed = _timed_compute(pfn, zone_dev, jnp.asarray(ob),
                                        jnp.asarray(vb))
            result = {"cls": packed[0, pad_lo:pad_lo + H, pad_lo:pad_lo + W],
                      "prob": packed[1, pad_lo:pad_lo + H, pad_lo:pad_lo + W]}
        elif method == "max":
            Hp, Wp = H + pad_lo + pad_hi_r, W + pad_lo + pad_hi_c
            if use_sharded:
                cls, prob = self._run_max_sharded(
                    mesh, zone_rep, gput(ob, spec=dsh),
                    out_hw=(Hp, Wp))
                packed = np.asarray(jnp.stack([cls, prob]))
            else:
                fn = self._program(("max", Hp, Wp, S, m, self.batch, pad),
                                   lambda: partial(self._run_max, out_hw=(Hp, Wp), pad=pad))
                pfn = lambda z, o: jnp.stack(fn(z, o))  # noqa: E731
                packed = _timed_compute(pfn, zone_dev, jnp.asarray(ob))
            result = {"cls": packed[0, pad_lo:pad_lo + H, pad_lo:pad_lo + W],
                      "prob": packed[1, pad_lo:pad_lo + H, pad_lo:pad_lo + W]}
        else:
            raise ValueError(f"unknown stitching method {method!r}")
        t_run = time.perf_counter() - t0
        return dict(result, tiles=n, seconds=t_run, read_seconds=t_read,
                    patches_per_sec=n / t_run if t_run else 0.0, **timings)
