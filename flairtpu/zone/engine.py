"""Zone inference engine: the perf-critical flair-detect pipeline.

Rebuilds the reference hot loop (src/zone_detect/main.py:386-433: windowed
GDAL read -> H2D -> forward -> full softmax D2H -> numpy crop -> serial GDAL
write per patch) as a TPU pipeline:

- host reader threads decode tile windows from the first-party TIFF codec
  (thread-safe block cache shares decodes between overlapping tiles);
- one jitted device program per payload kind fuses normalize -> encoder/decoder
  forward (bf16 on the MXU) -> margin crop -> softmax/argmax/confidence (fused XLA
  on TPU) -> uint8 pack, so the D2H transfer is 2 uint8 planes per tile
  instead of K float32 planes;
- batches are real batches with a padded tail (one compiled shape);
- reads, device compute, and stitcher writes overlap via a bounded queue;
- the output raster is written once at close (tiled BigTIFF, parallel
  compression) instead of per-patch read-modify-write.
"""

from __future__ import annotations

import datetime
import json
import queue
import threading
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from flairtpu.data.normalize import normalize_device
from flairtpu.io import TiffReader, TiffWriter, Window
from flairtpu.models.factory import create_model, init_model
from flairtpu.ops.fused import softmax_argmax
from flairtpu.train.checkpoints import load_pretrained
from flairtpu.train.loop import default_compute_dtype
from flairtpu.utils.logger import tee_stdout, untee_stdout
from flairtpu.zone.grid import TileGrid, get_stride, slice_grid
from flairtpu.zone.stitch import make_stitcher


# ---------------------------------------------------------------------------
# model preparation (reference zone_detect/model.py:61-88 + main.py:186-203)
# ---------------------------------------------------------------------------

def prepare_model(config: dict, dtype=None):
    dtype = dtype or default_compute_dtype()
    model = create_model(config, dtype=dtype)
    n_ch = len(config["channels"])
    # dummy init shape: 64 suffices for every arch except pan, whose FPA
    # pyramid pools the stride-16 map down twice and needs it >= 8px
    s = 128 if getattr(model, "arch", None) == "pan" else 64
    params, batch_stats = init_model(model, (1, s, s, n_ch))
    variables = load_pretrained(
        config["model_weights"], {"params": params, "batch_stats": batch_stats},
        strict=True)
    print("    [x] loaded model and weights...")
    params, batch_stats = variables["params"], variables["batch_stats"]
    if config.get("quantize"):
        from flairtpu.models.quantize import (quantize_model,
                                              read_calibration_batches)

        # bn_fold composes: the int8 path's folded-FLOAT sites (shallow
        # decoder blocks + head) run in the compute dtype instead of fp32
        float_dtype = (getattr(model, "dtype", None)
                       if config.get("bn_fold") else None)
        model = quantize_model(config, model, params, batch_stats,
                               read_calibration_batches(config),
                               float_dtype=float_dtype)
        print("    [x] int8-quantized encoder (w8a8, calibrated on the zone)...")
    elif config.get("bn_fold"):
        from flairtpu.models.fold import fold_model

        model = fold_model(model, params, batch_stats)
        print("    [x] folded BatchNorm into the conv weights (pure "
              f"{jnp.dtype(model._dtype).name} walk)...")
    return model, params, batch_stats


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------

class ZoneEngine:
    def __init__(self, config: dict, model, params, batch_stats):
        self.config = config
        self.model = model
        self.params = params
        self.batch_stats = batch_stats
        self.size = int(config["img_pixels_detection"])
        self.margin = int(config["margin"])
        self.batch_size = int(config.get("batch_size", 4))
        norma = config["norma_task"][0]
        self.norm = dict(norm_type=norma["norm_type"],
                         means=tuple(norma.get("norm_means") or ()),
                         stds=tuple(norma.get("norm_stds") or ()))
        self.channels = config["channels"]
        self._fns: dict[str, callable] = {}

    # -- jitted device programs, one per payload kind --

    def _forward(self, img_u8):
        x = normalize_device(img_u8, src_dtype=np.uint8, **self.norm)
        return self.model.apply(
            {"params": self.params, "batch_stats": self.batch_stats}, x, train=False)

    def _forward_inner(self, img_u8):
        """Margin-cropped logits; unet uses the plan_inner_crops fast path
        (bit-identical, ~3.5x less decoder work at 512/128 geometry) and the
        strided-head archs the windowed head upsample (factory.decode,
        ulp-level agreement)."""
        from flairtpu.models.factory import INNER_DECODE_ARCHS

        m, s = self.margin, self.size
        if m > 0 and getattr(self.model, "arch", None) in INNER_DECODE_ARCHS:
            x = normalize_device(img_u8, src_dtype=np.uint8, **self.norm)
            return self.model.apply(
                {"params": self.params, "batch_stats": self.batch_stats}, x,
                train=False, inner_margin=m)
        return self._forward(img_u8)[:, m : s - m, m : s - m, :]

    def device_fn(self, kind: str):
        if kind in self._fns:
            return self._fns[kind]
        m, s = self.margin, self.size

        if kind == "cropped_argmax":
            def fn(img):
                logits = self._forward_inner(img)
                cls, prob = softmax_argmax(logits)
                return cls.astype(jnp.uint8), jnp.round(prob * 255).astype(jnp.uint8)
        elif kind == "cropped_probs":
            def fn(img):
                logits = self._forward_inner(img)
                probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                return jnp.round(probs * 255).astype(jnp.uint8).transpose(0, 3, 1, 2)
        elif kind == "full_probs":
            def fn(img):
                probs = jax.nn.softmax(self._forward(img), axis=-1)
                return probs.transpose(0, 3, 1, 2)  # (B, K, S, S) f32
        elif kind == "full_argmax":
            def fn(img):
                cls, prob = softmax_argmax(self._forward(img))
                return cls.astype(jnp.uint8), prob
        else:
            raise ValueError(kind)
        jfn = jax.jit(fn)
        self._fns[kind] = jfn
        return jfn

    # -- host pipeline --

    def _read_batches(self, reader: TiffReader, grid: TileGrid, out_q: queue.Queue,
                      num_workers: int):
        """Producer: decode tile windows into padded batches."""
        S, B = self.size, self.batch_size
        tiles = grid.tiles

        def read_tile(t):
            try:
                win = Window(t.col0, t.row0, S, S)
                arr = reader.read(self.channels, window=win, boundless=True)
                return np.moveaxis(arr, 0, -1)  # (S, S, C)
            except Exception as error:
                # zero-patch fallback on decode errors, like the reference's
                # CPLE_BaseError handler (src/zone_detect/dataset.py:115-122)
                print(f"read error on tile {t.index}: {error}")
                return np.zeros((S, S, len(self.channels)),
                                reader.dtype.newbyteorder("="))

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=num_workers) as ex:
            for i in range(0, len(tiles), B):
                chunk = tiles[i : i + B]
                imgs = list(ex.map(read_tile, chunk))
                n = len(imgs)
                while len(imgs) < B:  # pad tail to the compiled shape
                    imgs.append(imgs[-1])
                out_q.put((chunk[:n], np.stack(imgs)))
        out_q.put(None)

    def run(self, reader: TiffReader, grid: TileGrid, stitcher,
            progress=None) -> dict:
        fn = self.device_fn(stitcher.needs)
        num_workers = max(int(self.config.get("num_worker", 2)), 1)
        if progress is None:
            try:  # reference parity: tqdm over the inference loop (main.py:398)
                from tqdm import tqdm

                bar = tqdm(total=len(grid.tiles), desc="zone inference", leave=False)
                progress = bar.update
            except ImportError:
                pass
        q: queue.Queue = queue.Queue(maxsize=4)
        producer = threading.Thread(
            target=self._read_batches, args=(reader, grid, q, num_workers),
            daemon=True)
        t0 = time.perf_counter()
        producer.start()

        n_tiles = 0
        patch_times_ms: list[float] = []
        pending = None  # (tiles, device result) — overlap D2H with next dispatch
        while True:
            item = q.get()
            if item is None:
                break
            tiles, imgs = item
            result = fn(jnp.asarray(imgs))
            if pending is not None:
                self._drain(pending, stitcher, patch_times_ms, t0)
                n_tiles += len(pending[0])
            pending = (tiles, result)
            if progress:
                progress(len(tiles))
        if pending is not None:
            self._drain(pending, stitcher, patch_times_ms, t0)
            n_tiles += len(pending[0])
        stitcher.finalize()
        seconds = time.perf_counter() - t0
        return {"tiles": n_tiles, "seconds": seconds,
                "patches_per_sec": n_tiles / seconds if seconds else 0.0,
                "patch_times_ms": patch_times_ms}

    def _drain(self, pending, stitcher, patch_times_ms, t0):
        tiles, result = pending
        if isinstance(result, tuple):
            host = tuple(np.asarray(r) for r in result)
            payloads = [tuple(h[i] for h in host) for i in range(len(tiles))]
        else:
            host = np.asarray(result)
            payloads = [host[i] for i in range(len(tiles))]
        now_ms = (time.perf_counter() - t0) * 1000.0
        for t, p in zip(tiles, payloads):
            stitcher.add(t, p)
            patch_times_ms.append(now_ms)


# ---------------------------------------------------------------------------
# pipeline orchestration (reference main.py:244-436)
# ---------------------------------------------------------------------------

def setup_out_path(config: dict) -> dict:
    out = Path(config["output_path"])
    out.mkdir(parents=True, exist_ok=True)
    child = out
    if config.get("compare"):
        child = out / datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        child.mkdir(parents=True, exist_ok=True)
        print(f"Creating output directory: {child}")
    config["local_out"] = str(child)
    return config


def setup_indiv_path(config: dict, identifier: str = "") -> str:
    """Collision-avoiding output path (reference utils.py:256-279)."""
    out_name = config["output_name"] + identifier
    if not out_name.endswith(".tif"):
        out_name += ".tif"
    path = Path(config["local_out"]) / out_name
    stem, ext = path.stem, path.suffix
    counter = 1
    while path.exists():
        path = path.with_name(f"{stem}_{counter}{ext}")
        counter += 1
    return str(path)


def conf_log(config: dict, reader: TiffReader) -> None:
    mf = config["model_framework"]
    provider = mf["model_provider"]
    tpl = mf.get(provider, {})
    model_template = f"{provider} - " + str(
        tpl.get("org_model") or tpl.get("encoder_decoder") or "?")
    print(f"""
    |- output path: {config['output_path']}
    |- output raster name: {config['output_name']}

    |- input image path: {config['input_img_path']}
    |- channels: {config['channels']}
    |- input image WxH: {reader.width, reader.height}
    |- resolution: {reader.res}
    |- number of classes: {config['n_classes']}
    |- normalization: {config['norma_task'][0]['norm_type']}
    |- output type: {config['output_type']}

    |- model weights path: {config.get('model_weights', '<in-memory>')}
    |- model template: {model_template}
    |- device: {jax.default_backend()} x{len(jax.devices())}
    |- batch size: {config['batch_size']}
    """)


def _make_writer(config: dict, reader: TiffReader, path_out: str) -> TiffWriter:
    n_bands = 2 if config["output_type"] == "argmax" else int(config["n_classes"])
    return TiffWriter(
        path_out, reader.width, reader.height, n_bands, "uint8",
        transform=reader.transform, crs=reader.crs,
        compress="lzw", tiled=True,
        blockxsize=config["img_pixels_detection"],
        blockysize=config["img_pixels_detection"],
        bigtiff="auto",
        # optional COG-style overview pyramid (nearest; class rasters must
        # not blend labels), e.g. output_overviews: [2, 4, 8]
        overviews=config.get("output_overviews"))


def _zone_mesh():
    """Device mesh for sharded zone inference, or None for single-device.

    FLAIRTPU_ZONE_SHARD: "auto" (default — shard on accelerator backends
    with >1 device), "1" (force, incl. the virtual-CPU test mesh), "0"
    (off). CPU defaults off so the forced-CPU test mesh keeps the
    bit-deterministic sequential scan for the accumulate modes."""
    import os

    shard = os.environ.get("FLAIRTPU_ZONE_SHARD", "auto")
    if shard != "0" and jax.device_count() > 1 and (
            shard == "1" or jax.default_backend() != "cpu"):
        from flairtpu.parallel.mesh import make_mesh

        return make_mesh(devices=jax.devices())
    return None


def stage_zone(config: dict, img_path: str | None = None) -> dict:
    """Read a zone and START its H2D transfer without waiting.

    The returned dict feeds ``DeviceZoneRunner.run(staged=...)``. Calling
    this from a background thread (batch mode) or caching it across sweep
    combinations overlaps/reuses the transfer — on tunneled backends the
    zone upload dominates end-to-end time (PERFORMANCE.md), and compare
    sweeps previously re-read + re-uploaded the same raster per combination.
    """
    import time

    import jax
    import numpy as np

    path = str(img_path or config["input_img_path"])
    t0 = time.perf_counter()
    with TiffReader(path, cache_blocks=128) as r:
        zone_np = np.ascontiguousarray(
            np.moveaxis(r.read(config["channels"]), 0, -1))
    staged = {"path": path, "zone_np": zone_np,
              "read_seconds": time.perf_counter() - t0}
    # zones too large for the device-resident path run through the
    # streaming engine and never consume the upload — don't occupy HBM
    # (batch mode prefetches before run_single decides the path)
    from flairtpu.zone.device_engine import device_budget_bytes

    if zone_np.nbytes * 4 <= device_budget_bytes() and _zone_mesh() is None:
        # the sharded programs re-place the zone replicated over the mesh
        # themselves — skip the single-device upload so it isn't paid twice
        staged["zone_dev"] = jax.device_put(zone_np)  # async: no wait here
    return staged


def run_single(config: dict, engine: ZoneEngine, stride: int, method: str,
               identifier: str = "") -> tuple[str, dict, TileGrid]:
    """One (grid, stitcher, output raster) pass over the zone.

    Prefers the device-resident path (zone in HBM, fused gather/forward/stitch,
    one transfer each way); streams through the host engine when the zone would
    not fit the device budget or FLAIRTPU_STREAMING_ZONE is set.
    """
    import os

    import numpy as np

    from flairtpu.zone.device_engine import (
        DeviceZoneRunner, device_budget_bytes, estimate_bytes)

    size, margin = config["img_pixels_detection"], config["margin"]
    with TiffReader(config["input_img_path"], cache_blocks=128) as reader:
        grid = slice_grid(reader.width, reader.height, size, margin, stride,
                          reader.transform, reader.crs)
        if config.get("write_dataframe"):
            gj = Path(config["local_out"]) / (
                str(config["output_name"]).split(".tif")[0] + "_slicing_job.geojson")
            gj.write_text(json.dumps(grid.to_geojson()))
        conf_log(config, reader)
        print(f"    [x] sliced input raster to {len(grid)} squares...")
        path_out = setup_indiv_path(config, identifier)

        use_device = (
            not os.environ.get("FLAIRTPU_STREAMING_ZONE")
            and estimate_bytes(grid, len(config["channels"]), config["n_classes"],
                               method, config["output_type"]) <= device_budget_bytes())
        print(f"    [x] zone path: {'device-resident' if use_device else 'streaming'}")
        print("    [ ] starting inference...\n")
        if use_device:
            runner = getattr(engine, "_device_runner", None)
            if runner is None or runner.size != size or runner.margin != margin:
                runner = DeviceZoneRunner(config, engine.model, engine.params,
                                          engine.batch_stats)
                engine._device_runner = runner
            # staged-zone cache: reused across sweep combinations (same
            # raster re-read/re-uploaded per combo otherwise) and fed by
            # batch mode's prefetch thread for cross-zone overlap
            staged = getattr(engine, "_staged_zone", None)
            if staged is not None and staged.get("path") != str(
                    config["input_img_path"]):
                staged = None
            if staged is None:
                staged = stage_zone(config)
            engine._staged_zone = staged
            # multi-chip: shard the tile grid over all devices (the sharded
            # programs are agreement-tested vs single-device in
            # tests/test_zone_multichip.py); see _zone_mesh for the knob
            mesh = _zone_mesh()
            if mesh is not None:
                print(f"    [x] sharding tiles over {jax.device_count()} "
                      "devices")
            res = runner.run(reader, grid, method, staged=staged, mesh=mesh)
            # multi-host: every process holds the full stitched planes
            # (replicated program output); only process 0 writes the raster —
            # the reference's @rank_zero_only discipline (flair/main.py:36)
            from flairtpu.parallel.mesh import is_main_process

            if is_main_process():
                writer = _make_writer(config, reader, path_out)
                if "cls" in res:
                    writer.write_band([1, 2],
                                      np.stack([res["cls"], res["prob"]]))
                else:
                    writer.write_band(list(range(1, config["n_classes"] + 1)),
                                      res["probs"])
                writer.close()
            total_ms = res["seconds"] * 1000.0
            n = max(res["tiles"], 1)
            stats = {"tiles": res["tiles"], "seconds": res["seconds"],
                     "patches_per_sec": res["patches_per_sec"],
                     # cumulative-elapsed-per-patch, the reference's timing shape
                     "patch_times_ms": [total_ms * (i + 1) / n for i in range(n)]}
            for k in ("read_seconds", "h2d_seconds", "compute_seconds",
                      "d2h_seconds"):
                if k in res:
                    stats[k] = res[k]
        else:
            # the streaming loop is host-driven and single-process — on a
            # multi-host run only rank 0 computes and writes (the others
            # would race it on the same output path)
            from flairtpu.parallel.mesh import is_main_process

            if is_main_process():
                writer = _make_writer(config, reader, path_out)
                stitcher = make_stitcher(method, writer, grid, config)
                stats = engine.run(reader, grid, stitcher)
                writer.close()
            else:
                stats = {"tiles": len(grid), "seconds": 0.0,
                         "patches_per_sec": 0.0,
                         "patch_times_ms": [0.0] * len(grid)}
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # rank 0 owns the raster write; everyone else must not return (and
        # downstream callers must not read path_out) before the file is
        # closed — the cross-process analog of the reference's
        # @rank_zero_only + implicit DDP barrier (flair/main.py:36)
        multihost_utils.sync_global_devices("flairtpu-zone-raster-write")
    print(f"    [X] done writing to {Path(path_out).name} raster file "
          f"({stats['tiles']} tiles, {stats['patches_per_sec']:.1f} patches/s).\n")
    return path_out, stats, grid


def run_pipeline(config: dict, engine: ZoneEngine | None = None) -> None:
    """flair-detect entry (reference main.py:244-436).

    ``engine`` lets batch mode reuse one model/engine (and its compiled
    programs) across zones instead of rebuilding per zone.
    """
    config = setup_out_path(config)
    local_out = Path(config["local_out"])
    log_file = local_out / (
        f"{config['output_name']}_"
        f"{datetime.datetime.now().strftime('%Y%m%d_%H%M%S')}.log")
    tee_stdout(str(log_file), capture_stderr=True)
    print(f"    [LOGGER] Writing logs to: {log_file}")
    try:
        print(f"""
    ##############################################
    ZONE DETECTION
    ##############################################

    JAX backend: {jax.default_backend()}""")
        if engine is None:
            model, params, batch_stats = prepare_model(config)
            engine = ZoneEngine(config, model, params, batch_stats)

        from flairtpu.utils.profiling import maybe_trace

        if config.get("compare"):
            from flairtpu.zone.compare import run_compare

            with maybe_trace("zone-compare"):
                run_compare(config, engine)
        else:
            stride = get_stride(config)[0]
            with maybe_trace("zone-detect"):
                run_single(config, engine, stride, "exact-clipping")
    finally:
        untee_stdout()
