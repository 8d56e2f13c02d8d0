"""Measured reference-pipeline baseline: the FLAIR-1 zone-detect loop in torch.

Faithfully mirrors the reference hot loop (/root/reference/src/zone_detect/
compare.py:20-39 ``inference`` + main.py:398-427 ``run_pipeline``):

- windowed boundless reads of overlapping tiles from the zone raster
  (dataset.py:92-104; our first-party TIFF codec stands in for GDAL),
- per-batch: H2D copy -> ``torch.no_grad()`` forward of the smp-topology
  ResNet34-U-Net (tests/torch_ref.py mirror; smp itself is not installed) ->
  full ``softmax(dim=1)`` -> D2H ``.numpy()`` (compare.py:30-39),
- per patch: margin crop, convert to [argmax uint8, max-prob] 2-band layout
  (dataset.py:23-30), serial windowed write into a tiled LZW raster
  (main.py:421-426).

Prints one JSON line with the measured patches/sec and environment provenance,
and caches it at ``.bench_cache/ref_baseline.json`` where bench.py picks it up.

This host has no CUDA (torch 2.13+cpu, 1 core), so the measurement reflects
the reference ON THIS HOST; the reference's published hardware is a GPU
cluster (SURVEY.md §6). bench.py therefore uses max(measured, 55.0-estimate)
as the vs_baseline denominator — the estimate keeps the comparison honest
when the only measurable torch device is far slower than the reference's GPU.

Usage: python benchmarks/torch_baseline.py [--tiles N] [--zone PX]
"""

from __future__ import annotations

import argparse
import json
import platform
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

SIZE, MARGIN, N_CLASSES, BATCH = 512, 128, 19, 2


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=8,
                    help="number of tiles to time (extrapolated to the zone)")
    ap.add_argument("--zone", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=BATCH)
    args = ap.parse_args()

    import torch
    from torch_ref import ResNet34Unet

    from flairtpu.io import TiffReader, TiffWriter, Window
    from flairtpu.io.tiff import Affine, write_array
    from flairtpu.zone.grid import slice_grid

    cache = REPO / ".bench_cache"
    cache.mkdir(exist_ok=True)
    zone_path = cache / f"zone_{args.zone}.tif"
    if not zone_path.exists():
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, size=(5, args.zone, args.zone)).astype(np.uint8)
        write_array(zone_path, img,
                    transform=Affine.from_origin(700000, 6600000, 0.2, 0.2),
                    crs=2154, compress="deflate", blockxsize=512, blockysize=512)

    device = torch.device("cuda" if torch.cuda.is_available() else "cpu")
    model = ResNet34Unet(5, N_CLASSES).eval().to(device)

    with TiffReader(zone_path, cache_blocks=128) as reader:
        grid = slice_grid(reader.width, reader.height, SIZE, MARGIN,
                          SIZE - 2 * MARGIN, reader.transform, reader.crs)
        tiles = grid.tiles[: args.tiles]
        out_path = cache / "ref_baseline_out.tif"
        writer = TiffWriter(str(out_path), reader.width, reader.height, 2,
                            "uint8", transform=reader.transform, crs=reader.crs,
                            compress="lzw", tiled=True,
                            blockxsize=SIZE, blockysize=SIZE, bigtiff="auto")

        def read_tile(t):  # dataset.py:92-104 boundless windowed read
            arr = reader.read([1, 2, 3, 4, 5],
                              window=Window(t.col0, t.row0, SIZE, SIZE),
                              boundless=True)
            return arr.astype(np.float32) / 255.0  # norm 'scaling'

        # warm one batch (model + codec caches), then time the loop
        warm = torch.from_numpy(np.stack([read_tile(tiles[0])])).to(device)
        with torch.no_grad():
            model(warm)

        t0 = time.perf_counter()
        n_done = 0
        for i in range(0, len(tiles), args.batch):
            chunk = tiles[i : i + args.batch]
            batch_np = np.stack([read_tile(t) for t in chunk])
            imgs = torch.from_numpy(batch_np).to(device)  # H2D per batch
            with torch.no_grad():                          # compare.py:30-36
                logits = model(imgs)
                probs = torch.softmax(logits, dim=1)
            if device.type == "cuda":
                torch.cuda.synchronize()
            probs_np = probs.cpu().numpy()                 # full-softmax D2H
            for t, p in zip(chunk, probs_np):              # main.py:421-426
                inner = p[:, MARGIN : SIZE - MARGIN, MARGIN : SIZE - MARGIN]
                cls = np.argmax(inner, axis=0).astype(np.uint8)
                conf = np.rint(np.max(inner, axis=0) * 255).astype(np.uint8)
                h = t.irow1 - t.irow0
                w = t.icol1 - t.icol0
                if h <= 0 or w <= 0:
                    continue
                writer.write_band([1, 2], np.stack([cls[:h, :w], conf[:h, :w]]),
                                  Window(t.icol0, t.irow0, w, h))
                n_done += 1
        dt = time.perf_counter() - t0
        writer.close()
        out_path.unlink(missing_ok=True)

    result = {
        "patches_per_sec": round(n_done / dt, 3),
        "tiles": n_done,
        "seconds": round(dt, 2),
        "torch": torch.__version__,
        "device": str(device),
        "threads": torch.get_num_threads(),
        "host": platform.machine(),
        "note": "reference zone-detect loop (compare.py:20-39 + "
                "main.py:398-427) measured on this host",
    }
    (REPO / "benchmarks" / "ref_baseline_measured.json").write_text(
        json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
