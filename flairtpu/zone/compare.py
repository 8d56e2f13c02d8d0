"""Strategy-comparison sweep (reference zone_detect/main.py:275-384).

Iterates the padding x tile-size x margin x stride x stitching cross-product,
producing one output raster per combo (method-string suffixed filename), and
with -m a per-patch metrics JSON and per-method timing, matching the
reference's record shapes.
"""

from __future__ import annotations

import json
from pathlib import Path

from flairtpu.config import gen_param_combination
from flairtpu.io import TiffReader
from flairtpu.io.tiff import Window
from flairtpu.zone.naming import method_string
from flairtpu.zone.zone_metrics import compute_metrics_patch, open_images


def run_compare(config: dict, engine) -> None:
    from flairtpu.zone.engine import run_single

    local_out = Path(config["local_out"])
    compute_metrics = bool(config.get("metrics"))
    truth_array, metrics_json = open_images(config, local_out, compute_metrics)

    method_times: dict[str, list[float]] = {}
    print("    [ ] starting comparison...\n")
    for combi in gen_param_combination(config):
        size = combi["img_pixels_detection"]
        margin = combi["margin"]
        stride = combi["stride"]
        stitch = combi["stitching"]
        config.update(combi)
        engine.size, engine.margin = size, margin
        engine._fns.clear()  # new tile geometry -> new compiled programs

        method = method_string(size, stride, margin, combi["padding"], stitch)
        path_out, stats, grid = run_single(
            config, engine, stride, stitch, identifier="_" + method)
        method_times[method] = stats["patch_times_ms"]

        # metrics read the raster rank 0 just wrote (run_single barriers
        # before returning); only the main process computes/writes them —
        # non-main hosts may not even see the file on a non-shared fs
        from flairtpu.parallel.mesh import is_main_process

        if compute_metrics and is_main_process():
            method_metrics = []
            with TiffReader(path_out) as r:
                for tile in grid.tiles:
                    h, w = tile.irow1 - tile.irow0, tile.icol1 - tile.icol0
                    if h <= 0 or w <= 0:
                        continue
                    win = Window(tile.icol0, tile.irow0, w, h)
                    pred = r.read(1, window=win)
                    method_metrics.append(compute_metrics_patch(
                        pred, truth_array, win, config, method))
            config["times"] = method_times
            with open(metrics_json, "w") as f:
                json.dump(method_metrics, f, indent=2)
            print(f"    [X] done writing metrics to {metrics_json.name} file.\n")
