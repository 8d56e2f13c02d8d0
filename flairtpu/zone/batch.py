"""Department batch mode: -b flag (reference zone_detect/main.py:440-497).

Iterates zone directories under input_path, matches truth rasters per zone,
runs the zone pipeline for each, then aggregates per-method metrics into one
JSON via batch_metrics.
"""

from __future__ import annotations

import json
from pathlib import Path

from flairtpu.zone.zone_metrics import batch_metrics


def batch_metrics_pipeline(config: dict) -> None:
    from concurrent.futures import ThreadPoolExecutor

    from flairtpu.zone.engine import (ZoneEngine, prepare_model, run_pipeline,
                                      stage_zone)

    out_json = Path(config["metrics_out"])
    data_type = config.get("data_type", "")
    file_pattern = f"*{data_type}.tif"
    assert out_json, "Please provide an output path for the metrics"

    truth_root = Path(config["truth_root"])
    truth_dpt = truth_root / Path(config["truth_path"]).parts[-3]

    inputs_dpt = Path(config["input_path"])
    jobs = []
    for full_zone in sorted(p for p in inputs_dpt.iterdir() if p.is_dir()):
        img_path = next(full_zone.glob(file_pattern), None)
        if img_path is None:
            continue
        zone = img_path.parts[-2]
        truth_path = next((truth_dpt / zone).glob("*.tif"), None)
        if truth_path is None:
            print(f"No ground truth found for zone: {zone}")
            continue
        jobs.append((img_path, truth_path))

    # one model/engine for the whole department (the reference re-loads the
    # model per zone, main.py:440-497), and a one-deep prefetch: the next
    # zone's decode + H2D transfer run while the current zone computes and
    # writes — the transfer is the end-to-end bottleneck (PERFORMANCE.md)
    if jobs and config.get("quantize"):
        # int8 activation scales calibrate on the department's first zone
        # and are reused across its zones (one quantization per department)
        config["input_img_path"] = str(jobs[0][0])
    model, params, batch_stats = prepare_model(config)
    engine = ZoneEngine(config, model, params, batch_stats)
    from flairtpu.zone.grid import get_stride
    from flairtpu.zone.naming import method_string

    with ThreadPoolExecutor(max_workers=1) as pool:
        next_staged = pool.submit(stage_zone, config, jobs[0][0]) if jobs else None
        for i, (img_path, truth_path) in enumerate(jobs):
            staged = next_staged.result() if next_staged is not None else None
            if staged is not None:
                engine._staged_zone = staged
            if i + 1 < len(jobs):
                next_staged = pool.submit(stage_zone, config, jobs[i + 1][0])
            else:
                next_staged = None
            # the method suffix makes batch outputs parseable by info_extract
            # (the reference's non-compare batch names lack it and its own
            # batch_metrics cannot parse them)
            method = method_string(
                config["img_pixels_detection"], get_stride(config)[0],
                config["margin"], "no-padding",
                config.get("stitching", "exact-clipping"))
            config.update({
                "input_img_path": str(img_path),
                "truth_path": str(truth_path),
                "output_name": f"{img_path.stem}-ARGMAX-S_{method}",
            })
            run_pipeline(config, engine=engine)

    # aggregation reads back the prediction rasters rank 0 wrote
    # (run_single barriers before returning); main process only
    from flairtpu.parallel.mesh import is_main_process

    if is_main_process():
        metrics_file = batch_metrics(config, truth_dpt)
        out = out_json.with_suffix(".json")
        with open(out, "w") as f:
            json.dump(metrics_file, f)
        print(f"Metrics saved to {out}")
