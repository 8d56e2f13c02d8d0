"""Capture an XLA device trace of the production train step and print the
per-op time breakdown (top HLOs by self time).

Usage: python benchmarks/trace_train_step.py [--batch 32] [--steps 5] [--out /tmp/trace]

Requires tensorboard_plugin_profile (present in this image) to parse the
.xplane.pb into an op profile; falls back to listing the raw files.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SIZE = 512


def capture(out_dir: str, batch: int, steps: int) -> None:
    import jax

    from flairtpu.train.loop import SegmentationTrainer

    bs = batch
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
        "batch_size": bs, "learning_rate": 0.02, "seed": 0,
    }
    tr = SegmentationTrainer(config)
    tr.replicate_to_mesh()
    step = tr.train_step()
    rng = np.random.default_rng(0)
    batch_np = {
        "img": rng.integers(0, 255, size=(bs, SIZE, SIZE, 5)).astype(np.uint8),
        "msk": rng.integers(0, 19, size=(bs, SIZE, SIZE)).astype(np.int32),
    }
    img, msk, mtd = tr._put(batch_np)
    jax.block_until_ready(img)
    key = jax.random.PRNGKey(0)
    p, s, o = tr.params, tr.batch_stats, tr.opt_state
    p, s, o, loss, cm, key = step(p, s, o, img, msk, mtd, key)  # compile
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    with jax.profiler.trace(out_dir):
        for i in range(steps):
            p, s, o, loss, cm, key = step(p, s, o, img, msk, mtd, key)
        float(np.asarray(loss))  # D2H fetch fences the chain
    dt = time.perf_counter() - t0
    print(f"captured {steps} steps in {dt:.2f}s "
          f"({steps * bs / dt:.1f} patches/s) -> {out_dir}")


def analyze(out_dir: str, top: int = 40) -> None:
    """Aggregate TPU-plane op durations straight from the xplane protobuf
    (tensorboard_plugin_profile's native converter is broken in this image)."""
    xplanes = sorted(glob.glob(f"{out_dir}/**/*.xplane.pb", recursive=True))
    if not xplanes:
        print("no xplane files found under", out_dir)
        return
    xplane = xplanes[-1]
    print("parsing", xplane)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    space.ParseFromString(open(xplane, "rb").read())
    tpu = next(p for p in space.planes if "TPU" in p.name)
    meta = {m.id: m.name for m in tpu.event_metadata.values()}
    stat_meta = {m.id: m.name for m in tpu.stat_metadata.values()}

    per_line: dict[str, float] = {}
    per_op: dict[str, list] = {}
    for line in tpu.lines:
        lname = line.name or f"line{line.id}"
        dur = 0.0
        for ev in line.events:
            d = ev.duration_ps / 1e9  # -> ms
            dur += d
            if "op" in lname.lower() or "XLA" in lname:
                name = meta.get(ev.metadata_id, "?")
                rec = per_op.setdefault(name, [0.0, 0, ""])
                rec[0] += d
                rec[1] += 1
                if not rec[2]:
                    for st in ev.stats:
                        sname = stat_meta.get(st.metadata_id, "")
                        if sname in ("hlo_op", "tf_op", "hlo_category"):
                            rec[2] = st.str_value or rec[2]
        per_line[lname] = dur
    print("line totals (ms):",
          {k: round(v, 2) for k, v in sorted(per_line.items())})

    if not per_op:
        # fall back: use the busiest line
        busiest = max(tpu.lines, key=lambda l: sum(e.duration_ps for e in l.events))
        for ev in busiest.events:
            name = meta.get(ev.metadata_id, "?")
            rec = per_op.setdefault(name, [0.0, 0, ""])
            rec[0] += ev.duration_ps / 1e9
            rec[1] += 1
    total = sum(v[0] for v in per_op.values())
    print(f"total op self-time {total:.1f} ms across capture; top {top} ops:")
    rows = sorted(per_op.items(), key=lambda kv: -kv[1][0])[:top]
    for name, (t, n, cat) in rows:
        print(f"{100 * t / total:5.1f}%  {t:8.2f} ms  x{n:<4d} {name[:90]} {cat[:40]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default="/tmp/flairtpu_trace")
    ap.add_argument("--analyze-only", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    if not args.analyze_only:
        capture(args.out, args.batch, args.steps)
    analyze(args.out, args.top)


if __name__ == "__main__":
    main()
