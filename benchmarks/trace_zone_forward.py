"""Per-op xplane trace of the production zone forward (inner decode).

The in-context instrument for the fused low-channel decoder question
(ROADMAP r5 #1): isolated single-op jits mislead (see
pallas_lowch_conv.py), so this captures an XLA device trace of the real
inner-decode forward + fused argmax epilogue at the production geometry
(512/128, 19 classes, bf16, batch configurable) and prints per-op device
self-time, with convolutions labeled by their HLO text shape so encoder vs
decoder-tail time can be attributed directly.

Usage: python benchmarks/trace_zone_forward.py [--batch 128] [--steps 4]
"""

from __future__ import annotations

import argparse
import glob
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SIZE, MARGIN, K = 512, 128, 19


def capture(out_dir: str, batch: int, steps: int) -> None:
    import jax
    import jax.numpy as jnp

    from flairtpu.models.factory import create_model, init_model
    from flairtpu.ops.fused import softmax_argmax

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    config = {
        "model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {"encoder_decoder": "resnet34_unet"},
        },
        "channels": [1, 2, 3, 4, 5], "n_classes": K,
    }
    model = create_model(config, dtype=dtype)
    params, stats = init_model(model, (1, SIZE, SIZE, 5))
    variables = {"params": params, "batch_stats": stats}

    def fwd(x):
        logits = model.apply(variables, x, train=False, inner_margin=MARGIN)
        cls, prob = softmax_argmax(logits)
        return cls.astype(jnp.uint8), jnp.round(prob * 255).astype(jnp.uint8)

    f = jax.jit(fwd)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, SIZE, SIZE, 5)), jnp.float32)
    out = f(x)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    with jax.profiler.trace(out_dir):
        for _ in range(steps):
            cls, prob = f(x)
            x = x.at[0, 0, 0, 0].set(cls[0, 0, 0].astype(jnp.float32) * 1e-6)
        np.asarray(cls[0, 0, 0])
    dt = time.perf_counter() - t0
    print(f"captured {steps} forwards in {dt:.2f}s "
          f"({steps * batch / dt:.1f} patches/s incl. fetch) -> {out_dir}")


def analyze(out_dir: str, top: int = 45) -> None:
    """Aggregate TPU-plane op durations from the xplane protobuf (same
    parser as trace_train_step.py — the plugin's converter is broken in
    this image)."""
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

    per_op: dict[str, list] = {}
    for line in tpu.lines:
        lname = line.name or f"line{line.id}"
        if not ("op" in lname.lower() or "XLA" in lname):
            continue
        for ev in line.events:
            name = meta.get(ev.metadata_id, "?")
            rec = per_op.setdefault(name, [0.0, 0, ""])
            rec[0] += ev.duration_ps / 1e9
            rec[1] += 1
            if not rec[2]:
                for st in ev.stats:
                    sname = stat_meta.get(st.metadata_id, "")
                    if sname in ("hlo_op", "tf_op", "hlo_category"):
                        rec[2] = st.str_value or rec[2]
    if not per_op:
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
        print(f"{100 * t / total:5.1f}%  {t:8.2f} ms  x{n:<4d} {name[:100]} {cat[:40]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--out", default="/tmp/flairtpu_zone_trace")
    ap.add_argument("--analyze-only", action="store_true")
    ap.add_argument("--top", type=int, default=45)
    args = ap.parse_args()
    if not args.analyze_only:
        capture(args.out, args.batch, args.steps)
    analyze(args.out, args.top)


if __name__ == "__main__":
    main()
