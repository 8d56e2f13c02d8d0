"""Train-step cost breakdown: fwd / fwd+loss / +bwd / +opt / full step.

Times progressively larger slices of the production train step (512^2 5-ch
resnet34-unet, 19 classes, bf16 on TPU) with the chained-fetch methodology
(CLAUDE.md timing hazard) to locate remaining non-model overhead.

Usage: python benchmarks/train_split.py [--batch 128]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SIZE = 512


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--short", type=int, default=3)
    ap.add_argument("--long", type=int, default=6)
    ap.add_argument("--only", default=None,
                    help="comma list: fwd,loss,bwd,opt,confmat,full")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from flairtpu.train.loop import SegmentationTrainer

    bs = args.batch
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
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, size=(bs, SIZE, SIZE, 5)), jnp.uint8)
    msk = jnp.asarray(rng.integers(0, 19, size=(bs, SIZE, SIZE)), jnp.int32)
    mtd = jnp.zeros((bs, 45), jnp.float32)
    key = jax.random.PRNGKey(0)
    params, stats, opt = tr.params, tr.batch_stats, tr.opt_state

    from flairtpu.data.augment import augment_batch
    from flairtpu.data.normalize import normalize_device
    from flairtpu.ops.confmat import confusion_matrix

    def prep(img, msk, k):
        tgt = tr._clean_targets(msk)
        i2, t2 = augment_batch(img, tgt, k)
        return normalize_device(i2, src_dtype=np.uint8, **tr.norm), t2

    def fwd(img, msk, k):
        x, tgt = prep(img, msk, k)
        out, _ = tr._apply({"params": params, "batch_stats": stats}, x, mtd,
                           train=True, rngs={"dropout": k}, mutable=True)
        return jnp.sum(out.astype(jnp.float32))

    def fwd_loss(img, msk, k):
        x, tgt = prep(img, msk, k)
        out, _ = tr._apply({"params": params, "batch_stats": stats}, x, mtd,
                           train=True, rngs={"dropout": k}, mutable=True)
        return tr._loss(out, tgt)

    def fwd_bwd(img, msk, k):
        x, tgt = prep(img, msk, k)

        def loss_fn(p):
            out, mut = tr._apply({"params": p, "batch_stats": stats}, x, mtd,
                                 train=True, rngs={"dropout": k}, mutable=True)
            return tr._loss(out, tgt)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # keep EVERY grad alive or XLA dead-code-eliminates their backward ops
        alive = sum(jnp.sum(g.astype(jnp.float32)) for g in
                    jax.tree.leaves(grads))
        return loss + alive * 1e-12

    def fwd_bwd_opt(img, msk, k):
        import optax

        x, tgt = prep(img, msk, k)

        def loss_fn(p):
            out, mut = tr._apply({"params": p, "batch_stats": stats}, x, mtd,
                                 train=True, rngs={"dropout": k}, mutable=True)
            return tr._loss(out, tgt)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, _ = tr.tx.update(grads, opt, params)
        new_p = optax.apply_updates(params, updates)
        alive = sum(jnp.sum(p2.astype(jnp.float32)) for p2 in
                    jax.tree.leaves(new_p))
        return loss + alive * 1e-12

    def confmat_only(img, msk, k):
        tgt = tr._clean_targets(msk)
        preds = (img[..., 0].astype(jnp.int32) + msk) % 19
        cm = confusion_matrix(preds, tgt, tr.num_classes)
        return jnp.sum(cm).astype(jnp.float32)

    def timed(tag, fn):
        jfn = jax.jit(fn)

        def chain(n):
            s = jnp.float32(0.0)
            for i in range(n):
                s = s + jfn(img, msk, jax.random.fold_in(key, i)) * (
                    1.0 + s * 1e-12)
            t0 = time.perf_counter()
            float(np.asarray(s))
            return time.perf_counter() - t0

        chain(1)
        vals = []
        for _ in range(3):
            vals.append((chain(args.long) - chain(args.short))
                        / (args.long - args.short))
        dt = min(vals)
        print(f"{tag:18s} {dt * 1e3:8.1f} ms/step   {bs / dt:7.1f} patches/s")
        return dt

    only = set(args.only.split(",")) if args.only else None

    def want(key):
        return only is None or key in only

    if want("fwd"):
        timed("fwd", fwd)
    if want("loss"):
        timed("fwd+loss", fwd_loss)
    if want("bwd"):
        timed("fwd+bwd", fwd_bwd)
    if want("opt"):
        timed("fwd+bwd+opt", fwd_bwd_opt)
    if want("confmat"):
        timed("confmat alone", confmat_only)
    if not want("full"):
        return

    # full production step: state feeds forward call-to-call (donated
    # buffers), which is itself a data-dependent chain; fetch loss once
    step = tr.train_step()
    state = [params, stats, opt]

    def full_chain(n):
        p, s, o = state
        k = key
        loss = None
        for i in range(n):
            p, s, o, loss, cm, k = step(p, s, o, img, msk, mtd, k)
        state[:] = [p, s, o]
        t0 = time.perf_counter()
        float(np.asarray(loss))
        return time.perf_counter() - t0

    full_chain(1)
    vals = []
    for _ in range(3):
        vals.append((full_chain(args.long) - full_chain(args.short))
                    / (args.long - args.short))
    dt = min(vals)
    print(f"{'full step':18s} {dt * 1e3:8.1f} ms/step   {bs / dt:7.1f} patches/s")


if __name__ == "__main__":
    main()
