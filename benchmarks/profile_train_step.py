"""Decompose train-step time: model fwd+bwd vs aug/confmat/optimizer overhead.

Times jitted step variants on the ambient backend (run on the TPU) to locate
the non-model overhead VERDICT round 1 flagged (~160 ms/step: full step
~36 patches/s vs 115 for fwd+bwd alone).

Usage: python benchmarks/profile_train_step.py [--batch 8] [--steps 10]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SIZE = 512


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from flairtpu.data.augment import augment_batch
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
    batch = {
        "img": rng.integers(0, 255, size=(bs, SIZE, SIZE, 5)).astype(np.uint8),
        "msk": rng.integers(0, 19, size=(bs, SIZE, SIZE)).astype(np.int32),
    }
    img, msk, mtd = tr._put(batch)
    jax.block_until_ready(img)
    key = jax.random.PRNGKey(0)

    from flairtpu.data.normalize import normalize_device
    from flairtpu.ops.confmat import confusion_matrix

    def make_variant(aug: bool, cm: bool, opt: bool):
        def step(params, batch_stats, opt_state, img, msk, mtd, rng):
            next_rng, aug_key = jax.random.split(rng)
            tgt = tr._clean_targets(msk)
            if aug:
                img, tgt = augment_batch(img, tgt, aug_key)
            x = normalize_device(img, src_dtype=np.uint8, **tr.norm)

            def loss_fn(p):
                out, mut = tr._apply({"params": p, "batch_stats": batch_stats},
                                     x, mtd, train=True, mutable=True)
                return tr._loss(out, tgt), (mut["batch_stats"], out)

            (loss, (stats, logits)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            if opt:
                updates, opt_state = tr.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
            else:
                params = jax.tree_util.tree_map(
                    lambda a, g: a - 0.02 * g, params, grads)
            out_cm = (confusion_matrix(jnp.argmax(logits, axis=-1), tgt, 19)
                      if cm else loss)
            return params, stats, opt_state, loss, out_cm, next_rng

        return jax.jit(step, donate_argnums=(0, 1, 2))

    variants = {
        "fwd+bwd+sgd(raw)": make_variant(False, False, False),
        "+optax": make_variant(False, False, True),
        "+confmat": make_variant(False, True, True),
        "+aug (full)": make_variant(True, True, True),
    }
    print(f"backend={jax.default_backend()} batch={bs} steps={args.steps}")
    for name, step in variants.items():
        p, s, o = tr.params, tr.batch_stats, tr.opt_state
        p, s, o, loss, cm, k = step(p, s, o, img, msk, mtd, key)  # compile
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for i in range(args.steps):
            p, s, o, loss, cm, k = step(p, s, o, img, msk, mtd, k)
        float(np.asarray(loss))  # D2H fetch fences the chain
        dt = (time.perf_counter() - t0) / args.steps
        print(f"{name:<22s} {dt * 1000:7.1f} ms/step  {bs / dt:7.1f} patches/s")
        # state shapes change across variants (optax vs raw); rebuild
        tr.params, tr.batch_stats = None, None
        tr2 = SegmentationTrainer(config)
        tr2.replicate_to_mesh()
        tr.params, tr.batch_stats, tr.opt_state = tr2.params, tr2.batch_stats, tr2.opt_state


if __name__ == "__main__":
    main()
