"""Lock bench.py's analytic FLOPs models against XLA's own cost analysis.

The driver-captured `mfu` / `train_mfu` fields divide measured throughput by
these analytic FLOPs (bench.py:forward_flops_per_patch / train_flops_per_patch)
— if the flagship model drifts (channel plan, decoder spec, inner-crop plan)
without the analytic model following, the efficiency claims silently go wrong.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def test_train_flops_is_3x_full_decode_forward():
    # the train model costs fwd + 2x bwd of the FULL-size decoder; the zone
    # model costs the inner-decoded forward, which must be strictly cheaper
    fwd_inner = bench.forward_flops_per_patch()
    train = bench.train_flops_per_patch()
    assert train > 3 * fwd_inner  # full decode > inner decode
    assert train / 3 < 1.5 * fwd_inner  # ... but same encoder dominates


def _xla_flops(lowered) -> float:
    ca = lowered.compile().cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca["flops"])


@pytest.mark.slow
def test_forward_flops_matches_xla_cost_analysis():
    import jax
    import jax.numpy as jnp

    from flairtpu.models.factory import create_model, init_model

    config = {
        "model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {"encoder_decoder": "resnet34_unet"},
        },
        "channels": [1, 2, 3, 4, 5], "n_classes": 19,
        "classes": {i: [1, f"c{i}"] for i in range(1, 20)},
    }
    model = create_model(config, dtype=jnp.float32)
    params, stats = init_model(model, (1, 512, 512, 5))

    def fwd(p, s, x):
        return model.apply({"params": p, "batch_stats": s}, x,
                           train=False, inner_margin=128)

    x = jnp.zeros((1, 512, 512, 5), jnp.float32)
    xla = _xla_flops(jax.jit(fwd).lower(params, stats, x))
    ana = bench.forward_flops_per_patch()
    assert abs(ana - xla) / xla < 0.10, (ana, xla)


@pytest.mark.slow
def test_train_flops_matches_xla_cost_analysis():
    import jax
    import jax.numpy as jnp

    from flairtpu.train.loop import SegmentationTrainer

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
        "batch_size": 1, "learning_rate": 0.02, "seed": 0,
    }
    tr = SegmentationTrainer(config)
    step = tr.train_step()
    img = jnp.zeros((1, 512, 512, 5), jnp.uint8)
    msk = jnp.zeros((1, 512, 512), jnp.int32)
    mtd = jnp.zeros((1, 45), jnp.float32)
    xla = _xla_flops(step.lower(tr.params, tr.batch_stats, tr.opt_state,
                                img, msk, mtd, jax.random.PRNGKey(0)))
    ana = bench.train_flops_per_patch()
    # measured 1.029 on jax 0.9 CPU (XLA skips the first layer's input grad;
    # aug/loss/BN elementwise adds back) — guard the model, not the compiler
    assert abs(ana - xla) / xla < 0.10, (ana, xla)
