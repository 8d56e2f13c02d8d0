"""HF-provider models run through the standard trainer (one jitted step)."""

import numpy as np
import jax
import pytest

from flairtpu.train.loop import SegmentationTrainer


@pytest.mark.parametrize("org_model", [
    "nvidia/segformer-b0-finetuned-ade-512-512",
    "openmmlab/upernet-swin-tiny",
])
def test_hf_provider_train_step(org_model, rng):
    config = {
        "model_framework": {
            "model_provider": "HuggingFace",
            "HuggingFace": {"org_model": org_model},
        },
        "use_metadata": False,
        "use_augmentation": True,
        "use_weights": True,
        "channels": [1, 2, 3, 4, 5],
        "norm_type": "scaling", "norm_means": [], "norm_stds": [],
        "classes": {i: [1, f"c{i}"] for i in range(1, 5)},
        "batch_size": 2,
        "learning_rate": 0.01,
        "seed": 0,
    }
    trainer = SegmentationTrainer(config)
    step = trainer.train_step()
    batch = {
        "img": rng.integers(0, 255, size=(2, 64, 64, 5)).astype(np.uint8),
        "msk": rng.integers(0, 4, size=(2, 64, 64)).astype(np.int32),
    }
    img, msk, mtd = trainer._put(batch)
    params, stats, opt, loss, cm = step(
        trainer.params, trainer.batch_stats, trainer.opt_state,
        img, msk, mtd, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert np.asarray(cm).sum() == 2 * 64 * 64
