"""HF-provider models run through the standard trainer (one jitted step)."""

import numpy as np
import jax
import pytest

from flairtpu.train.loop import SegmentationTrainer


@pytest.mark.parametrize("org_model", [
    "nvidia/segformer-b0-finetuned-ade-512-512",
    "openmmlab/upernet-swin-tiny",
    "apple/deeplabv3-mobilevit-xx-small",
    "apple/mobilevitv2-0.5-test-256",
    "google/deeplabv3_mobilenet_v2_0.5_513",
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
    params, stats, opt, loss, cm, _rng = step(
        trainer.params, trainer.batch_stats, trainer.opt_state,
        img, msk, mtd, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert np.asarray(cm).sum() == 2 * 64 * 64


def test_upernet_aux_loss_training(rng):
    """auxiliary_loss_weight trains both heads (HF-style aux supervision)."""
    import jax

    config = {
        "model_framework": {
            "model_provider": "HuggingFace",
            "HuggingFace": {"org_model": "openmmlab/upernet-convnext-tiny"},
        },
        "use_metadata": False, "use_augmentation": False, "use_weights": True,
        "channels": [1, 2, 3],
        "norm_type": "scaling", "norm_means": [], "norm_stds": [],
        "classes": {i: [1, f"c{i}"] for i in range(1, 4)},
        "batch_size": 2, "learning_rate": 0.01, "seed": 0,
        "auxiliary_loss_weight": 0.4,
    }
    trainer = SegmentationTrainer(config)
    assert trainer.aux_weight == 0.4
    step = trainer.train_step()
    batch = {
        "img": rng.integers(0, 255, size=(2, 64, 64, 3)).astype(np.uint8),
        "msk": rng.integers(0, 3, size=(2, 64, 64)).astype(np.int32),
    }
    img, msk, mtd = trainer._put(batch)
    before = np.asarray(
        trainer.params["auxiliary_head"]["classifier"]["kernel"]).copy()
    params, *_rest, loss, cm, _rng = step(
        trainer.params, trainer.batch_stats, trainer.opt_state,
        img, msk, mtd, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    after = np.asarray(params["auxiliary_head"]["classifier"]["kernel"])
    assert not np.allclose(before, after)  # aux head actually supervised


def test_aux_weight_without_aux_head_raises():
    import pytest

    config = {
        "model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {"encoder_decoder": "resnet18_unet"},
        },
        "channels": [1, 2, 3],
        "norm_type": "scaling", "norm_means": [], "norm_stds": [],
        "classes": {1: [1, "a"], 2: [1, "b"]},
        "batch_size": 2, "auxiliary_loss_weight": 0.4,
    }
    with pytest.raises(ValueError, match="auxiliary"):
        SegmentationTrainer(config)
