"""Metadata-fusion training-path smoke test (512-px inputs required by the
fusion rule, so one jitted step only — reference flair/model.py:56-62)."""

import numpy as np
import jax
import pytest

from flairtpu.train.loop import SegmentationTrainer


def test_metadata_train_step(rng):
    config = {
        "model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {"encoder_decoder": "resnet18_unet"},
        },
        "use_metadata": True,
        "use_augmentation": True,
        "use_weights": True,
        "channels": [1, 2, 3, 4, 5],
        "norm_type": "scaling", "norm_means": [], "norm_stds": [],
        "classes": {i: [1, f"c{i}"] for i in range(1, 5)},
        "batch_size": 2,
        "learning_rate": 0.01,
        "seed": 0,
        "num_workers": 0,
    }
    trainer = SegmentationTrainer(config)
    assert "metadata_mlp" in trainer.params
    step = trainer.train_step()
    batch = {
        "img": rng.integers(0, 255, size=(2, 512, 512, 5)).astype(np.uint8),
        "msk": rng.integers(0, 4, size=(2, 512, 512)).astype(np.int32),
        "mtd": rng.standard_normal((2, 45), dtype=np.float32),
    }
    img, msk, mtd = trainer._put(batch)
    # copy before the step: the jitted step donates its input buffers
    before = np.asarray(trainer.params["metadata_mlp"]["fc0"]["kernel"]).copy()
    params, stats, opt, loss, cm, _rng = step(
        trainer.params, trainer.batch_stats, trainer.opt_state,
        img, msk, mtd, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert np.asarray(cm).sum() == 2 * 512 * 512
    # metadata MLP received gradient (params changed)
    after = np.asarray(params["metadata_mlp"]["fc0"]["kernel"])
    assert not np.allclose(before, after)


def test_metadata_missing_raises(rng):
    config = {
        "model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {"encoder_decoder": "resnet18_unet"},
        },
        "use_metadata": True,
        "channels": [1, 2, 3],
        "norm_type": "scaling", "norm_means": [], "norm_stds": [],
        "classes": {1: [1, "a"], 2: [1, "b"]},
        "batch_size": 2,
    }
    trainer = SegmentationTrainer(config)
    with pytest.raises(ValueError, match="no 'mtd'"):
        trainer._put({"img": np.zeros((2, 32, 32, 3), np.uint8)})


def test_drain_epoch_matches_per_batch_accumulation(rng):
    """_drain_epoch (one host fetch per epoch) == per-batch float()/asarray."""
    import jax.numpy as jnp

    from flairtpu.train.loop import _drain_epoch

    losses = [jnp.float32(v) for v in [0.5, 1.25, 3.0]]
    cms = [jnp.asarray(rng.integers(0, 50, size=(4, 4))) for _ in range(3)]
    loss_sum, cm = _drain_epoch(losses, cms)
    assert loss_sum == pytest.approx(4.75)
    np.testing.assert_array_equal(
        cm, sum(np.asarray(c, np.int64) for c in cms))
    assert cm.dtype == np.int64

    loss0, cm0 = _drain_epoch([], [])
    assert loss0 == 0.0 and cm0.size == 0
