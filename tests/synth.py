"""Synthetic toy dataset builders for end-to-end tests.

Replaces the reference's csv_toy fixtures (README:148) with in-repo generated
GeoTIFFs: images whose class is recoverable from the pixels, so a few training
steps measurably reduce loss and prediction metrics are meaningful.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from flairtpu.io.tiff import Affine, write_array


def make_patch(rng, size: int, n_classes: int, n_channels: int = 5):
    """Blocky class regions; channel 0 encodes the class (learnable signal)."""
    blocks = max(size // 8, 1)
    cls = rng.integers(0, n_classes, size=(blocks, blocks))
    msk = np.kron(cls, np.ones((size // blocks, size // blocks), np.int64))[:size, :size]
    img = rng.integers(0, 40, size=(n_channels, size, size)).astype(np.uint8)
    img[0] = (msk * (200 // max(n_classes - 1, 1)) + 20).astype(np.uint8)
    return img, (msk + 1).astype(np.uint8)  # masks are 1-based on disk


def make_dataset(root: Path, n: int, size: int = 32, n_classes: int = 4,
                 n_channels: int = 5, seed: int = 0,
                 crs: int = 2154) -> tuple[list[str], list[str]]:
    rng = np.random.default_rng(seed)
    img_dir, msk_dir = root / "img", root / "msk"
    img_dir.mkdir(parents=True, exist_ok=True)
    msk_dir.mkdir(parents=True, exist_ok=True)
    imgs, msks = [], []
    for i in range(n):
        img, msk = make_patch(rng, size, n_classes, n_channels)
        tr = Affine.from_origin(700000.0 + i * size, 6600000.0, 0.2, 0.2)
        ip, mp = img_dir / f"IMG_{i:06d}.tif", msk_dir / f"MSK_{i:06d}.tif"
        write_array(ip, img, transform=tr, crs=crs, tiled=False)
        write_array(mp, msk, transform=tr, crs=crs, tiled=False)
        imgs.append(str(ip))
        msks.append(str(mp))
    return imgs, msks


def write_csv(path: Path, imgs: list[str], msks: list[str]) -> Path:
    path.write_text("\n".join(f"{i},{m}" for i, m in zip(imgs, msks)) + "\n")
    return path


def toy_train_config(tmp_path: Path, n_classes: int = 4, size: int = 32,
                     **overrides) -> dict:
    train_i, train_m = make_dataset(tmp_path / "train", 8, size, n_classes, seed=1)
    val_i, val_m = make_dataset(tmp_path / "val", 4, size, n_classes, seed=2)
    test_i, test_m = make_dataset(tmp_path / "test", 4, size, n_classes, seed=3)
    cfg = {
        "paths": {
            "out_folder": str(tmp_path / "out"),
            "out_model_name": "toy-model",
            "train_csv": str(write_csv(tmp_path / "train.csv", train_i, train_m)),
            "val_csv": str(write_csv(tmp_path / "val.csv", val_i, val_m)),
            "test_csv": str(write_csv(tmp_path / "test.csv", test_i, test_m)),
            "ckpt_model_path": "",
            "path_metadata_aerial": "",
        },
        "tasks": {
            "train": True,
            "train_tasks": {"init_weights_only_from_ckpt": False,
                            "resume_training_from_ckpt": False},
            "predict": True, "metrics": True, "delete_preds": False,
        },
        "model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {"encoder_decoder": "resnet18_unet"},
        },
        "use_augmentation": True,
        "use_metadata": False,
        "channels": [1, 2, 3, 4, 5],
        "norm_type": "scaling",
        "norm_means": [], "norm_stds": [],
        "seed": 2022,
        "batch_size": 2,
        "learning_rate": 0.1,
        "num_epochs": 4,
        "use_weights": True,
        "classes": {i + 1: [1 if i < n_classes - 1 else 0, f"class_{i}"]
                    for i in range(n_classes)},
        "georeferencing_output": True,
        "accelerator": "cpu", "num_nodes": 1, "gpus_per_node": 1,
        "strategy": "auto", "num_workers": 2,
        "ckpt_save_also_last": True, "ckpt_verbose": False,
        "ckpt_weights_only": False, "ckpt_monitor": "val_loss",
        "ckpt_monitor_mode": "min", "ckpt_earlystopping_patience": 30,
        "cp_csv_and_conf_to_output": False, "enable_progress_bar": False,
    }
    cfg.update(overrides)
    return cfg
