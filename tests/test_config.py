"""Config loading/validation tests (YAML surface parity with the reference)."""

import numpy as np
import pytest
import yaml

from flairtpu import config as cfgmod
from flairtpu.io.tiff import write_array

TRAIN_YAML = """
paths:
    out_folder: '{out}'
    out_model_name: 'toy'
    train_csv: null
    val_csv: null
    test_csv: null
    ckpt_model_path: ''
    path_metadata_aerial: ''
tasks:
    train: true
    train_tasks:
        init_weights_only_from_ckpt: false
        resume_training_from_ckpt: false
    predict: false
    metrics: false
    delete_preds: false
model_framework:
    model_provider: SegmentationModelsPytorch
    SegmentationModelsPytorch:
        encoder_decoder: resnet34_unet
use_augmentation: true
use_metadata: false
channels: [1, 2, 3, 4, 5]
norm_type: custom
norm_means: [105.08, 110.87, 101.82, 106.38, 53.26]
norm_stds: [52.17, 45.38, 44, 39.69, 79.3]
seed: 2022
batch_size: 2
learning_rate: 0.02
num_epochs: 1
use_weights: true
classes:
    1: [1, 'building']
    2: [1, 'water']
    3: [0, 'other']
georeferencing_output: true
accelerator: cpu
num_nodes: 1
gpus_per_node: 1
strategy: auto
num_workers: 1
ckpt_save_also_last: true
ckpt_verbose: false
ckpt_weights_only: false
ckpt_monitor: val_loss
ckpt_monitor_mode: min
ckpt_earlystopping_patience: 30
cp_csv_and_conf_to_output: false
enable_progress_bar: false
"""


def test_train_config_roundtrip(tmp_path):
    p = tmp_path / "conf.yaml"
    p.write_text(TRAIN_YAML.format(out=tmp_path))
    cfg = cfgmod.read_config(p)
    cfg = cfgmod.validate_train_config(cfg)
    assert cfg["model_framework"]["model_provider"] == "SegmentationModelsPytorch"
    assert cfgmod.class_weights(cfg) == [1.0, 1.0, 0.0]
    assert cfgmod.class_names(cfg) == ["building", "water", "other"]
    assert cfgmod.num_classes(cfg) == 3


def test_train_config_rejects_bad_provider(tmp_path):
    p = tmp_path / "conf.yaml"
    p.write_text(TRAIN_YAML.format(out=tmp_path).replace(
        "SegmentationModelsPytorch\n", "NotAProvider\n", 1))
    cfg = cfgmod.read_config(p)
    with pytest.raises(cfgmod.ConfigError, match="model_provider"):
        cfgmod.validate_train_config(cfg)


def _detect_cfg(tmp_path, rng, **over):
    img = tmp_path / "zone.tif"
    write_array(img, rng.integers(0, 255, size=(5, 64, 64), dtype=np.uint8))
    weights = tmp_path / "w.msgpack"
    weights.write_bytes(b"0")
    cfg = {
        "output_path": str(tmp_path / "out"),
        "output_name": "pred",
        "input_img_path": str(img),
        "channels": [1, 2, 3, 4, 5],
        "img_pixels_detection": 32,
        "margin": 8,
        "output_type": "argmax",
        "n_classes": 3,
        "model_weights": str(weights),
        "model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {"encoder_decoder": "resnet34_unet"},
        },
        "batch_size": 2,
        "use_gpu": False,
        "num_worker": 1,
        "write_dataframe": False,
        "norma_task": [
            {"norm_type": "scaling", "norm_means": [], "norm_stds": []}
        ],
    }
    cfg.update(over)
    return cfg


def test_detect_config_valid(tmp_path, rng):
    cfg = cfgmod.validate_detect_config(_detect_cfg(tmp_path, rng))
    assert cfg["compare"] is False


def test_detect_config_margin_check(tmp_path, rng):
    with pytest.raises(cfgmod.ConfigError, match="margin"):
        cfgmod.validate_detect_config(_detect_cfg(tmp_path, rng, margin=16))


def test_gen_param_combination(tmp_path, rng):
    cfg = _detect_cfg(tmp_path, rng)
    cfg["compare"] = True
    cfg["strategies"] = {
        "tiling": {"enabled": True, "size_range": [32, 64], "stride_range": [0.75]},
        "stitching": {"enabled": True, "methods": ["average", "exact-clipping"],
                      "margin": [0.25]},
        "padding_overall": None,
    }
    cfg = cfgmod.validate_detect_config(cfg)
    combos = cfgmod.gen_param_combination(cfg)
    # 2 sizes x 1 margin x 1 stride x 2 methods = 4
    assert len(combos) == 4
    assert {c["stitching"] for c in combos} == {"average", "exact-clipping"}
    # fractional margin resolved against tile size
    assert {c["margin"] for c in combos} == {8, 16}
    # stride = 0.75 * size under overlap_strat... (no overlap_strat key -> default)
    assert all(c["stride"] == c["img_pixels_detection"] - 2 * c["margin"] for c in combos)


def test_gen_param_combination_overlap_strat(tmp_path, rng):
    cfg = _detect_cfg(tmp_path, rng)
    cfg["compare"] = True
    cfg["overlap_strat"] = True
    cfg["strategies"] = {
        "tiling": {"enabled": True, "size_range": [64], "stride_range": [0.5]},
        "stitching": {"enabled": True, "methods": ["average"], "margin": [0.25]},
    }
    cfg = cfgmod.validate_detect_config(cfg)
    combos = cfgmod.gen_param_combination(cfg)
    assert [c["stride"] for c in combos] == [32]


def test_shipped_configs_parse():
    """All four shipped YAMLs (reference configs/ parity) are valid YAML with
    the expected schema anchors (paths in them are placeholders, so full
    validation is exercised by the e2e tests instead)."""
    from pathlib import Path

    cfg_dir = Path(__file__).parent.parent / "configs"
    names = {p.name for p in cfg_dir.glob("*.yaml")}
    assert {"flair-1-config.yaml", "flair-1-config-detect.yaml",
            "flair-1-config-detect-compare.yaml",
            "config_detect_compare_metrics.yaml"} <= names
    for p in cfg_dir.glob("*.yaml"):
        cfg = yaml.safe_load(p.read_text())
        assert isinstance(cfg, dict), p.name
        if "img_pixels_detection" in cfg:  # detect-style configs
            assert cfg["model_framework"]["model_provider"] in (
                "HuggingFace", "SegmentationModelsPytorch")
            assert isinstance(cfg["norma_task"], list)
        else:  # train config
            assert "tasks" in cfg and "classes" in cfg
    # the worked sweep example mirrors the reference's strategy block
    sweep = yaml.safe_load((cfg_dir / "config_detect_compare_metrics.yaml").read_text())
    assert sweep["strategies"]["tiling"]["size_range"] == [128, 256, 512, 1024, 2048]
    assert set(sweep["strategies"]["stitching"]["methods"]) == {
        "average", "average_weights", "max", "exact-clipping"}
    # the pod-scale example fully validates (its paths are the toy CSVs)
    pod = yaml.safe_load((cfg_dir / "flair-1-config-tpu-pod.yaml").read_text())
    pod = cfgmod.validate_train_config(pod)
    assert pod["param_sharding"] == "fsdp"
    assert pod["remat"] and pod["accumulate_steps"] == 2
