"""YAML config loading + typed validation.

Keeps the exact YAML surface of the reference (``configs/flair-1-config*.yaml``,
see reference ``src/flair/utils.py:5-7`` and ``src/zone_detect/utils.py:13-94``)
but replaces scattered asserts with a single validation layer that normalizes
types, fills defaults, and raises early with actionable messages.

Configs stay plain dicts on purpose: the reference's public contract is
``config['...']`` key access from user YAML, and round-tripping through
dataclasses would silently drop unknown user keys.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any

import yaml


class ConfigError(ValueError):
    """Raised when a config file fails validation."""


def read_config(path: str | os.PathLike) -> dict:
    """Load a YAML config file into a plain dict (reference flair/utils.py:5-7)."""
    with open(path, "r") as f:
        cfg = yaml.safe_load(f)
    if not isinstance(cfg, dict):
        raise ConfigError(f"Config file {path} did not parse to a mapping.")
    return cfg


def _require(cfg: dict, key: str, ctx: str = "config"):
    if key not in cfg:
        raise ConfigError(f"Missing required key '{key}' in {ctx}.")
    return cfg[key]


def _coerce_list(value: Any, expected_type: type) -> list:
    """Coerce scalars to single-element lists; filter/validate element types.

    Mirrors ``check_list_type`` semantics (reference zone_detect/utils.py:97-107).
    """
    if isinstance(value, expected_type):
        value = [value]
    elif value is None:
        value = []
    elif hasattr(value, "__iter__"):
        value = [expected_type(v) if isinstance(v, (int, float)) else v for v in value]
    for v in value:
        if not isinstance(v, expected_type):
            raise ConfigError(f"List element {v!r} is not of type {expected_type.__name__}.")
    return value


# ---------------------------------------------------------------------------
# classes / weights helpers (shared by train + metrics paths)
# ---------------------------------------------------------------------------

def class_weights(cfg: dict) -> list[float]:
    """Per-class weights in class-id order (reference tasks_utils.py:88-93)."""
    classes = _require(cfg, "classes")
    return [float(classes[k][0]) for k in classes]


def class_names(cfg: dict) -> list[str]:
    classes = _require(cfg, "classes")
    return [str(classes[k][1]) for k in classes]


def num_classes(cfg: dict) -> int:
    return len(_require(cfg, "classes"))


# ---------------------------------------------------------------------------
# flair (patch train/predict/metrics) config
# ---------------------------------------------------------------------------

_NORM_TYPES = ("scaling", "custom", "without")


def _validate_model_name(mf: dict, n_channels: int | None = None) -> None:
    """Fail at config time on model names the factory would reject 30s later
    (after the model-zoo imports) — the reference defers this to smp/
    transformers construction errors (src/flair/model.py:35-50)."""
    from flairtpu.models.registry import validate_model_framework

    try:
        validate_model_framework(mf, n_channels=n_channels)
    except (NotImplementedError, ValueError) as e:
        # ValueError covers encoder/arch incompatibilities (e.g. vgg/densenet
        # with the dilated archs, mirroring smp's make_dilated errors)
        raise ConfigError(str(e)) from None
    except KeyError as e:
        raise ConfigError(f"model_framework is missing key {e}.") from None


def validate_train_config(cfg: dict) -> dict:
    """Validate the `flair --conf` YAML (schema: reference configs/flair-1-config.yaml)."""
    paths = _require(cfg, "paths")
    tasks = _require(cfg, "tasks")
    mf = _require(cfg, "model_framework")
    provider = _require(mf, "model_provider", "model_framework")
    if provider not in ("SegmentationModelsPytorch", "HuggingFace"):
        raise ConfigError(
            "model_provider should be either HuggingFace or SegmentationModelsPytorch, "
            f"got {provider!r}."
        )
    channels = _require(cfg, "channels")
    if not (isinstance(channels, list) and all(isinstance(c, int) for c in channels)):
        raise ConfigError("channels should be a list of 1-based integers.")
    _validate_model_name(mf, n_channels=len(channels))

    norm_type = cfg.get("norm_type", "scaling")
    if norm_type not in _NORM_TYPES:
        raise ConfigError(f"norm_type should be one of {_NORM_TYPES}, got {norm_type!r}.")
    if norm_type == "custom":
        means, stds = cfg.get("norm_means", []), cfg.get("norm_stds", [])
        if len(means) != len(stds):
            raise ConfigError("custom normalization means and stds must be the same length.")
        if len(means) != len(channels):
            raise ConfigError("custom normalization means/stds must match len(channels).")

    classes = _require(cfg, "classes")
    for k, v in classes.items():
        if not (isinstance(v, (list, tuple)) and len(v) == 2):
            raise ConfigError(f"classes[{k}] must be [weight, name], got {v!r}.")

    cfg.setdefault("use_metadata", False)
    cfg.setdefault("use_augmentation", False)
    cfg.setdefault("use_weights", True)
    # TPU-native memory knobs (no reference analog: Lightning gets these from
    # accumulate_grad_batches / torch checkpointing)
    cfg.setdefault("accumulate_steps", 1)
    cfg.setdefault("remat", False)
    cfg.setdefault("remat_policy", None)
    if cfg["remat_policy"] is not None:
        import jax

        if not hasattr(jax.checkpoint_policies, str(cfg["remat_policy"])):
            raise ConfigError(
                f"remat_policy {cfg['remat_policy']!r} is not a "
                "jax.checkpoint_policies member (e.g. dots_saveable, "
                "dots_with_no_batch_dims_saveable).")
    if not (isinstance(cfg["accumulate_steps"], int) and cfg["accumulate_steps"] >= 1):
        raise ConfigError("accumulate_steps must be an integer >= 1.")
    # BN compute dtype: fp32 (torch parity) or bfloat16 (+8% measured train
    # step on v5e — PERFORMANCE.md round-4 train MFU); params/stats stay fp32
    cfg.setdefault("bn_dtype", "float32")
    if cfg["bn_dtype"] not in ("float32", "bfloat16"):
        raise ConfigError(
            f"bn_dtype must be float32 or bfloat16, got {cfg['bn_dtype']!r}.")
    # parameter placement over the device mesh (no reference analog: Lightning
    # DDP is always replicated; see flairtpu/parallel/sharding.py)
    cfg.setdefault("param_sharding", "replicated")
    if cfg["param_sharding"] not in ("replicated", "fsdp", "tensor"):
        raise ConfigError(
            "param_sharding must be one of replicated/fsdp/tensor, "
            f"got {cfg['param_sharding']!r}.")
    cfg.setdefault("tensor_parallel", 1)
    if not (isinstance(cfg["tensor_parallel"], int) and cfg["tensor_parallel"] >= 1):
        raise ConfigError("tensor_parallel must be an integer >= 1.")
    if cfg["param_sharding"] == "tensor" and cfg["tensor_parallel"] < 2:
        raise ConfigError(
            "param_sharding: tensor needs tensor_parallel >= 2 "
            "(the size of the mesh's model axis).")
    # spatial partitioning: image height sharded over a 'space' mesh axis
    # (flairtpu/parallel/mesh.py batch_sharding)
    cfg.setdefault("spatial_parallel", 1)
    if not (isinstance(cfg["spatial_parallel"], int) and cfg["spatial_parallel"] >= 1):
        raise ConfigError("spatial_parallel must be an integer >= 1.")
    if cfg["spatial_parallel"] > 1 and cfg["param_sharding"] == "tensor":
        raise ConfigError(
            "spatial_parallel > 1 cannot combine with param_sharding: tensor "
            "(use replicated or fsdp).")
    if cfg.get("batch_size") and cfg["accumulate_steps"] > 1 \
            and int(cfg["batch_size"]) % cfg["accumulate_steps"]:
        raise ConfigError(
            f"batch_size {cfg['batch_size']} is not divisible by "
            f"accumulate_steps {cfg['accumulate_steps']}.")
    # preemption-safe step-level autosave (0 = off; see train/loop.py and
    # train/checkpoints.py StepAutosaver — no reference analog)
    cfg.setdefault("autosave_every_steps", 0)
    if not (isinstance(cfg["autosave_every_steps"], int)
            and cfg["autosave_every_steps"] >= 0):
        raise ConfigError("autosave_every_steps must be an integer >= 0.")
    cfg.setdefault("autosave_resume", True)
    # pretrained-encoder init from a bare ImageNet classifier state dict
    # (the explicit analog of smp's encoder_weights='imagenet' default, ref
    # src/flair/model.py:35-41; see flairtpu/models/pretrained.py)
    cfg.setdefault("init_encoder_weights", "")
    if cfg["init_encoder_weights"]:
        if cfg["model_framework"]["model_provider"] != "SegmentationModelsPytorch":
            raise ConfigError(
                "init_encoder_weights applies to the SegmentationModelsPytorch "
                "provider only (HuggingFace models: use init_hf_pretrained "
                "with a local transformers checkpoint).")
        if not Path(str(cfg["init_encoder_weights"])).exists():
            raise ConfigError(
                f"init_encoder_weights file not found: "
                f"{cfg['init_encoder_weights']!r}")
    # HF-provider pretrained init from a LOCAL transformers checkpoint (a
    # save_pretrained dir or model.safetensors/pytorch_model.bin file) — the
    # explicit analog of the reference's always-pretrained HF path
    # (from_pretrained + ignore_mismatched_sizes, ref src/flair/model.py:43-50;
    # see flairtpu/models/hf_pretrained.py)
    cfg.setdefault("init_hf_pretrained", "")
    if cfg["init_hf_pretrained"]:
        if cfg["model_framework"]["model_provider"] != "HuggingFace":
            raise ConfigError(
                "init_hf_pretrained applies to the HuggingFace provider only "
                "(SegmentationModelsPytorch models: use init_encoder_weights "
                "for ImageNet classifier weights, or "
                "init_weights_only_from_ckpt for a full checkpoint).")
        if not Path(str(cfg["init_hf_pretrained"])).exists():
            raise ConfigError(
                f"init_hf_pretrained path not found: "
                f"{cfg['init_hf_pretrained']!r}")
    cfg.setdefault("seed", 2022)
    cfg.setdefault("georeferencing_output", True)
    cfg.setdefault("accelerator", "tpu")
    cfg.setdefault("num_nodes", 1)
    cfg.setdefault("strategy", "auto")
    cfg.setdefault("num_workers", 4)
    cfg.setdefault("ckpt_save_also_last", True)
    cfg.setdefault("ckpt_weights_only", False)
    cfg.setdefault("ckpt_monitor", "val_loss")
    cfg.setdefault("ckpt_monitor_mode", "min")
    cfg.setdefault("ckpt_earlystopping_patience", 30)
    cfg.setdefault("cp_csv_and_conf_to_output", True)
    cfg.setdefault("enable_progress_bar", True)
    if cfg["ckpt_monitor_mode"] not in ("min", "max"):
        raise ConfigError("ckpt_monitor_mode must be 'min' or 'max'.")

    train_tasks = tasks.get("train_tasks", {}) or {}
    tasks.setdefault("train", False)
    tasks.setdefault("predict", False)
    tasks.setdefault("metrics", False)
    tasks.setdefault("delete_preds", False)
    train_tasks.setdefault("init_weights_only_from_ckpt", False)
    train_tasks.setdefault("resume_training_from_ckpt", False)
    tasks["train_tasks"] = train_tasks

    paths.setdefault("out_folder", "")
    paths.setdefault("out_model_name", "flair-model")
    return cfg


# ---------------------------------------------------------------------------
# flair-detect (zone inference) config
# ---------------------------------------------------------------------------

_OUTPUT_TYPES = ("class_prob", "argmax")
_STITCH_METHODS = ("exact-clipping", "average", "average_weights", "max")


def validate_detect_config(cfg: dict) -> dict:
    """Validate the `flair-detect` YAML (reference zone_detect/utils.py:26-94)."""
    cfg.setdefault("metrics", False)
    cfg.setdefault("batch_mode", False)
    cfg.setdefault("compare", False)
    cfg.setdefault("write_dataframe", False)
    # reference semantics (src/zone_detect/main.py:239): use_gpu false -> CPU;
    # here true selects JAX's default backend (the TPU) and false the CPU one
    cfg.setdefault("use_gpu", True)
    cfg.setdefault("num_worker", 2)
    cfg.setdefault("batch_size", 4)

    Path(_require(cfg, "output_path")).mkdir(parents=True, exist_ok=True)
    in_path = _require(cfg, "input_img_path")
    if not cfg.get("batch_mode") and not os.path.exists(in_path):
        raise ConfigError(f"Input image path does not exist: {in_path}")

    if cfg["metrics"]:
        cfg["metrics_out"] = str(Path(cfg["output_path"]) / "metrics.json")
        if not cfg.get("batch_mode"):
            truth = _require(cfg, "truth_path")
            if not os.path.exists(truth):
                raise ConfigError(f"Ground truth path does not exist: {truth}")

    channels = _require(cfg, "channels")
    if not (isinstance(channels, list) and all(isinstance(c, int) for c in channels)):
        raise ConfigError("Channels should be a list of integers.")

    size = _require(cfg, "img_pixels_detection")
    margin = _require(cfg, "margin")
    if not isinstance(size, int):
        raise ConfigError("img_pixels_detection should be an integer.")
    if not (isinstance(margin, int) and 2 * margin < size):
        raise ConfigError("margin should be an integer and less than half of img_pixels_detection.")

    if _require(cfg, "output_type") not in _OUTPUT_TYPES:
        raise ConfigError("Invalid output type: should be argmax or class_prob.")
    if not isinstance(_require(cfg, "n_classes"), int):
        raise ConfigError("n_classes should be an integer.")

    norma = _require(cfg, "norma_task")
    if norma[0]["norm_type"] not in ("custom", "scaling"):
        raise ConfigError("Invalid normalization type: should be custom or scaling.")

    if isinstance(cfg.get("model_framework"), dict):
        _validate_model_name(cfg["model_framework"], n_channels=len(channels))

    quant = cfg.get("quantize")
    if quant not in (None, False, "int8"):
        raise ConfigError(
            "quantize: 'int8' is the only supported value (or omit the key).")
    dec_blocks = cfg.get("int8_decoder", True)
    if not (isinstance(dec_blocks, bool)
            or (isinstance(dec_blocks, int) and 0 <= dec_blocks <= 5)):
        raise ConfigError(
            "int8_decoder: expected a bool or a block count 0..5 "
            f"(got {dec_blocks!r}).")
    fold = cfg.get("bn_fold", False)
    if not isinstance(fold, bool):
        raise ConfigError(f"bn_fold: expected a bool (got {fold!r}).")
    if quant or fold:
        from flairtpu.models.registry import RESNET_ENCODERS, check_smp

        mf = cfg.get("model_framework") or {}
        enc = None
        if (isinstance(mf, dict)
                and mf.get("model_provider") == "SegmentationModelsPytorch"):
            try:
                enc, _ = check_smp(
                    (mf.get("SegmentationModelsPytorch") or {})
                    .get("encoder_decoder", ""))
            except Exception:
                enc = None  # the model name itself was already validated above
        is_resnet = enc in RESNET_ENCODERS
        is_mit = enc is not None and enc.startswith("mit_")
        if quant and not (is_resnet or is_mit):
            raise ConfigError(
                "quantize: int8 requires a SegmentationModelsPytorch "
                "ResNet-family or mit_b* encoder (one of: "
                + ", ".join(RESNET_ENCODERS) + ", mit_b0..b5).")
        # bn_fold folds BatchNorm — meaningless for the BN-free MiT
        # encoders unless composed with quantize (where it only selects
        # the float sites' dtype)
        if fold and not is_resnet and not (quant and is_mit):
            raise ConfigError(
                "bn_fold requires a SegmentationModelsPytorch "
                "ResNet-family encoder (one of: "
                + ", ".join(RESNET_ENCODERS) + ").")

    weights = _require(cfg, "model_weights")
    if not os.path.isfile(weights):
        raise ConfigError(f"Model weights file does not exist: {weights}")
    if os.path.splitext(str(weights))[1] not in (".pth", ".ckpt", ".msgpack", ".flax"):
        raise ConfigError(
            "Model weights should be a .pth/.ckpt (torch) or .msgpack/.flax (native) file. "
            f"Got {os.path.splitext(str(weights))[1]!r}"
        )

    if cfg["compare"]:
        strat = _require(cfg, "strategies")
        tiling = strat.setdefault("tiling", {})
        tiling["size_range"] = _coerce_list(tiling.get("size_range"), int)
        tiling["stride_range"] = _coerce_list(tiling.get("stride_range"), float)
        if not all(0 <= s <= 1 for s in tiling["stride_range"]):
            raise ConfigError("Stride should be a percentage in [0, 1].")
        stitching = strat.setdefault("stitching", {})
        stitching["methods"] = _coerce_list(
            stitching.get("methods", stitching.get("method")), str
        )
        for m in stitching["methods"]:
            if m not in _STITCH_METHODS:
                raise ConfigError(f"Unknown stitching method {m!r}; valid: {_STITCH_METHODS}.")
        stitching["margin"] = _coerce_list(stitching.get("margin"), float)
        if not all(0 <= m <= 1 for m in stitching["margin"]):
            raise ConfigError("Margin should be a percentage in [0, 1].")

    return cfg


def gen_param_combination(cfg: dict) -> list[dict]:
    """Cross-product of compare-mode strategies (reference zone_detect/utils.py:110-167).

    padding x tile sizes x margins (fractional margins resolved against the tile
    size) x strides x stitching methods; combos with size <= 2*margin are skipped.
    """
    from flairtpu.zone.grid import get_stride

    combos = []
    padding_list = (cfg.get("strategies") or {}).get("padding_overall") or ["no-padding"]
    if isinstance(padding_list, str):
        padding_list = [padding_list]

    tiling = (cfg.get("strategies") or {}).get("tiling") or {}
    sizes = tiling.get("size_range") if tiling.get("enabled") else None
    sizes = sizes or [cfg["img_pixels_detection"]]

    stitching = (cfg.get("strategies") or {}).get("stitching") or {}
    if stitching.get("enabled"):
        margins = stitching.get("margin") or [cfg["margin"]]
        methods = stitching.get("methods") or ["exact-clipping"]
    else:
        margins = [cfg["margin"]]
        methods = ["exact-clipping"]

    for padding in padding_list:
        for size in sizes:
            for margin in margins:
                if margin < 1:
                    margin = int(margin * size)
                if size <= 2 * margin:
                    print(f"    [x] skipping {size} pixels detection size with {margin} margin...")
                    continue
                tmp = dict(cfg)
                tmp["margin"], tmp["img_pixels_detection"] = margin, size
                for stride in get_stride(tmp):
                    for stitch in methods:
                        combos.append(
                            {
                                "img_pixels_detection": size,
                                "margin": margin,
                                "padding": padding,
                                "stitching": stitch,
                                "stride": stride,
                            }
                        )
    return combos
