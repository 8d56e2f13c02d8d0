"""End-to-end train -> predict -> metrics on a synthetic toy dataset (CPU)."""

import json
from pathlib import Path

import numpy as np
import pytest

from flairtpu import config as cfgmod
from flairtpu.data.manifest import gather_paths
from flairtpu.eval.metrics import metrics as eval_metrics
from flairtpu.io import TiffReader
from flairtpu.predict.runner import predict
from flairtpu.train.loop import SegmentationTrainer, evaluate, fit
from tests.synth import toy_train_config


@pytest.fixture(scope="module")
def toy_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("toy")
    config = cfgmod.validate_train_config(toy_train_config(tmp))
    dict_train = gather_paths(config, "train")
    dict_val = gather_paths(config, "val")
    dict_test = gather_paths(config, "test")
    out_dir = Path(config["paths"]["out_folder"], config["paths"]["out_model_name"])
    trainer, info = fit(config, dict_train, dict_val, out_dir)
    return config, trainer, info, out_dir, dict_test


def test_training_improves_loss(toy_run):
    _, _, info, _, _ = toy_run
    h = info["history"]
    assert len(h) == 4
    assert h[-1]["train_loss"] < h[0]["train_loss"] * 1.05  # learning, not diverging
    assert Path(info["best_path"]).exists()


def test_checkpoints_layout(toy_run):
    config, _, info, out_dir, _ = toy_run
    best = Path(info["best_path"])
    assert best.name.startswith("ckpt-") and best.name.endswith("_toy-model")
    assert (out_dir / "last").exists()
    assert (out_dir / "history.json").exists()
    assert (out_dir / "metrics.jsonl").exists()


def test_predict_and_metrics(toy_run):
    config, trainer, _, out_dir, dict_test = toy_run
    pred_dir = out_dir / "predictions_toy-model"
    predict(config, dict_test, pred_dir, trainer)
    preds = sorted(pred_dir.glob("PRED_*.tif"))
    assert len(preds) == 4
    with TiffReader(preds[0]) as r:
        assert r.count == 1 and r.dtype.kind == "u"
        assert r.crs == 2154  # georeferencing propagated from the input
        arr = r.read(1)
        assert arr.max() < len(config["classes"])

    result = eval_metrics(config, pred_dir)
    mfile = json.loads((out_dir / "metrics" / "metrics.json").read_text())
    assert mfile["Avg_metrics_name"][0] == "mIoU"
    # weight-0 class excluded from per-class listings
    assert "class_3" not in mfile["classes"]
    assert len(mfile["per_class_iou"]) == 3
    confmat = np.load(out_dir / "metrics" / "confmat.npy")
    assert confmat.shape == (4, 4)
    # channel 0 encodes the class: even 2 epochs must beat random (25%) OA
    assert mfile["Avg_metrics"][1] > 30.0


def test_resume_from_last(toy_run, tmp_path):
    config, _, info, out_dir, _ = toy_run
    cfg = json.loads(json.dumps(config))  # deep copy
    cfg["paths"]["out_folder"] = str(tmp_path / "resume_out")
    cfg["paths"]["ckpt_model_path"] = str(out_dir / "last")
    cfg["tasks"]["train_tasks"]["resume_training_from_ckpt"] = True
    cfg["num_epochs"] = 5  # one more epoch after the 4 completed
    dict_train = gather_paths(cfg, "train")
    dict_val = gather_paths(cfg, "val")
    trainer, info2 = fit(cfg, dict_train, dict_val,
                         Path(cfg["paths"]["out_folder"], "toy-model"))
    assert [h["epoch"] for h in info2["history"]] == [4]


def test_plateau_monitors_val_loss_not_ckpt_monitor(tmp_path, monkeypatch):
    """With ckpt_monitor=val_miou/max, the LR must NOT decay while mIoU
    improves: the reference plateau scheduler always watches val_loss in min
    mode (task_module.py:156-168, tasks_utils.py:95-104); only checkpointing
    and early stopping follow ckpt_monitor (tasks.py:47-63)."""
    from flairtpu.train import loop as loop_mod

    cfg = cfgmod.validate_train_config(toy_train_config(
        tmp_path, num_epochs=13, learning_rate=0.1,
        ckpt_monitor="val_miou", ckpt_monitor_mode="max"))
    # keep each epoch to one tiny batch
    train_csv = Path(cfg["paths"]["train_csv"]).read_text().splitlines()[:2]
    Path(cfg["paths"]["train_csv"]).write_text("\n".join(train_csv) + "\n")
    dict_train = gather_paths(cfg, "train")
    dict_val = gather_paths(cfg, "val")

    calls = {"n": 0}

    def scripted_evaluate(trainer, loader):
        calls["n"] += 1
        i = calls["n"]
        # both metrics strictly improving every epoch
        return {"val_loss": 1.0 / i, "val_miou": 1.0 - 1.0 / (i + 1),
                "confmat": np.eye(trainer.num_classes, dtype=np.int64)}

    monkeypatch.setattr(loop_mod, "evaluate", scripted_evaluate)
    out_dir = tmp_path / "out" / "plateau"
    loop_mod.fit(cfg, dict_train, dict_val, out_dir)
    lrs = [json.loads(line)["lr"]
           for line in (out_dir / "metrics.jsonl").read_text().splitlines()]
    assert len(lrs) == 13
    assert all(lr == pytest.approx(0.1) for lr in lrs), lrs


def test_per_class_iou_monitor_drives_ckpt_and_early_stop(tmp_path, monkeypatch):
    """ckpt_monitor=val_iou_<class> checkpoints + early-stops on that class's
    IoU (the reference's ModelCheckpoint monitors any logged metric,
    ref tasks.py:47-56; per-class IoUs are logged as val_iou_<name>)."""
    from flairtpu.train import loop as loop_mod

    cfg = cfgmod.validate_train_config(toy_train_config(
        tmp_path, num_epochs=10, ckpt_monitor="val_iou_class_0",
        ckpt_monitor_mode="max", ckpt_earlystopping_patience=2))
    train_csv = Path(cfg["paths"]["train_csv"]).read_text().splitlines()[:2]
    Path(cfg["paths"]["train_csv"]).write_text("\n".join(train_csv) + "\n")
    dict_train = gather_paths(cfg, "train")
    dict_val = gather_paths(cfg, "val")

    calls = {"n": 0}

    def scripted_evaluate(trainer, loader):
        calls["n"] += 1
        # class-0 IoU: 0.2 on epoch 1, 0.8 from epoch 2 on (plateau)
        tp0 = 2 if calls["n"] == 1 else 8
        cm = np.diag([tp0, 5, 5, 5]).astype(np.int64)
        cm[0, 1] = 10 - tp0  # false negatives for class 0
        return {"val_loss": 1.0, "val_miou": 0.5, "confmat": cm}

    monkeypatch.setattr(loop_mod, "evaluate", scripted_evaluate)
    out_dir = tmp_path / "out" / "perclass"
    _, info = loop_mod.fit(cfg, dict_train, dict_val, out_dir)
    # best at epoch 2 (0-indexed 1), early stop after patience=2 flat epochs
    assert len(info["history"]) == 4
    best = Path(info["best_path"])
    assert best.name == "ckpt-01-0.80_toy-model"
    # the saved checkpoint carries the extra monitor scalar; tolerant restore
    from flairtpu.train import checkpoints as ckpt_lib
    manager = ckpt_lib.CheckpointManager(out_dir, model_name="toy-model")
    restored = manager.restore(best, {"epoch": 0, "val_loss": 0.0})
    assert int(restored["epoch"]) == 1


def test_per_class_monitor_validation(tmp_path):
    """weight-0 classes and unknown names are rejected at fit() entry."""
    from flairtpu.train.loop import _validate_monitor

    cfg = cfgmod.validate_train_config(toy_train_config(tmp_path))
    _validate_monitor("val_iou_class_0", cfg)  # weight-1: ok
    with pytest.raises(ValueError, match="weight!=0"):
        _validate_monitor("val_iou_class_3", cfg)  # weight-0 class
    with pytest.raises(ValueError, match="weight!=0"):
        _validate_monitor("val_iou_nope", cfg)
    with pytest.raises(ValueError, match="not a logged metric"):
        _validate_monitor("val_lass", cfg)


def test_init_weights_with_class_surgery(toy_run, tmp_path):
    """Weights-only init from a ckpt with a different class count."""
    config, _, info, out_dir, _ = toy_run
    from flairtpu.train import checkpoints as ckpt_lib
    from flairtpu.models.factory import init_model

    cfg = json.loads(json.dumps(config))
    cfg["classes"] = {i + 1: [1, f"c{i}"] for i in range(7)}  # 4 -> 7 classes
    tr = SegmentationTrainer(cfg)
    variables = ckpt_lib.init_weights_with_surgery(
        str(out_dir / "last"),
        {"params": tr.params, "batch_stats": tr.batch_stats}, verbose=False)
    head = variables["params"]["segmentation_head"]["conv"]
    assert head["kernel"].shape[-1] == 7
    assert np.all(np.asarray(head["kernel"]) == 0)  # zeroed, reference semantics
    # encoder weights survived
    enc = variables["params"]["encoder"]["conv1"]["kernel"]
    assert np.abs(np.asarray(enc)).sum() > 0
