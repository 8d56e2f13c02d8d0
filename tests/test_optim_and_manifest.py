"""Scheduler parity vs torch, early stopping, metadata manifests, tools CLI."""

import json

import numpy as np
import pytest
import torch

from flairtpu.data.manifest import ManifestError, gather_paths
from flairtpu.data.metadata import METADATA_DIM, encode_patch_metadata
from flairtpu.train.optim import EarlyStopping, ReduceLROnPlateau


def test_plateau_scheduler_matches_torch(rng):
    """LR trajectory identical to torch ReduceLROnPlateau on a metric series."""
    lr0 = 0.02
    ours = ReduceLROnPlateau(lr=lr0, factor=0.5, patience=10, cooldown=4,
                             min_lr=1e-7)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr0)
    theirs = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=10, cooldown=4, min_lr=1e-7)

    metrics = list(np.concatenate([
        np.linspace(1.0, 0.5, 8),          # improving
        np.full(15, 0.5),                  # plateau -> reduction
        np.linspace(0.5, 0.4, 5),          # improving again
        np.full(40, 0.4),                  # long plateau -> more reductions
    ]))
    trajectory_ours, trajectory_torch = [], []
    for m in metrics:
        trajectory_ours.append(ours.step(float(m)))
        theirs.step(float(m))
        trajectory_torch.append(opt.param_groups[0]["lr"])
    assert trajectory_ours == pytest.approx(trajectory_torch)
    assert trajectory_ours[-1] < lr0  # reductions actually happened


def test_early_stopping_patience():
    es = EarlyStopping(monitor_mode="min", patience=3)
    seq = [1.0, 0.9, 0.95, 0.95, 0.95]  # 3 non-improving after the best
    stops = [es.step(v) for v in seq]
    assert stops == [False, False, False, False, True]


def test_early_stopping_max_mode():
    es = EarlyStopping(monitor_mode="max", patience=2)
    assert not es.step(0.1)
    assert not es.step(0.2)
    assert not es.step(0.15)
    assert es.step(0.18)  # two straight checks below best 0.2


def test_metadata_encoding_dimensions():
    entry = {"patch_centroid_x": 712000.0, "patch_centroid_y": 6620000.0,
             "patch_centroid_z": 120.5, "camera": "UCE-M3", "date": "2020-06-15",
             "time": "10h32"}
    vec = encode_patch_metadata(entry)
    assert vec.shape == (METADATA_DIM,)
    assert vec[32] == pytest.approx(120.5 / 3164.9099121094)  # altitude slot
    assert list(vec[33:35]) == [1.0, 0.0]  # UCE camera one-hot
    assert list(vec[35:39]) == [0.0, 0.0, 1.0, 0.0]  # year 2020


def test_gather_paths_with_metadata(tmp_path):
    img = tmp_path / "IMG_000001.tif"
    msk = tmp_path / "MSK_000001.tif"
    img.write_bytes(b"x")
    msk.write_bytes(b"x")
    csv = tmp_path / "train.csv"
    csv.write_text(f"{img},{msk}\n")
    meta = {"IMG_000001": {"patch_centroid_x": 1.0, "patch_centroid_y": 2.0,
                           "patch_centroid_z": 3.0, "camera": "UCE",
                           "date": "2019-01-02", "time": "9h05"}}
    mjson = tmp_path / "flair_aerial_metadata.json"
    mjson.write_text(json.dumps(meta))
    cfg = {"paths": {"train_csv": str(csv), "path_metadata_aerial": str(mjson)},
           "use_metadata": True}
    d = gather_paths(cfg, "train")
    assert d["IMG"] == [str(img)] and d["MSK"] == [str(msk)]
    assert len(d["MTD"]) == 1 and d["MTD"][0].shape == (45,)


def test_gather_paths_invalid_csv_exits(tmp_path):
    cfg = {"paths": {"train_csv": str(tmp_path / "missing.csv")},
           "use_metadata": False}
    with pytest.raises(ManifestError):
        gather_paths(cfg, "train")


def test_tools_convert_weights_cli(tmp_path):
    import sys

    sys.path.insert(0, "tests")
    import torch_ref

    from flairtpu.tools import main as tools_main
    from flairtpu.train.checkpoints import load_weights_msgpack

    m = torch_ref.ResNet34Unet(in_channels=5, classes=7)
    pth = tmp_path / "w.pth"
    torch.save(m.state_dict(), pth)
    out = tmp_path / "w.msgpack"
    tools_main(["convert-weights", str(pth), str(out)])
    v = load_weights_msgpack(out)
    assert v["params"]["segmentation_head"]["conv"]["kernel"].shape[-1] == 7


def test_write_prediction_non_georeferenced(tmp_path, rng):
    from flairtpu.io import TiffReader
    from flairtpu.io.tiff import write_array
    from flairtpu.predict.runner import write_prediction

    src = tmp_path / "IMG_1.tif"
    write_array(src, rng.integers(0, 255, (5, 16, 16)).astype(np.uint8))
    pred = rng.integers(0, 5, (16, 16)).astype(np.uint8)
    out = write_prediction(pred, str(src), tmp_path, georeferencing=False)
    assert out.name == "PRED_IMG_1.tif"
    with TiffReader(out) as r:
        assert r.crs is None
        np.testing.assert_array_equal(r.read(1), pred)


def test_tee_logger(tmp_path, capsys):
    from flairtpu.utils.logger import tee_stdout, untee_stdout

    log = tmp_path / "t.log"
    tee_stdout(str(log))
    print("hello tee")
    untee_stdout()
    assert "hello tee" in log.read_text()
