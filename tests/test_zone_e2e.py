"""End-to-end flair-detect pipeline tests on a synthetic zone (CPU)."""

import json
from pathlib import Path

import numpy as np
import pytest

from flairtpu import config as cfgmod
from flairtpu.io import TiffReader
from flairtpu.io.tiff import Affine, write_array
from flairtpu.models.factory import create_model, init_model
from flairtpu.train.checkpoints import save_weights_msgpack

N_CLASSES = 4
SIZE = 32  # img_pixels_detection
MARGIN = 8
ZONE_W, ZONE_H = 90, 70


@pytest.fixture(scope="module")
def zone_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("zone")
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, size=(5, ZONE_H, ZONE_W)).astype(np.uint8)
    tr = Affine.from_origin(700000.0, 6600000.0, 0.2, 0.2)
    zone_dir = tmp / "D099_2021" / "Z1_AA"
    zone_dir.mkdir(parents=True)
    img_path = zone_dir / "zone_irc.tif"
    write_array(img_path, img, transform=tr, crs=2154, blockxsize=64, blockysize=64)
    truth = rng.integers(1, N_CLASSES + 1, size=(ZONE_H, ZONE_W)).astype(np.uint8)
    truth_dir = tmp / "truth" / "D099_2021" / "Z1_AA"
    truth_dir.mkdir(parents=True)
    truth_path = truth_dir / "truth.tif"
    write_array(truth_path, truth, transform=tr, crs=2154)

    model = create_model({
        "model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {"encoder_decoder": "resnet18_unet"},
        },
        "n_classes": N_CLASSES, "channels": [1, 2, 3, 4, 5],
    })
    params, stats = init_model(model, (1, SIZE, SIZE, 5), seed=7)
    weights_path = tmp / "weights.msgpack"
    save_weights_msgpack(weights_path, params, stats)

    def make_config(**over):
        cfg = {
            "output_path": str(tmp / "out"),
            "output_name": "zone_irc-ARGMAX-S",
            "input_img_path": str(img_path),
            "truth_path": str(truth_path),
            "channels": [1, 2, 3, 4, 5],
            "img_pixels_detection": SIZE,
            "margin": MARGIN,
            "output_type": "argmax",
            "n_classes": N_CLASSES,
            "model_weights": str(weights_path),
            "model_framework": {
                "model_provider": "SegmentationModelsPytorch",
                "SegmentationModelsPytorch": {"encoder_decoder": "resnet18_unet"},
            },
            "batch_size": 4,
            "use_gpu": False,
            "num_worker": 2,
            "write_dataframe": False,
            "norma_task": [{"norm_type": "scaling", "norm_means": [], "norm_stds": []}],
            "classes": {i + 1: [1, f"class_{i}"] for i in range(N_CLASSES)},
        }
        cfg.update(over)
        return cfg

    return tmp, make_config, img, truth


def _run(cfg):
    from flairtpu.zone.engine import run_pipeline

    run_pipeline(cfg)


def test_default_pipeline_argmax(zone_setup):
    tmp, make_config, img, _ = zone_setup
    cfg = cfgmod.validate_detect_config(make_config(metrics=False, compare=False))
    _run(cfg)
    out = Path(cfg["output_path"]) / "zone_irc-ARGMAX-S.tif"
    assert out.exists()
    with TiffReader(out) as r:
        assert (r.width, r.height) == (ZONE_W, ZONE_H)
        assert r.count == 2
        assert r.crs == 2154
        cls = r.read(1)
        prob = r.read(2)
    assert cls.max() < N_CLASSES
    assert prob.max() > 0  # confidence band is populated (ref bug #4 fixed)
    # every pixel written (untouched pixels would be 0-prob)
    assert (prob > 0).all()


def test_batch_size_invariance(zone_setup):
    """The stitched raster must not depend on batching (pure pipeline)."""
    tmp, make_config, _, _ = zone_setup
    outs = []
    for bs, name in ((2, "bs2"), (5, "bs5")):
        cfg = cfgmod.validate_detect_config(make_config(
            metrics=False, compare=False, batch_size=bs,
            output_path=str(tmp / f"out_{name}")))
        _run(cfg)
        with TiffReader(Path(cfg["output_path"]) / "zone_irc-ARGMAX-S.tif") as r:
            outs.append(r.read())
    np.testing.assert_array_equal(outs[0], outs[1])


def test_small_zone_single_tile(zone_setup):
    """Zone smaller than the patch: boundless reads + clipped inner regions."""
    tmp, make_config, _, _ = zone_setup
    rng = np.random.default_rng(6)
    small = rng.integers(0, 255, size=(5, 20, 24)).astype(np.uint8)
    small_path = tmp / "small.tif"
    write_array(small_path, small, transform=Affine.from_origin(0, 100, 0.2, 0.2),
                crs=2154)
    cfg = cfgmod.validate_detect_config(make_config(
        metrics=False, compare=False, input_img_path=str(small_path),
        output_name="small-ARGMAX-S", output_path=str(tmp / "out_small")))
    _run(cfg)
    with TiffReader(Path(cfg["output_path"]) / "small-ARGMAX-S.tif") as r:
        assert (r.width, r.height) == (24, 20)
        assert (r.read(2) > 0).all()


def test_device_and_streaming_paths_agree(zone_setup, monkeypatch):
    """The device-resident fused path must reproduce the streaming engine."""
    tmp, make_config, _, _ = zone_setup
    outs = {}
    for mode in ("device", "streaming"):
        if mode == "streaming":
            monkeypatch.setenv("FLAIRTPU_STREAMING_ZONE", "1")
        else:
            monkeypatch.delenv("FLAIRTPU_STREAMING_ZONE", raising=False)
        cfg = cfgmod.validate_detect_config(make_config(
            metrics=False, compare=False,
            output_path=str(tmp / f"out_path_{mode}")))
        _run(cfg)
        with TiffReader(Path(cfg["output_path"]) / "zone_irc-ARGMAX-S.tif") as r:
            outs[mode] = r.read()
    cls_equal = (outs["device"][0] == outs["streaming"][0]).mean()
    assert cls_equal > 0.999, f"class plane mismatch: {cls_equal:.4f}"
    prob_diff = np.abs(outs["device"][1].astype(int) - outs["streaming"][1].astype(int))
    assert prob_diff.max() <= 1


def test_sharded_cli_path_matches_single_device(zone_setup, monkeypatch):
    """FLAIRTPU_ZONE_SHARD=1 routes run_pipeline through the mesh-sharded
    device programs (the multi-chip production path, auto-on for accelerator
    backends); the written raster must match the single-device run
    bit-exactly for exact-clipping."""
    tmp, make_config, _, _ = zone_setup
    outs = {}
    for mode in ("sharded", "single"):
        monkeypatch.setenv("FLAIRTPU_ZONE_SHARD",
                           "1" if mode == "sharded" else "0")
        cfg = cfgmod.validate_detect_config(make_config(
            metrics=False, compare=False,
            output_path=str(tmp / f"out_shard_{mode}")))
        _run(cfg)
        with TiffReader(Path(cfg["output_path"]) / "zone_irc-ARGMAX-S.tif") as r:
            outs[mode] = r.read()
    monkeypatch.delenv("FLAIRTPU_ZONE_SHARD", raising=False)
    np.testing.assert_array_equal(outs["sharded"], outs["single"])


def test_class_prob_output(zone_setup):
    """output_type=class_prob -> n_classes uint8 probability bands."""
    tmp, make_config, _, _ = zone_setup
    cfg = cfgmod.validate_detect_config(make_config(
        metrics=False, compare=False, output_type="class_prob",
        output_path=str(tmp / "out_classprob")))
    _run(cfg)
    with TiffReader(Path(cfg["output_path"]) / "zone_irc-ARGMAX-S.tif") as r:
        assert r.count == N_CLASSES
        probs = r.read().astype(np.int64)
    sums = probs.sum(axis=0)
    # probabilities scaled by 255: per-pixel sums land near 255 (rounding)
    assert abs(int(np.median(sums)) - 255) <= N_CLASSES
    assert probs.max() <= 255 and probs.min() >= 0


def test_class_prob_device_and_streaming_agree(zone_setup, monkeypatch):
    """class_prob is forced to exact clipping on BOTH zone paths (reference
    compare.py:68); the device program must be bit-identical to the streaming
    ExactClipStitcher."""
    tmp, make_config, _, _ = zone_setup
    outs = {}
    for mode in ("device", "streaming"):
        if mode == "streaming":
            monkeypatch.setenv("FLAIRTPU_STREAMING_ZONE", "1")
        else:
            monkeypatch.delenv("FLAIRTPU_STREAMING_ZONE", raising=False)
        cfg = cfgmod.validate_detect_config(make_config(
            metrics=False, compare=False, output_type="class_prob",
            output_path=str(tmp / f"out_cp_{mode}")))
        _run(cfg)
        with TiffReader(Path(cfg["output_path"]) / "zone_irc-ARGMAX-S.tif") as r:
            outs[mode] = r.read()
    np.testing.assert_array_equal(outs["device"], outs["streaming"])


@pytest.mark.parametrize("method", ["average", "max"])
def test_class_prob_forces_exact_clipping(zone_setup, method):
    """Any stitch method + class_prob produces the exact-clipping output."""
    from flairtpu.zone.engine import ZoneEngine, prepare_model, run_single, setup_out_path

    tmp, make_config, _, _ = zone_setup
    outs = {}
    for m in (method, "exact-clipping"):
        cfg = cfgmod.validate_detect_config(make_config(
            metrics=False, compare=False, output_type="class_prob",
            output_path=str(tmp / f"out_force_{method}_{m}")))
        cfg = setup_out_path(cfg)
        model, params, stats = prepare_model(cfg)
        engine = ZoneEngine(cfg, model, params, stats)
        path, _, _ = run_single(cfg, engine, SIZE - 2 * MARGIN, m)
        with TiffReader(path) as r:
            outs[m] = r.read()
    np.testing.assert_array_equal(outs[method], outs["exact-clipping"])


def test_compare_sweep_with_metrics(zone_setup):
    tmp, make_config, _, _ = zone_setup
    cfg = make_config(
        metrics=True, compare=True, batch_mode=False,
        output_path=str(tmp / "out_cmp"),
        strategies={
            "tiling": {"enabled": True, "size_range": [32], "stride_range": [0.5]},
            "stitching": {"enabled": True, "methods": ["exact-clipping", "average",
                                                       "average_weights", "max"],
                          "margin": [0.25]},
            "padding_overall": None,
        },
        overlap_strat=True,
    )
    cfg = cfgmod.validate_detect_config(cfg)
    _run(cfg)
    out_root = Path(cfg["output_path"])
    stamped = [p for p in out_root.iterdir() if p.is_dir()]
    assert len(stamped) == 1
    tifs = sorted(stamped[0].glob("*.tif"))
    assert len(tifs) == 4  # one per stitching method
    names = {t.name for t in tifs}
    assert any("stitching=average_weights" in n for n in names)
    mfiles = list(stamped[0].glob("metrics_per-patch_*.json"))
    assert len(mfiles) == 1
    recs = json.loads(mfiles[0].read_text())
    assert recs and all(len(r) == 1 for r in recs)
    key, val = next(iter(recs[0].items()))
    assert "Avg_metrics" in val and len(val["classes"]) == N_CLASSES

    # overlap-average must agree with exact-clipping where overlap count == 1?
    # (not guaranteed at borders; instead sanity-check all rasters fully written)
    for t in tifs:
        with TiffReader(t) as r:
            assert (r.read(2) > 0).all()


def test_tiny_zone_smaller_than_inner_patch(zone_setup):
    """Zone smaller than size-2*margin: tail padding must keep gathers valid."""
    tmp, make_config, _, _ = zone_setup
    rng = np.random.default_rng(9)
    tiny = rng.integers(0, 255, size=(5, 10, 12)).astype(np.uint8)
    p = tmp / "tiny.tif"
    from flairtpu.io.tiff import Affine, write_array

    write_array(p, tiny, transform=Affine.from_origin(0, 50, 0.2, 0.2), crs=2154)
    cfg = cfgmod.validate_detect_config(make_config(
        metrics=False, compare=False, input_img_path=str(p),
        output_name="tiny-ARGMAX-S", output_path=str(tmp / "out_tiny")))
    _run(cfg)
    with TiffReader(Path(cfg["output_path"]) / "tiny-ARGMAX-S.tif") as r:
        assert (r.width, r.height) == (12, 10)
        assert (r.read(2) > 0).all()


def test_streaming_zero_patch_fallback(zone_setup, monkeypatch, capsys):
    """A failing tile read degrades to a zero patch, not a crash
    (reference dataset.py:115-122 semantics)."""
    tmp, make_config, _, _ = zone_setup
    monkeypatch.setenv("FLAIRTPU_STREAMING_ZONE", "1")
    from flairtpu.io import TiffReader as TR

    real_read = TR.read
    calls = {"n": 0}

    def flaky_read(self, *a, **k):
        calls["n"] += 1
        if calls["n"] == 3 and k.get("boundless"):  # fail one tile read
            raise OSError("synthetic decode failure")
        return real_read(self, *a, **k)

    monkeypatch.setattr(TR, "read", flaky_read)
    cfg = cfgmod.validate_detect_config(make_config(
        metrics=False, compare=False, output_path=str(tmp / "out_flaky")))
    _run(cfg)
    monkeypatch.setattr(TR, "read", real_read)
    out = Path(cfg["output_path"]) / "zone_irc-ARGMAX-S.tif"
    with TiffReader(out) as r:
        assert (r.read(2) > 0).all()  # pipeline completed, every pixel written


def test_output_overviews_option(zone_setup):
    """output_overviews: [2] adds a chained reduced-resolution IFD (COG)."""
    tmp, make_config, _, _ = zone_setup
    cfg = cfgmod.validate_detect_config(make_config(
        metrics=False, compare=False, output_overviews=[2],
        output_path=str(tmp / "out_ov")))
    _run(cfg)
    out = Path(cfg["output_path"]) / "zone_irc-ARGMAX-S.tif"
    with TiffReader(out) as r:
        assert len(r.overview_offsets) == 1
        base = r.read(1)
    with TiffReader(out, ifd_index=1) as r1:
        assert (r1.width, r1.height) == (ZONE_W // 2, ZONE_H // 2)
        np.testing.assert_array_equal(r1.read(1), base[::2, ::2])


def test_staged_zone_cache_reuse_and_invalidation(zone_setup, monkeypatch):
    """run_single stages the zone once per input path: reused for repeat
    passes over the same raster (compare sweeps), dropped on path change;
    repeated runs produce identical rasters."""
    import flairtpu.zone.engine as zmod
    from flairtpu.zone.engine import (ZoneEngine, prepare_model, run_single,
                                      setup_out_path)

    tmp, make_config, _, _ = zone_setup
    cfg = cfgmod.validate_detect_config(make_config(
        metrics=False, compare=False,
        output_path=str(tmp / "out_staged")))
    zone_path = Path(cfg["input_img_path"])
    cfg = setup_out_path(cfg)
    model, params, stats = prepare_model(cfg)
    engine = ZoneEngine(cfg, model, params, stats)

    calls = []
    real_stage = zmod.stage_zone

    def counting_stage(config, img_path=None):
        calls.append(str(img_path or config["input_img_path"]))
        return real_stage(config, img_path)

    monkeypatch.setattr(zmod, "stage_zone", counting_stage)

    p1, _, _ = run_single(cfg, engine, SIZE - 2 * MARGIN, "exact-clipping")
    p2, _, _ = run_single(cfg, engine, SIZE - 2 * MARGIN, "average",
                          identifier="b")
    assert len(calls) == 1  # second pass reused the staged upload

    # a different input path invalidates the cache
    other = Path(str(zone_path) + ".copy.tif")
    import shutil

    shutil.copyfile(zone_path, other)
    cfg2 = dict(cfg, input_img_path=str(other))
    run_single(cfg2, engine, SIZE - 2 * MARGIN, "exact-clipping",
               identifier="c")
    assert len(calls) == 2 and calls[-1] == str(other)

    with TiffReader(p1) as r1:
        a = r1.read(1)
    cfg3 = dict(cfg, output_path=str(tmp / "out_staged2"))
    cfg3 = setup_out_path(cfg3)
    engine._staged_zone = None
    p3, _, _ = run_single(cfg3, engine, SIZE - 2 * MARGIN, "exact-clipping")
    with TiffReader(p3) as r3:
        np.testing.assert_array_equal(a, r3.read(1))
