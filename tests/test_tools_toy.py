"""The tools.py quickstart generators produce runnable artifacts.

make-toy-dataset / make-toy-zone replace the reference's downloadable toy set
(reference README:148) in a no-egress environment; the generated YAMLs must
pass the same config validation the CLIs run, and the weights must strict-load
into the configured model.
"""

from __future__ import annotations

import numpy as np
import pytest
import yaml

from flairtpu import config as cfgmod
from flairtpu.io import TiffReader
from flairtpu.tools import main as tools_main


@pytest.mark.slow  # resnet34 init dominates (~100s CPU)
def test_make_toy_zone_artifacts(tmp_path):
    root = tmp_path / "tz"
    tools_main(["make-toy-zone", "--root", str(root), "--zone", "640",
                "--classes", "4", "--channels", "3"])

    with TiffReader(root / "toy-zone.tif") as r:
        assert (r.width, r.height, r.count) == (640, 640, 3)
        assert r.crs == 2154
    with TiffReader(root / "toy-zone-truth.tif") as r:
        truth = r.read([1])
        assert truth.min() >= 1 and truth.max() <= 4  # 1-based classes

    detect = cfgmod.read_config(root / "toy-config-detect.yaml")
    detect = cfgmod.validate_detect_config(detect)
    assert detect["n_classes"] == 4

    compare = yaml.safe_load((root / "toy-config-detect-compare.yaml").read_text())
    compare = cfgmod.validate_detect_config(compare)
    combos = cfgmod.gen_param_combination(compare)
    assert {c["stitching"] for c in combos} == {"average", "exact-clipping"}

    # weights strict-load into the configured model
    from flairtpu.models.factory import create_model, init_model
    from flairtpu.train.checkpoints import load_pretrained

    model = create_model(detect)
    params, stats = init_model(model, (1, 64, 64, 3))
    variables = load_pretrained(root / "toy-weights.msgpack",
                                {"params": params, "batch_stats": stats})
    got = variables["params"]
    leaves_a = jax_leaves_shapes(got)
    leaves_b = jax_leaves_shapes(params)
    assert leaves_a == leaves_b


def jax_leaves_shapes(tree):
    import jax

    return [np.shape(x) for x in jax.tree_util.tree_leaves(tree)]


def test_make_toy_dataset_config_validates(tmp_path):
    root = tmp_path / "td"
    tools_main(["make-toy-dataset", "--root", str(root), "--size", "32",
                "--classes", "4", "--channels", "3",
                "--train", "2", "--val", "1", "--test", "1"])
    cfg = cfgmod.read_config(root / "toy-config.yaml")
    cfg = cfgmod.validate_train_config(cfg)
    assert len(cfg["classes"]) == 4
