"""Preemption-safe training: step-level autosave + exact mid-epoch resume.

The reference resumes at epoch granularity only (ref tasks.py:96-101); TPU
pods preempt, so flairtpu adds `autosave_every_steps` (train/checkpoints.py
StepAutosaver). Enforcement here is the real thing: a subprocess training run
is HARD-KILLED (os._exit) mid-epoch between autosaves, resumed in-process,
and the resumed run's final weights must be bit-identical to an uninterrupted
run of the same config — proving the snapshot captures the complete training
stream state (params/BN/optimizer/rng/loader position/accumulators).
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import jax
import pytest

from flairtpu import config as cfgmod
from flairtpu.data.manifest import gather_paths
from flairtpu.train.loop import fit
from tests.synth import toy_train_config


def _leaves(tree) -> list[np.ndarray]:
    return [np.asarray(x) for x in jax.tree.leaves(tree)]


def _cfg(tmp_path: Path, sub: str, **over) -> dict:
    cfg = toy_train_config(tmp_path, num_epochs=3, **over)
    cfg["paths"]["out_folder"] = str(tmp_path / sub)
    return cfgmod.validate_train_config(cfg)


@pytest.mark.slow
def test_kill_and_resume_is_bit_exact(tmp_path):
    # toy data: 8 train images, batch 2, drop_last -> 4 steps/epoch; saves at
    # steps 2 and 4 of each epoch; the worker is killed during epoch-2 step 3
    # (global step 7), one step past the epoch-1 step-2 snapshot
    over = dict(autosave_every_steps=2)

    # uninterrupted reference run (autosave observers don't change the
    # training stream, but run it OFF to prove that too)
    cfg_a = _cfg(tmp_path, "run_a", autosave_every_steps=0)
    out_a = Path(cfg_a["paths"]["out_folder"], "toy-model")
    trainer_a, info_a = fit(cfg_a, gather_paths(cfg_a, "train"),
                            gather_paths(cfg_a, "val"), out_a)

    # killed run: subprocess hard-exits after the 7th train step
    cfg_b = _cfg(tmp_path, "run_b", **over)
    cfg_path = tmp_path / "cfg_b.json"
    cfg_path.write_text(json.dumps(cfg_b))
    worker = Path(__file__).parent / "autosave_kill_worker.py"
    proc = subprocess.run(
        [sys.executable, str(worker), str(cfg_path), "7"],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 7, (proc.stdout, proc.stderr)

    out_b = Path(cfg_b["paths"]["out_folder"], "toy-model")
    autosave = out_b / "autosave"
    assert (autosave / "host.json").exists()
    host = json.loads((autosave / "host.json").read_text())
    assert (host["epoch"], host["step"]) == (1, 2)  # epoch-2 step-2 snapshot

    # resume in-process: must continue from epoch 2 step 2 and finish
    logs: list[str] = []
    trainer_b, info_b = fit(cfg_b, gather_paths(cfg_b, "train"),
                            gather_paths(cfg_b, "val"), out_b,
                            progress=logs.append)
    assert any("autosave resume: epoch 2 step 2" in l for l in logs), logs

    # bit-exact equivalence with the uninterrupted run
    for a, b in zip(_leaves(trainer_a.params), _leaves(trainer_b.params)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(_leaves(trainer_a.batch_stats),
                    _leaves(trainer_b.batch_stats)):
        np.testing.assert_array_equal(a, b)
    ha = [{k: v for k, v in h.items()} for h in info_a["history"]]
    hb = [{k: v for k, v in h.items()} for h in info_b["history"]]
    assert [h["epoch"] for h in hb] == [0, 1, 2]
    for a, b in zip(ha, hb):
        for k in ("val_loss", "val_miou", "train_miou"):
            assert a[k] == pytest.approx(b[k], rel=1e-6), (k, a, b)
    # train_loss sums the same per-step losses in a different grouping
    for a, b in zip(ha, hb):
        assert a["train_loss"] == pytest.approx(b["train_loss"], rel=1e-5)

    # normal completion clears the autosave
    assert not autosave.exists()


def test_epoch_iter_deterministic_and_skips(tmp_path):
    from flairtpu.data.patches import PatchDataset, PatchLoader
    from tests.synth import make_dataset, write_csv

    imgs, msks = make_dataset(tmp_path / "d", 10, size=16, seed=4)
    ds = PatchDataset({"IMG": imgs, "MSK": msks}, [1, 2, 3, 4, 5])
    loader = PatchLoader(ds, batch_size=2, shuffle=True, seed=5,
                         drop_last=True, num_workers=2)
    plain = [b["id"] for b in loader]            # epoch 0 via __iter__
    again = [b["id"] for b in loader.epoch_iter(0)]
    assert plain == again
    tail = [b["id"] for b in loader.epoch_iter(0, start_batch=3)]
    assert tail == plain[3:]
    # a different epoch shuffles differently
    other = [b["id"] for b in loader.epoch_iter(1)]
    assert other != plain
    # epoch_iter does not advance the loader's own counter (epoch 1 next)
    assert [b["id"] for b in loader] == other


def test_grain_epoch_iter_skips(tmp_path):
    from flairtpu.data.grain_loader import GrainPatchLoader
    from flairtpu.data.patches import PatchDataset
    from tests.synth import make_dataset

    imgs, msks = make_dataset(tmp_path / "d", 8, size=16, seed=4)
    ds = PatchDataset({"IMG": imgs, "MSK": msks}, [1, 2, 3, 4, 5])
    loader = GrainPatchLoader(ds, batch_size=2, shuffle=True, seed=5,
                              drop_last=True, num_workers=0)
    plain = [b["id"] for b in loader.epoch_iter(0)]
    tail = [b["id"] for b in loader.epoch_iter(0, start_batch=2)]
    assert tail == plain[2:]


def test_autosave_config_validation(tmp_path):
    cfg = toy_train_config(tmp_path, autosave_every_steps="two")
    with pytest.raises(cfgmod.ConfigError, match="autosave_every_steps"):
        cfgmod.validate_train_config(cfg)
