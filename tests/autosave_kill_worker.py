"""Subprocess worker: run fit() with step autosave, hard-kill mid-training.

Launched by tests/test_autosave.py. Simulates a TPU-pod preemption: after the
Nth jitted train step completes, the process exits with os._exit (no cleanup,
no atexit, nothing flushed) — the autosave snapshots on disk are all a
resuming process gets.

Usage: python autosave_kill_worker.py <config.json> <kill_after_steps>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from pathlib import Path

from flairtpu import config as cfgmod
from flairtpu.data.manifest import gather_paths
from flairtpu.train import loop as loop_mod

cfg = cfgmod.validate_train_config(json.loads(Path(sys.argv[1]).read_text()))
kill_after = int(sys.argv[2])

orig_train_step = loop_mod.SegmentationTrainer.train_step


def wrapped_train_step(self):
    step = orig_train_step(self)
    calls = {"n": 0}

    def counting(*args, **kwargs):
        out = step(*args, **kwargs)
        calls["n"] += 1
        if calls["n"] >= kill_after:
            jax.block_until_ready(out[0])
            print(f"[worker] hard-killing after step {calls['n']}", flush=True)
            os._exit(7)  # preemption: no cleanup of any kind
        return out

    return counting


loop_mod.SegmentationTrainer.train_step = wrapped_train_step

dict_train = gather_paths(cfg, "train")
dict_val = gather_paths(cfg, "val")
out_dir = Path(cfg["paths"]["out_folder"], cfg["paths"]["out_model_name"])
loop_mod.fit(cfg, dict_train, dict_val, out_dir)
print("[worker] fit completed without being killed", flush=True)
sys.exit(3)  # the test expects the kill to happen
