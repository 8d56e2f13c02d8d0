"""Multi-host (DCN) training: 2 jax.distributed processes over the CPU backend.

The TPU-native answer to the reference's Lightning `num_nodes`/`strategy=ddp`
knobs (src/flair/tasks.py:83-93, configs/flair-1-config.yaml:81-85): spawns 2
OS processes, each with 4 virtual CPU devices, forming one 8-device global
mesh via jax.distributed; runs a real SPMD train step with process-sharded
data loading and a multi-process Orbax checkpoint save/restore.
"""

import socket
import subprocess
import sys
from pathlib import Path


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_step_and_checkpoint(tmp_path):
    worker = Path(__file__).parent / "multihost_worker.py"
    port = _free_port()
    out_dir = tmp_path / "mh_ckpt"
    out_dir.mkdir()
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), str(pid), str(out_dir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outputs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    for pid, out in enumerate(outputs):
        assert f"[worker {pid}] ALL OK" in out, out
        assert "OK distributed: 8 global devices" in out
        assert "OK train step" in out
        assert "OK checkpoint round-trip" in out
    # the two processes read DISJOINT halves of the epoch
    ids = [sorted(line.split(": ", 1)[1] for line in out.splitlines()
                  if "OK loader shard" in line) for out in outputs]
    assert ids[0] != ids[1]
    # rank-0 gating: the checkpoint exists exactly once on disk
    assert any(out_dir.iterdir())
