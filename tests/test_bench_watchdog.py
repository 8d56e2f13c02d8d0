"""The bench watchdog's JSON contract survives tunnel hangs.

bench.py forks a watchdog (GIL-holding native stalls defeat in-process
SIGALRM) that must always emit the one-line JSON the driver parses. When a
LATE bench stage hangs (e.g. the train-step measurement after the zone pass
succeeded), the line must carry the measured-so-far numbers, not zeros.
"""

from __future__ import annotations

import json
import subprocess
import sys
import textwrap
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)


def _run(code: str) -> dict:
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=60, cwd=REPO)
    out = p.stdout.strip().splitlines()[-1]
    return json.loads(out)


def test_watchdog_emits_partial_results_on_late_hang():
    line = _run(textwrap.dedent("""
        import time
        import bench
        bench._watchdog(2)
        bench._stash_partial({"metric": "zone ...", "value": 86.7,
                              "unit": "patches/sec", "vs_baseline": 1.58,
                              "compute_patches_per_sec": 1540.0})
        time.sleep(50)
    """))
    assert line["value"] == 86.7
    assert line["compute_patches_per_sec"] == 1540.0
    assert "TIMEOUT" in line["metric"]


def test_watchdog_emits_zero_line_without_partials():
    line = _run("import bench, time; bench._watchdog(2); time.sleep(50)")
    assert line["value"] == 0.0
    assert line["vs_baseline"] == 0.0
    assert "TIMEOUT" in line["metric"]
