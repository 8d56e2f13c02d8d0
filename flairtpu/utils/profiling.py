"""Profiler integration (SURVEY.md §5.1 rebuild note).

The reference only wall-clocks stages (flair/main.py:164-181, per-patch ms in
compare mode). Here: `jax.profiler` trace capture around any stage, gated by
config or FLAIRTPU_PROFILE_DIR, viewable in TensorBoard/Perfetto; plus a tiny
step timer for per-stage wall time.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager
from pathlib import Path


@contextmanager
def maybe_trace(tag: str, out_dir: str | os.PathLike | None = None):
    """Capture a device trace for the enclosed block if profiling is enabled."""
    target = out_dir or os.environ.get("FLAIRTPU_PROFILE_DIR")
    if not target:
        yield
        return
    import jax

    path = Path(target) / tag
    path.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(path))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"    [profiler] trace for {tag!r} written to {path}")


class StageTimer:
    """Accumulates wall-clock per named stage; prints a summary table."""

    def __init__(self):
        self.totals: dict[str, float] = {}

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0

    def summary(self) -> str:
        total = sum(self.totals.values()) or 1.0
        lines = [f"    {'stage':<24} {'seconds':>10} {'share':>7}"]
        for name, secs in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(f"    {name:<24} {secs:>10.2f} {secs / total:>6.1%}")
        return "\n".join(lines)
