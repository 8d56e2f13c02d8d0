"""Persistent XLA compilation cache for the CLIs and benchmarks.

The reference pays model-construction cost once per process and nothing
more (torch eager); the JAX equivalent pays an XLA compile per program
shape, which on the tunneled TPU backend routes through a remote compile
helper at 20-40 s per program. Enabling JAX's persistent compilation cache
(keyed by HLO hash, so any config/shape change misses safely) makes every
repeat CLI invocation — re-running `flair-detect` on a new zone, compare
sweeps across processes, department batch reruns — skip straight to
execution.

Opt out with FLAIRTPU_NO_COMPILE_CACHE=1; relocate with
FLAIRTPU_COMPILE_CACHE=<dir> (default ~/.cache/flairtpu/xla).
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = Path.home() / ".cache" / "flairtpu" / "xla"


def enable_compile_cache(cache_dir: str | os.PathLike | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a writable directory.

    Must run before the first compilation (call it at CLI entry). Returns
    the cache directory actually used, or None when disabled (opt-out env
    var, or an unwritable location).
    """
    if os.environ.get("FLAIRTPU_NO_COMPILE_CACHE"):
        return None
    path = Path(cache_dir or os.environ.get("FLAIRTPU_COMPILE_CACHE") or _DEFAULT)
    try:
        path.mkdir(parents=True, exist_ok=True)
    except OSError:
        return None

    import jax

    jax.config.update("jax_compilation_cache_dir", str(path))
    return str(path)
