"""Checkpointing: best/last/resume + weights-only init with class surgery.

Reproduces the reference's three mechanisms (SURVEY.md §5.4):

1. best/last checkpoints during training, monitored metric + min/max mode
   (reference tasks.py:47-56) — Orbax directories named with the reference's
   ``ckpt-{epoch:02d}-{val_loss:.2f}_{name}`` pattern;
2. full resume (params + opt state + scheduler + epoch, tasks.py:96-101);
3. weights-only init from a .ckpt/.pth with class-count surgery: when the
   checkpoint's class count differs, mismatched segmentation-head tensors are
   zeroed and everything else loads (reference flair/main.py:106-138).

Native checkpoints are Orbax (async-capable, multi-host safe); torch artifacts
load through flairtpu.models.convert.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
import jax
import numpy as np
import orbax.checkpoint as ocp

from flairtpu.models import convert
from flairtpu.parallel.mesh import is_main_process


def _to_host(tree):
    """Fetch a state tree to host numpy — sharded/multi-host aware.

    ``np.asarray`` cannot fetch a jax.Array that spans non-addressable
    devices (parameters sharded over a process-spanning axis under
    ``param_sharding: fsdp|tensor``); those leaves are all-gathered across
    processes first. The gather is a collective: every process reaches
    ``_save`` on every epoch (fit() is SPMD), so the calls line up.
    """
    def fetch(x):
        # fully-replicated leaves fetch locally even on a multi-process mesh
        if isinstance(x, jax.Array) and not (
                x.is_fully_addressable or x.is_fully_replicated):
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    return jax.tree.map(fetch, tree)


class CheckpointManager:
    """Best/last checkpoint writer with the reference's naming + monitor rules."""

    def __init__(self, out_dir: str | Path, model_name: str = "model",
                 monitor: str = "val_loss", mode: str = "min",
                 save_last: bool = True, weights_only: bool = False):
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.model_name = model_name
        self.monitor = monitor
        self.mode = mode
        self.save_last = save_last
        self.weights_only = weights_only
        self.best_metric: float | None = None
        self.best_path: Path | None = None
        self._ckpt = ocp.StandardCheckpointer()

    def _is_better(self, value: float) -> bool:
        if self.best_metric is None:
            return True
        return value < self.best_metric if self.mode == "min" else value > self.best_metric

    def _save(self, path: Path, state: dict):
        if path.exists():
            shutil.rmtree(path)
        payload = dict(state)
        if self.weights_only:
            payload = {k: payload[k] for k in ("params", "batch_stats") if k in payload}
        self._ckpt.save(path.resolve(), _to_host(payload))
        self._ckpt.wait_until_finished()

    def on_epoch_end(self, epoch: int, metrics: dict[str, float], state: dict) -> bool:
        """Save best (and last); returns True if this epoch became the best."""
        value = float(metrics[self.monitor])
        is_best = self._is_better(value)
        if is_best:
            self.best_metric = value
            name = f"ckpt-{epoch:02d}-{value:.2f}_{self.model_name}"
            new_best = self.out_dir / name
            self._save(new_best, dict(state, epoch=epoch, **metrics))
            if self.best_path is not None and self.best_path.exists() \
                    and self.best_path != new_best:
                shutil.rmtree(self.best_path)  # save_top_k=1
            self.best_path = new_best
            (self.out_dir / "best").write_text(name)
        if self.save_last:
            self._save(self.out_dir / "last", dict(state, epoch=epoch, **metrics))
        return is_best

    def restore(self, path: str | Path, like: dict) -> dict:
        """Restore the keys named in ``like`` (extra saved keys are ignored).

        The restore target is assembled per top-level checkpoint key:
        ``like``'s subtree when it has one (preserving pytree structure —
        optax states round-trip as namedtuples, not dicts), a scalar
        placeholder otherwise. A checkpoint written under a per-class
        ``ckpt_monitor`` carries one more scalar (``val_iou_<name>``) than
        the caller's template, and Orbax's fully-target-matched restore
        rejects that structure mismatch.
        """
        path = Path(path).resolve()
        try:
            saved = self._ckpt.metadata(path).item_metadata.tree
        except Exception:  # older orbax layouts: assume the template's keys
            saved = dict(like)

        def placeholder(md):
            # zeros matching the checkpoint's own metadata, for saved keys
            # the caller didn't ask for (their values are discarded below)
            if isinstance(md, dict):
                return {k: placeholder(v) for k, v in md.items()}
            if isinstance(md, (list, tuple)):
                return [placeholder(v) for v in md]
            shape = getattr(md, "shape", None) or ()
            dtype = getattr(md, "dtype", None) or np.float64
            return np.zeros(shape, dtype)

        target = {k: like[k] if k in like else placeholder(v)
                  for k, v in saved.items()}
        raw = self._ckpt.restore(path, target=_to_host(target))
        return {k: raw.get(k, v) for k, v in like.items()}

    def restore_best(self, like: dict) -> dict:
        if self.best_path is None:
            marker = self.out_dir / "best"
            if marker.exists():
                self.best_path = self.out_dir / marker.read_text().strip()
        if self.best_path is None:
            raise FileNotFoundError(f"no best checkpoint under {self.out_dir}")
        return self.restore(self.best_path, like)


class StepAutosaver:
    """Preemption-safe STEP-level autosave + exact mid-epoch resume.

    TPU pods preempt; the reference resumes only at epoch granularity
    (ref tasks.py:96-101), losing up to an epoch of work. Every
    ``every_steps`` train steps the full mid-epoch state checkpoints:
    train state + the device-chained rng + the epoch's running loss/confmat
    accumulators (arrays, via Orbax) and the host-side controller states
    (epoch, step, plateau/early-stop/best-checkpoint/history — JSON).

    Crash safety: arrays commit to a FRESH Orbax slot first; ``host.json``
    then flips to the new slot atomically (temp file + rename); older slots
    are reaped last. A kill at any point leaves the previously-referenced
    snapshot complete and consistent.
    """

    def __init__(self, out_dir: str | Path, every_steps: int):
        self.dir = Path(out_dir) / "autosave"
        self.every = int(every_steps)
        self._ckpt = ocp.StandardCheckpointer()

    def due(self, step_in_epoch: int) -> bool:
        return self.every > 0 and (step_in_epoch + 1) % self.every == 0

    def save(self, arrays: dict, host: dict) -> None:
        self.dir.mkdir(parents=True, exist_ok=True)
        prev = sorted(self.dir.glob("arrays-*"))
        n = max((int(p.name.split("-")[1]) for p in prev), default=0) + 1
        slot = self.dir / f"arrays-{n:06d}"
        self._ckpt.save(slot.resolve(), _to_host(arrays))
        self._ckpt.wait_until_finished()
        if is_main_process():
            tmp = self.dir / "host.json.tmp"
            tmp.write_text(json.dumps({"slot": slot.name, **host}))
            tmp.replace(self.dir / "host.json")
        for p in prev:
            shutil.rmtree(p, ignore_errors=True)

    def restore(self, like_arrays: dict) -> tuple[dict, dict] | None:
        """Latest (arrays, host) snapshot, or None when no autosave exists."""
        meta = self.dir / "host.json"
        if not meta.exists():
            return None
        host = json.loads(meta.read_text())
        raw = self._ckpt.restore((self.dir / host["slot"]).resolve(),
                                 target=_to_host(like_arrays))
        return raw, host

    def clear(self) -> None:
        """Remove the autosave (training finished normally)."""
        if is_main_process():
            shutil.rmtree(self.dir, ignore_errors=True)


def save_weights_msgpack(path: str | Path, params, batch_stats) -> None:
    """Weights-only export (.msgpack) loadable by zone-detect."""
    from flax import serialization

    payload = {"params": _to_host(params), "batch_stats": _to_host(batch_stats)}
    Path(path).write_bytes(serialization.msgpack_serialize(payload))


def load_weights_msgpack(path: str | Path) -> dict:
    from flax import serialization

    return serialization.msgpack_restore(Path(path).read_bytes())


def load_pretrained(path: str | Path, reference_variables: dict,
                    strict: bool = True) -> dict:
    """Load torch (.pth/.ckpt) or native (.msgpack) weights as Flax variables."""
    p = str(path)
    if p.endswith((".pth", ".pt", ".ckpt")):
        return convert.load_checkpoint_variables(p, reference_variables, strict=strict)
    if p.endswith((".msgpack", ".flax")):
        variables = load_weights_msgpack(p)
        if strict:
            convert.validate_against(variables, reference_variables, strict=True)
        return variables
    raise ValueError(f"unsupported weights file {p!r} (.pth/.ckpt/.msgpack)")


def init_weights_with_surgery(path: str | Path, reference_variables: dict,
                              verbose: bool = True) -> dict:
    """Weights-only init tolerating a class-count mismatch.

    Mirrors reference flair/main.py:120-138: tensors whose shapes disagree with
    the model (the segmentation head when class counts differ) are replaced by
    zeros of the model's shape; all matching tensors load.
    """
    p = str(path)
    if Path(p).is_dir():  # native Orbax checkpoint (best/last dirs)
        raw = ocp.StandardCheckpointer().restore(Path(p).resolve())
        loaded = {k: raw[k] for k in ("params", "batch_stats") if k in raw}
    elif p.endswith((".pth", ".pt", ".ckpt")):
        loaded = convert.any_state_dict_to_flax(
            convert.normalize_keys(convert.load_torch_state_dict(p)))
    else:
        loaded = load_weights_msgpack(p)

    surgeries: list[str] = []

    def merge(ref, got, path=()):
        if not isinstance(ref, dict):
            if got is None or tuple(np.shape(got)) != tuple(np.shape(ref)):
                surgeries.append("/".join(path))
                return np.zeros_like(np.asarray(ref))
            return got
        return {k: merge(v, (got or {}).get(k), path + (k,)) for k, v in ref.items()}

    out = {
        coll: merge(reference_variables.get(coll, {}), loaded.get(coll, {}), (coll,))
        for coll in ("params", "batch_stats")
    }
    if verbose and surgeries:
        print("[ckpt surgery] zero-initialized (shape mismatch or missing):")
        for s in surgeries:
            print(f"    - {s}")
    return out


def write_history(out_dir: str | Path, history: list[dict]) -> None:
    Path(out_dir, "history.json").write_text(json.dumps(history, indent=2))
