"""Scalar logging: TensorBoard (same tags as the reference) + JSONL fallback.

Tag names match the reference so dashboards transfer unchanged: train_loss,
val_loss, val_miou, val_iou_<class_name> with weight-0 classes skipped
(reference task_module.py:88-154, tasks.py:73-76).
"""

from __future__ import annotations

import json
from pathlib import Path


class MetricsLogger:
    def __init__(self, out_dir: str | Path, name: str = "flair-tpu"):
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.out_dir / "metrics.jsonl", "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=str(self.out_dir / "tensorboard" / name))
        except Exception:
            pass

    def log(self, step: int, scalars: dict[str, float]) -> None:
        rec = {"step": step, **{k: float(v) for k, v in scalars.items()}}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
