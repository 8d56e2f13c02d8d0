"""On-device confusion matrix + IoU-family metrics.

Replaces the reference's two metric engines — torchmetrics
MulticlassJaccardIndex during training (task_module.py:31-59) and per-patch
sklearn confusion matrices post-hoc (flair/metrics.py:60-84) — with a single
confusion-matrix accumulator computed on device and psum-reduced across the
mesh. All derived metrics (IoU, OA, precision, recall, F-score, weighted mIoU)
are pure functions of the summed matrix, so train-time and post-hoc numbers
agree by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(preds: jax.Array, targets: jax.Array, num_classes: int,
                     dtype=jnp.int32) -> jax.Array:
    """(K, K) counts with rows=target, cols=pred (sklearn convention).

    Targets outside [0, num_classes) are ignored, matching
    sklearn.confusion_matrix(labels=range(K)) dropping unlisted values.
    """
    t = targets.reshape(-1)
    p = preds.reshape(-1)
    valid = (t >= 0) & (t < num_classes) & (p >= 0) & (p < num_classes)
    idx = jnp.where(valid, t * num_classes + p, num_classes * num_classes)
    counts = jnp.zeros((num_classes * num_classes + 1,), dtype)
    counts = counts.at[idx].add(1)
    return counts[:-1].reshape(num_classes, num_classes)


# --- derived metrics (host or device; fp64 on host for exact parity) --------

def class_iou(cm: np.ndarray) -> tuple[np.ndarray, float]:
    """Per-class IoU in % + mean (reference flair/metrics.py:14-21)."""
    cm = np.asarray(cm, np.float64)
    denom = cm.sum(axis=1) + cm.sum(axis=0) - np.diag(cm)
    with np.errstate(divide="ignore", invalid="ignore"):
        ious = 100.0 * np.diag(cm) / denom
    ious = np.nan_to_num(ious)
    return ious, float(ious.mean())


def overall_accuracy(cm: np.ndarray) -> float:
    cm = np.asarray(cm, np.float64)
    return float(100.0 * np.trace(cm) / cm.sum()) if cm.sum() else 0.0


def class_precision(cm: np.ndarray) -> tuple[np.ndarray, float]:
    cm = np.asarray(cm, np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        p = 100.0 * np.diag(cm) / cm.sum(axis=0)
    p = np.nan_to_num(p)
    return p, float(p.mean())


def class_recall(cm: np.ndarray) -> tuple[np.ndarray, float]:
    cm = np.asarray(cm, np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        r = 100.0 * np.diag(cm) / cm.sum(axis=1)
    r = np.nan_to_num(r)
    return r, float(r.mean())


def class_fscore(precision: np.ndarray, recall: np.ndarray) -> tuple[np.ndarray, float]:
    with np.errstate(divide="ignore", invalid="ignore"):
        f = 2 * precision * recall / (precision + recall)
    f = np.nan_to_num(f)
    return f, float(f.mean())


def drop_zero_weight_classes(cm: np.ndarray, weights) -> np.ndarray:
    """Remove rows+cols of weight-0 classes (reference flair/metrics.py:76-84)."""
    unused = np.where(np.asarray(weights) == 0)[0]
    cm = np.delete(np.asarray(cm), unused, axis=0)
    return np.delete(cm, unused, axis=1)


def weighted_jaccard(cm) -> jax.Array:
    """torchmetrics MulticlassJaccardIndex(average='weighted') from a confmat.

    Weights are per-class target support fractions; classes with zero union
    contribute 0 (torchmetrics zero-division default).
    """
    cm = cm.astype(jnp.float32)
    inter = jnp.diagonal(cm)
    union = cm.sum(axis=1) + cm.sum(axis=0) - inter
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1), 0.0)
    support = cm.sum(axis=1)
    total = jnp.maximum(support.sum(), 1)
    return (iou * support / total).sum()


def per_class_jaccard(cm) -> jax.Array:
    """torchmetrics MulticlassJaccardIndex(average=None)."""
    cm = cm.astype(jnp.float32)
    inter = jnp.diagonal(cm)
    union = cm.sum(axis=1) + cm.sum(axis=0) - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1), 0.0)
