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

    Computed as a one-hot contraction on the MXU: element scatters serialize
    on TPU (a 2M-pixel batch cost ~15x the whole fwd+bwd step), while the
    (N, K+1)^T @ (N, K+1) matmul is microseconds. bf16 one-hots are exact
    (0/1) with fp32 accumulation (exact counts to 2^24).
    """
    t = targets.reshape(-1).astype(jnp.int32)
    p = preds.reshape(-1).astype(jnp.int32)
    k = num_classes
    # invalid values route to the extra class k, sliced away below
    t = jnp.where((t >= 0) & (t < k), t, k)
    p = jnp.where((p >= 0) & (p < k), p, k)
    t_oh = jax.nn.one_hot(t, k + 1, dtype=jnp.bfloat16)
    p_oh = jax.nn.one_hot(p, k + 1, dtype=jnp.bfloat16)
    cm = jax.lax.dot_general(t_oh, p_oh, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return cm[:k, :k].astype(dtype)


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
