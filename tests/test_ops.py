"""Device-op tests: confusion matrix vs sklearn, fused ops vs references."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from sklearn.metrics import confusion_matrix as sk_confusion

from flairtpu.ops import confmat as cm
from flairtpu.ops.fused import scatter_accumulate, softmax_argmax, softmax_argmax_ref


def test_confusion_matrix_matches_sklearn(rng):
    k = 7
    t = rng.integers(0, k, size=5000)
    p = rng.integers(0, k, size=5000)
    ours = np.asarray(cm.confusion_matrix(jnp.asarray(p), jnp.asarray(t), k))
    want = sk_confusion(t, p, labels=list(range(k)))
    np.testing.assert_array_equal(ours, want)


def test_confusion_matrix_ignores_out_of_range(rng):
    k = 5
    t = rng.integers(0, k + 3, size=2000) - 1  # includes -1 and >= k
    p = rng.integers(0, k, size=2000)
    ours = np.asarray(cm.confusion_matrix(jnp.asarray(p), jnp.asarray(t), k))
    valid = (t >= 0) & (t < k)
    want = sk_confusion(t[valid], p[valid], labels=list(range(k)))
    np.testing.assert_array_equal(ours, want)


def test_metric_functions_match_reference_formulas(rng):
    mat = rng.integers(0, 100, size=(6, 6)).astype(np.float64)
    per_iou, miou = cm.class_iou(mat)
    want = 100 * np.diag(mat) / (mat.sum(1) + mat.sum(0) - np.diag(mat))
    np.testing.assert_allclose(per_iou, np.nan_to_num(want))
    assert cm.overall_accuracy(mat) == pytest.approx(100 * np.trace(mat) / mat.sum())


def test_weighted_jaccard_matches_manual(rng):
    k = 4
    t = rng.integers(0, k, size=3000)
    p = rng.integers(0, k, size=3000)
    mat = sk_confusion(t, p, labels=list(range(k))).astype(np.float64)
    inter = np.diag(mat)
    union = mat.sum(1) + mat.sum(0) - inter
    iou = np.where(union > 0, inter / np.maximum(union, 1), 0)
    support = mat.sum(1) / mat.sum()
    want = float((iou * support).sum())
    got = float(cm.weighted_jaccard(jnp.asarray(mat)))
    assert got == pytest.approx(want, rel=1e-6)


def test_drop_zero_weight_classes():
    mat = np.arange(16).reshape(4, 4)
    out = cm.drop_zero_weight_classes(mat, [1, 0, 1, 0])
    np.testing.assert_array_equal(out, mat[np.ix_([0, 2], [0, 2])])


def test_softmax_argmax_ref_matches_naive(rng):
    logits = rng.standard_normal((3, 8, 8, 19)).astype(np.float32) * 4
    arg, prob = softmax_argmax_ref(jnp.asarray(logits))
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    np.testing.assert_array_equal(np.asarray(arg), np.argmax(logits, -1))
    np.testing.assert_allclose(np.asarray(prob), np.asarray(probs.max(-1)),
                               rtol=1e-5, atol=1e-6)


def test_softmax_argmax_dispatcher_cpu(rng):
    """On CPU the dispatcher must fall back to the jnp path and agree."""
    logits = jnp.asarray(rng.standard_normal((2, 16, 16, 13)).astype(np.float32))
    a1, p1 = softmax_argmax(logits)
    a2, p2 = softmax_argmax_ref(logits)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-6)


def test_scatter_accumulate_overlapping(rng):
    """Overlapping tiles accumulate exactly (sequential semantics)."""
    acc = jnp.zeros((16, 16, 3))
    tiles = jnp.asarray(rng.standard_normal((3, 8, 8, 3)).astype(np.float32))
    origins = jnp.asarray([[0, 0], [4, 4], [8, 8]], jnp.int32)
    out = np.asarray(scatter_accumulate(acc, tiles, origins))
    want = np.zeros((16, 16, 3), np.float32)
    for t, (r, c) in zip(np.asarray(tiles), [(0, 0), (4, 4), (8, 8)]):
        want[r:r + 8, c:c + 8] += t
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_scatter_accumulate_weighted(rng):
    acc = jnp.zeros((8, 8, 2))
    tiles = jnp.ones((2, 4, 4, 2))
    w = jnp.asarray(rng.random((4, 4)).astype(np.float32))
    origins = jnp.asarray([[0, 0], [0, 0]], jnp.int32)
    out = np.asarray(scatter_accumulate(acc, tiles, origins, weights=w))
    np.testing.assert_allclose(out[:4, :4, 0], 2 * np.asarray(w), rtol=1e-6)
