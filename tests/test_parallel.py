"""Multi-device tests on the virtual 8-CPU mesh: sharding, augment, dryrun."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flairtpu.parallel.mesh import batch_sharding, make_mesh, pad_to_multiple, shard_batch


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_shard_batch_places_on_data_axis(rng):
    mesh = make_mesh()
    batch = {"img": rng.integers(0, 255, size=(16, 8, 8, 5)).astype(np.uint8),
             "id": ["a"] * 16}
    out = shard_batch(batch, mesh)
    assert out["img"].sharding.spec[0] == "data"
    assert out["id"] == ["a"] * 16


def test_sharded_reduction_matches_single_device(rng):
    """psum-equivalent: global mean over a sharded batch == local mean."""
    mesh = make_mesh()
    x = rng.standard_normal((16, 32)).astype(np.float32)
    xs = jax.device_put(x, batch_sharding(mesh, 2))
    got = float(jax.jit(lambda a: a.mean())(xs))
    assert got == pytest.approx(float(x.mean()), rel=1e-5)


def test_pad_to_multiple():
    arr = np.ones((5, 3))
    padded, n = pad_to_multiple(arr, 4)
    assert padded.shape == (8, 3) and n == 5
    arr2, n2 = pad_to_multiple(np.ones((8, 3)), 4)
    assert arr2.shape == (8, 3) and n2 == 8


def test_augment_batch_is_d4_and_label_consistent(rng):
    """Augmented (img, msk) stay aligned; pixels are permuted, not changed."""
    from flairtpu.data.augment import augment_batch

    img = rng.integers(0, 255, size=(8, 16, 16, 2)).astype(np.float32)
    # mask encodes img channel 0 so alignment is checkable after any transform
    msk = img[..., 0].astype(np.int32)
    out_img, out_msk = augment_batch(jnp.asarray(img), jnp.asarray(msk),
                                     jax.random.PRNGKey(3))
    out_img, out_msk = np.asarray(out_img), np.asarray(out_msk)
    np.testing.assert_array_equal(out_img[..., 0].astype(np.int32), out_msk)
    for b in range(8):  # multiset of pixels preserved
        np.testing.assert_array_equal(
            np.sort(out_img[b].reshape(-1, 2), axis=0),
            np.sort(img[b].reshape(-1, 2), axis=0))


def test_augment_d4_distribution_matches_albumentations(rng):
    """Chi-square: the composed D4 element follows the reference distribution.

    Reference pipeline (ref tasks_utils.py:37-41): VerticalFlip(p=.5) ->
    HorizontalFlip(p=.5) -> RandomRotate90(p=.5, k~U{0..3} when applied).
    Under the pre-fix key reuse (bernoulli and randint drawn from the same
    key) the rotation amount was coupled to whether rotation fired, which
    visibly skews this distribution.
    """
    from flairtpu.data.augment import augment_batch

    # Marker image: all 8 D4 images are distinct.
    base = np.arange(16, dtype=np.float32).reshape(4, 4)
    d4 = {}  # canonical bytes -> element index
    for k in range(4):
        d4[np.rot90(base, k).tobytes()] = len(d4)
        d4[np.rot90(base[::-1], k).tobytes()] = len(d4)
    assert len(d4) == 8

    # Expected element probabilities: enumerate the 16 (do_v, do_h, k) triples.
    expected = np.zeros(8)
    for do_v in (0, 1):
        for do_h in (0, 1):
            for k in range(4):
                p = 0.25 * (0.625 if k == 0 else 0.125)
                out = base
                if do_v:
                    out = out[::-1]
                if do_h:
                    out = out[:, ::-1]
                out = np.rot90(out, k)
                expected[d4[np.ascontiguousarray(out).tobytes()]] += p
    assert expected.sum() == pytest.approx(1.0)

    n = 8192
    img = jnp.broadcast_to(jnp.asarray(base)[None, :, :, None], (n, 4, 4, 1))
    msk = jnp.zeros((n, 4, 4), jnp.int32)
    out, _ = augment_batch(img, msk, jax.random.PRNGKey(7))
    out = np.asarray(out)[..., 0]
    counts = np.zeros(8)
    for b in range(n):
        counts[d4[np.ascontiguousarray(out[b]).tobytes()]] += 1
    chi2 = float(((counts - n * expected) ** 2 / (n * expected)).sum())
    assert chi2 < 24.3, (chi2, counts / n, expected)  # chi2(7 dof, p=.999)


def test_augment_batch_deterministic(rng):
    from flairtpu.data.augment import augment_batch

    img = jnp.asarray(rng.random((4, 8, 8, 1)).astype(np.float32))
    msk = jnp.zeros((4, 8, 8), jnp.int32)
    a1, _ = augment_batch(img, msk, jax.random.PRNGKey(0))
    a2, _ = augment_batch(img, msk, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_dryrun_multichip_8():
    """The driver's multi-chip validation must pass on the virtual mesh."""
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
