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
