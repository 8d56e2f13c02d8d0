"""Loader backends: threaded and grain produce equivalent batches."""

import numpy as np
import pytest

from flairtpu.data.grain_loader import GrainPatchLoader, make_loader
from flairtpu.data.patches import PatchDataset, PatchLoader
from tests.synth import make_dataset, write_csv


@pytest.fixture(scope="module")
def small_ds(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("loaders")
    imgs, msks = make_dataset(tmp, 7, size=16, n_classes=3, seed=4)
    return PatchDataset({"IMG": imgs, "MSK": msks}, channels=[1, 2, 3, 4, 5])


def _all_batches(loader):
    return list(loader)


def test_threaded_loader_shapes(small_ds):
    loader = PatchLoader(small_ds, 3, shuffle=False, drop_last=False, num_workers=2)
    batches = _all_batches(loader)
    assert [b["img"].shape[0] for b in batches] == [3, 3, 1]
    assert batches[0]["img"].shape[1:] == (16, 16, 5)
    assert batches[0]["msk"].dtype == np.int32
    assert batches[0]["msk"].min() >= 0  # 1-based masks shifted


def test_threaded_drop_last(small_ds):
    loader = PatchLoader(small_ds, 3, shuffle=False, drop_last=True)
    assert len(loader) == 2
    assert [b["img"].shape[0] for b in _all_batches(loader)] == [3, 3]


def test_threaded_shuffle_is_seeded_and_epoch_varies(small_ds):
    l1 = PatchLoader(small_ds, 7, shuffle=True, seed=5)
    l2 = PatchLoader(small_ds, 7, shuffle=True, seed=5)
    b1, b2 = next(iter(l1)), next(iter(l2))
    assert b1["id"] == b2["id"]  # same seed, same epoch -> same order
    b1b = next(iter(l1))  # second epoch of l1
    assert b1b["id"] != b1["id"]


def test_grain_loader_matches_threaded(small_ds):
    t = PatchLoader(small_ds, 3, shuffle=False, drop_last=False, num_workers=2)
    g = GrainPatchLoader(small_ds, 3, shuffle=False, drop_last=False, num_workers=0)
    tb, gb = _all_batches(t), _all_batches(g)
    assert len(tb) == len(gb)
    for a, b in zip(tb, gb):
        np.testing.assert_array_equal(a["img"], b["img"])
        np.testing.assert_array_equal(a["msk"], b["msk"])
        assert a["id"] == b["id"]


def test_make_loader_dispatch(small_ds):
    assert isinstance(make_loader("threads", small_ds, batch_size=2), PatchLoader)
    assert isinstance(make_loader("grain", small_ds, batch_size=2), GrainPatchLoader)
