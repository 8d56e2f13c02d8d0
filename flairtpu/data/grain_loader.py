"""Grain-backed input pipeline (multiprocess alternative to PatchLoader).

SURVEY.md §7 plans a "Grain/tf.data host pipeline" for the training feed. The
default loader (data/patches.py) uses decode threads — ideal when the C++/zlib
decoders release the GIL. This backend runs the same PatchDataset through
Grain's multiprocess DataLoader for workloads where Python-side work dominates
(select with ``loader_backend: grain`` in the train config).

Yields the same collated dict batches as PatchLoader, so the two are
interchangeable in train/loop.py.
"""

from __future__ import annotations

import numpy as np

from flairtpu.data.patches import PatchDataset


class _GrainSource:
    """grain RandomAccessDataSource over a PatchDataset (arrays only)."""

    def __init__(self, dataset: PatchDataset):
        self._dataset = dataset

    def __len__(self) -> int:
        return len(self._dataset)

    def __getitem__(self, idx: int) -> dict:
        item = self._dataset.read(int(idx))
        out = {"img": item["img"], "index": np.int64(idx)}
        if "msk" in item:
            out["msk"] = item["msk"]
        if "mtd" in item:
            out["mtd"] = item["mtd"]
        return out


class GrainPatchLoader:
    """Drop-in PatchLoader peer backed by grain.python.DataLoader."""

    def __init__(self, dataset: PatchDataset, batch_size: int,
                 shuffle: bool = False, seed: int = 2022, drop_last: bool = False,
                 num_workers: int = 4, prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        e = self._epoch
        self._epoch += 1
        return self._iter_epoch(e, 0)

    def epoch_iter(self, epoch: int, start_batch: int = 0):
        """Deterministic iterator for ``epoch`` skipping the first
        ``start_batch`` batches (exact mid-epoch resume; the skipped
        batches are still decoded by the workers — a one-off resume cost).
        Does not advance the loader's own epoch counter."""
        return self._iter_epoch(epoch, start_batch)

    def _iter_epoch(self, epoch: int, start_batch: int):
        import grain.python as gp

        sampler = gp.IndexSampler(
            num_records=len(self.dataset),
            shard_options=gp.NoSharding(),
            shuffle=self.shuffle,
            num_epochs=1,
            seed=self.seed + epoch,
        )
        loader = gp.DataLoader(
            data_source=_GrainSource(self.dataset),
            sampler=sampler,
            operations=[gp.Batch(self.batch_size, drop_remainder=self.drop_last)],
            worker_count=self.num_workers,
        )
        for i, batch in enumerate(loader):
            if i < start_batch:
                continue
            out = {k: np.asarray(v) for k, v in batch.items() if k != "index"}
            out["id"] = [self.dataset.images[int(i)] for i in batch["index"]]
            yield out


def make_loader(backend: str, dataset: PatchDataset, **kwargs):
    """Loader factory: 'threads' (default) or 'grain'."""
    if backend == "grain":
        return GrainPatchLoader(dataset, **kwargs)
    from flairtpu.data.patches import PatchLoader

    return PatchLoader(dataset, **kwargs)
