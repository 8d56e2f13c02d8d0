"""Patch predict stage (reference flair/main.py:187-203 + tasks.py:113-142).

Improvements over the reference: prediction batches are real batches (the
reference hard-codes predict batch_size=1, data_module.py:97-104 — bug #7 in
SURVEY.md), argmax happens on device (uint8 D2H instead of float logits), and
file writes overlap compute via a small thread pool.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from flairtpu.data.patches import PatchDataset, PatchLoader
from flairtpu.io import TiffReader, TiffWriter
from flairtpu.train.loop import SegmentationTrainer


def write_prediction(pred: np.ndarray, src_path: str, out_dir: Path,
                     georeferencing: bool = True) -> Path:
    """Write one PRED_<name>.tif (reference writer.py:32-50 layout)."""
    name = src_path.split("/")[-1]
    out_file = out_dir / f"PRED_{name}"
    if georeferencing:
        with TiffReader(src_path) as src:
            profile = src.profile
        profile.update(count=1, compress="lzw", dtype="uint8")
        with TiffWriter.from_profile(out_file, profile) as w:
            w.write_band(1, pred.astype(np.uint8))
    else:
        with TiffWriter(out_file, pred.shape[1], pred.shape[0], 1, "uint8",
                        compress="lzw", tiled=False) as w:
            w.write_band(1, pred.astype(np.uint8))
    return out_file


def predict(config: dict, dict_test: dict, out_dir: str | Path,
            trainer: SegmentationTrainer, batch_size: int | None = None,
            progress=print) -> Path:
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    bs = batch_size or int(config.get("batch_size", 4))
    ds = PatchDataset(dict_test, config["channels"],
                      use_metadata=trainer.use_metadata, with_masks=False)
    loader = PatchLoader(ds, bs, shuffle=False, drop_last=False,
                         num_workers=int(config.get("num_workers", 4)))
    step = trainer.predict_step()
    geo = bool(config.get("georeferencing_output", True))

    n_done = 0
    with ThreadPoolExecutor(max_workers=4) as pool:
        futures = []
        pending = None  # (device preds, n, ids): overlap D2H with the next
        #                 batch's dispatch (the fetch blocks while the device
        #                 computes the following batch)

        def flush(p):
            nonlocal n_done
            dev, n, ids = p
            preds = np.asarray(dev)[:n]
            for pred, src in zip(preds, ids):
                futures.append(pool.submit(write_prediction, pred, src,
                                           out_dir, geo))
            n_done += n

        for batch in loader:
            img = batch["img"]
            n = img.shape[0]
            if n < bs:  # pad the ragged tail to keep one compiled shape
                pad = bs - n
                img = np.concatenate([img, np.repeat(img[-1:], pad, axis=0)])
                mtd = batch.get("mtd")
                if mtd is not None:
                    batch["mtd"] = np.concatenate(
                        [mtd, np.repeat(mtd[-1:], pad, axis=0)])
            mtd = batch.get("mtd")
            if mtd is None:
                mtd = np.zeros((img.shape[0], 45), np.float32)
            # shard the batch over the trainer's mesh (the reference's
            # Lightning predict is DDP multi-device too, tasks.py:133-142);
            # without this the replicated params make every device compute
            # the WHOLE batch redundantly
            if bs % int(trainer.mesh.shape["data"]) == 0:
                img_d, _, mtd_d = trainer._put({"img": img, "mtd": mtd})
            else:  # user-supplied mesh that doesn't divide the batch
                img_d, mtd_d = jnp.asarray(img), jnp.asarray(mtd)
            dev = step(trainer.params, trainer.batch_stats, img_d, mtd_d)
            if pending is not None:
                flush(pending)
            pending = (dev, n, batch["id"])
        if pending is not None:
            flush(pending)
        for f in futures:
            f.result()
    progress(f"    [x] wrote {n_done} predictions to {out_dir}")
    return out_dir
