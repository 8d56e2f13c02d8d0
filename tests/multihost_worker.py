"""Worker process for the multi-host (DCN) training test.

Launched twice by tests/test_multihost.py (2 processes x 4 virtual CPU
devices = one 8-device global mesh over a jax.distributed gloo backend —
the CPU stand-in for multi-host DCN, reference `num_nodes`/`strategy='ddp'`
src/flair/tasks.py:83-93). Runs one real SPMD train step with the batch
process-sharded, checkpoints with Orbax from all processes, restores, and
prints assertions as OK markers the parent greps.

Usage: python multihost_worker.py <coordinator_port> <process_id> <out_dir>
"""

import os
import sys

port, pid, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from flairtpu.parallel.mesh import (  # noqa: E402
    initialize_distributed, is_main_process, make_mesh)

initialize_distributed(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert jax.device_count() == 8 and len(jax.local_devices()) == 4
assert is_main_process() == (pid == 0)
print(f"[worker {pid}] OK distributed: {jax.device_count()} global devices")

from flairtpu.data.patches import PatchLoader  # noqa: E402
from flairtpu.train import checkpoints as ckpt_lib  # noqa: E402
from flairtpu.train.loop import SegmentationTrainer  # noqa: E402

config = {
    "model_framework": {
        "model_provider": "SegmentationModelsPytorch",
        "SegmentationModelsPytorch": {"encoder_decoder": "resnet18_unet"},
    },
    "use_metadata": False, "use_augmentation": True, "use_weights": True,
    "channels": [1, 2, 3, 4, 5],
    "norm_type": "scaling", "norm_means": [], "norm_stds": [],
    "classes": {i: [1, f"c{i}"] for i in range(1, 5)},
    "batch_size": 8, "learning_rate": 0.02, "seed": 0,
}

mesh = make_mesh(devices=jax.devices())  # global 8-device mesh
import jax.numpy as jnp  # noqa: E402

trainer = SegmentationTrainer(config, mesh=mesh, dtype=jnp.float32)
trainer.replicate_to_mesh()
step = trainer.train_step()

# per-process data shard: the loaders' DistributedSampler analog
rng = np.random.default_rng(7)
n_global = 8


class _FakeDataset:
    """8 deterministic samples every process can synthesize."""

    def __init__(self):
        self.images = [f"sample_{i}" for i in range(n_global)]

    def __len__(self):
        return n_global

    def read(self, idx):
        r = np.random.default_rng(idx)
        return {"id": self.images[idx],
                "img": r.integers(0, 255, (32, 32, 5)).astype(np.uint8),
                "msk": r.integers(0, 4, (32, 32)).astype(np.int32)}


loader = PatchLoader(_FakeDataset(), batch_size=4, shuffle=True, seed=3,
                     shard=(pid, 2), num_workers=1)
batches = list(loader)
assert len(batches) == 1 and batches[0]["img"].shape[0] == 4
print(f"[worker {pid}] OK loader shard: {sorted(batches[0]['id'])}")

img, msk, mtd = trainer._put(batches[0])  # global (8, ...) arrays
assert img.shape[0] == 8, img.shape
key = jax.random.PRNGKey(0)
params, stats, opt, loss, cm, _rng = step(
    trainer.params, trainer.batch_stats, trainer.opt_state, img, msk, mtd, key)
trainer.params, trainer.batch_stats, trainer.opt_state = params, stats, opt
loss = float(loss)
assert np.isfinite(loss)
cm = np.asarray(cm)
assert cm.sum() == 8 * 32 * 32, cm.sum()
print(f"[worker {pid}] OK train step: loss={loss:.4f}")

# multi-process Orbax save/restore round trip
manager = ckpt_lib.CheckpointManager(out_dir, model_name="mh", monitor="val_loss",
                                     mode="min", save_last=True)
state = dict(trainer.state().as_dict(), epoch=0, val_loss=loss, val_miou=0.0,
             train_loss=loss, train_miou=0.0)
manager.on_epoch_end(0, {"val_loss": loss, "val_miou": 0.0,
                         "train_loss": loss, "train_miou": 0.0},
                     trainer.state().as_dict())
restored = manager.restore(manager.best_path, state)
leaf = np.asarray(jax.tree_util.tree_leaves(restored["params"])[0])
orig = np.asarray(jax.tree_util.tree_leaves(trainer.params)[0])
np.testing.assert_array_equal(leaf, orig)
print(f"[worker {pid}] OK checkpoint round-trip: {manager.best_path}")

# fsdp layout: params sharded over the PROCESS-SPANNING 'data' axis are not
# fully addressable — _to_host must all-gather them before the Orbax save
# (round-3 review finding: np.asarray alone raises on such leaves)
from flairtpu.parallel.sharding import shard_tree  # noqa: E402

host_before = jax.tree.map(np.asarray, trainer.params)
sharded_params = shard_tree(trainer.params, mesh, "data")
big = [l for l in jax.tree_util.tree_leaves(sharded_params)
       if hasattr(l, "is_fully_addressable") and not l.is_fully_addressable]
assert big, "expected process-spanning sharded leaves"
manager2 = ckpt_lib.CheckpointManager(os.path.join(out_dir, "fsdp"),
                                      model_name="mh-fsdp", monitor="val_loss",
                                      mode="min", save_last=False)
state2 = {"params": sharded_params, "batch_stats": trainer.batch_stats,
          "opt_state": trainer.opt_state, "epoch": 0, "val_loss": loss,
          "val_miou": 0.0, "train_loss": loss, "train_miou": 0.0}
manager2.on_epoch_end(0, {"val_loss": loss, "val_miou": 0.0,
                          "train_loss": loss, "train_miou": 0.0}, state2)
restored2 = manager2.restore(manager2.best_path, state2)
for a, b in zip(jax.tree_util.tree_leaves(restored2["params"]),
                jax.tree_util.tree_leaves(host_before)):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
print(f"[worker {pid}] OK fsdp-sharded checkpoint save/restore")
print(f"[worker {pid}] ALL OK")
