"""Parameter-sharding layouts: FSDP-style and tensor-parallel training.

The reference's only distributed strategy is DDP — replicated parameters
with an NCCL gradient all-reduce, fully delegated to Lightning
(reference src/flair/tasks.py:83-93, configs/flair-1-config.yaml:81-85).
On TPU the idiomatic generalization is XLA's SPMD partitioner: annotate each
parameter leaf with a PartitionSpec over the device mesh and ``jit`` inserts
the collectives itself (all-gather for sharded weights, reduce-scatter/psum
for gradients) over ICI. Two layouts beyond plain replication:

- ``fsdp`` — shard every large parameter over the **data** axis (the ZeRO-3
  analog): parameter + optimizer memory scales as 1/N devices; XLA
  all-gathers each layer's weights just-in-time inside the step.
- ``tensor`` — a 2-D ``(data, model)`` mesh; large parameters shard over the
  **model** axis (the Megatron analog for convs/attention: output-channel /
  head-dim sharded weights), batch shards over ``data``. XLA picks the
  activation layouts and collectives.

The spec rule is purely *shape*-based so one function maps parameters,
BatchNorm statistics and optimizer state alike: SGD momentum mirrors the
parameter shapes leaf-for-leaf and lands on identical shardings; scalar
state (injected LR, step counts) and small vectors (BN scales/biases)
replicate, which keeps elementwise-tiny tensors off the wire.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Leaves smaller than this many elements replicate: sharding a 512-float BN
# scale saves nothing and forces a gather into every BN epilogue.
MIN_SHARD_ELEMS = 2 ** 13


def leaf_spec(shape: tuple[int, ...], n_shards: int, axis_name: str,
              min_elems: int = MIN_SHARD_ELEMS) -> P:
    """Shape rule: shard the largest dim divisible by ``n_shards``.

    Ties prefer the **last** qualifying dim — for HWIO conv kernels that is
    the output-channel axis and for (in, out) Dense kernels the output
    features, i.e. the Megatron column-parallel convention, which lets XLA
    keep the matmul local and all-gather (or reduce-scatter) activations.
    Leaves with no qualifying dim, or fewer than ``min_elems`` elements,
    replicate.
    """
    if n_shards <= 1 or int(np.prod(shape or (1,))) < min_elems:
        return P()
    best_dim, best_size = None, 0
    for d, s in enumerate(shape):
        if s % n_shards == 0 and s >= best_size and s > 1:
            best_dim, best_size = d, s
    if best_dim is None:
        return P()
    spec = [None] * len(shape)
    spec[best_dim] = axis_name
    return P(*spec)


def tree_specs(tree: Any, mesh: Mesh, axis_name: str,
               min_elems: int = MIN_SHARD_ELEMS) -> Any:
    """PartitionSpec tree for an arbitrary state pytree (shape rule above)."""
    n = int(mesh.shape[axis_name])

    def rule(leaf):
        shape = tuple(getattr(leaf, "shape", ()) or ())
        return leaf_spec(shape, n, axis_name, min_elems)

    return jax.tree_util.tree_map(rule, tree)


def tree_shardings(tree: Any, mesh: Mesh, axis_name: str,
                   min_elems: int = MIN_SHARD_ELEMS) -> Any:
    specs = tree_specs(tree, mesh, axis_name, min_elems)
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs,
                                  is_leaf=lambda x: isinstance(x, P))


def shard_tree(tree: Any, mesh: Mesh, axis_name: str,
               min_elems: int = MIN_SHARD_ELEMS) -> Any:
    """device_put every leaf with its rule sharding (scalars replicate)."""
    shardings = tree_shardings(tree, mesh, axis_name, min_elems)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)


def sharded_bytes(tree: Any) -> tuple[int, int]:
    """(global_bytes, max_per_device_bytes) across a sharded state tree."""
    leaves = jax.tree_util.tree_leaves(tree)
    total = 0
    per_dev: dict[int, int] = {}
    for leaf in leaves:
        if not hasattr(leaf, "addressable_shards"):
            continue
        total += leaf.nbytes
        for shard in leaf.addressable_shards:
            per_dev[shard.device.id] = (
                per_dev.get(shard.device.id, 0) + shard.data.nbytes)
    return total, max(per_dev.values(), default=0)
