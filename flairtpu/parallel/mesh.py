"""Mesh construction and sharding helpers.

One mesh axis family covers this framework's parallelism needs:

- ``data`` — batch dimension (training DP, zone-detect tile-batch sharding).
  The 24.4M-parameter U-Net replicates; gradients all-reduce over ICI via the
  psum XLA inserts for the replicated-param/sharded-batch layout.

``make_mesh`` also accepts a 2-D (data, model) shape for the optional
tensor-sharded layouts used by larger model families, and a (data, space)
shape for spatial partitioning — image height sharded over 'space' so XLA's
SPMD partitioner tiles convs/pools with halo exchanges (``batch_sharding``
below; the vision analog of sequence parallelism).
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up (DCN) — the NCCL/Lightning-DDP `num_nodes`
    equivalent (reference src/flair/tasks.py:83-93).

    With explicit args (a launcher or test harness), initializes the
    jax.distributed client directly. With no args, initializes from the
    environment when a coordinator is configured (JAX_COORDINATOR_ADDRESS,
    or TPU pod metadata that jax.distributed.initialize auto-detects).
    Safe to call more than once.
    """
    # NB: jax.process_count() would itself initialize the XLA backend, which
    # forbids a later jax.distributed.initialize — probe the client directly.
    try:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return  # already initialized
    except ImportError:  # private-module layout changed; fall through
        pass
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    elif os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def is_main_process() -> bool:
    """Replacement for the reference's @rank_zero_only gating."""
    return jax.process_index() == 0


def make_mesh(axis_names: tuple[str, ...] = ("data",),
              shape: tuple[int, ...] | None = None,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data",
                   spatial_axis: str | None = None) -> NamedSharding:
    """Shard dim 0 over the data axis, replicate the rest.

    With ``spatial_axis`` set, rank >= 3 arrays (NHWC images, (B, H, W)
    masks) additionally shard dim 1 — the image height — over that mesh
    axis: XLA's SPMD partitioner then tiles every conv/pool spatially and
    inserts the halo exchanges itself, so a patch too large for one chip's
    activation memory trains across the mesh (spatial partitioning, the
    vision analog of sequence parallelism).
    """
    if spatial_axis is not None and ndim >= 3:
        return NamedSharding(mesh, P(axis, spatial_axis, *([None] * (ndim - 2))))
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Mapping[str, Any], mesh: Mesh, axis: str = "data",
                spatial_axis: str | None = None) -> dict:
    """Device-put a host batch with dim-0 sharding (lists pass through).

    Single-process: a plain sharded device_put. Multi-process (DCN): each
    process contributes its LOCAL slice of the global batch (the
    DistributedSampler analog — pair with the loaders' ``shard=`` option) and
    the global array is assembled with make_array_from_process_local_data.
    """
    multiprocess = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            if spatial_axis is not None and v.ndim >= 3:
                n_sp = int(mesh.shape[spatial_axis])
                if v.shape[1] % n_sp:
                    raise ValueError(
                        f"batch {k!r} height {v.shape[1]} is not divisible by "
                        f"the {n_sp}-way {spatial_axis!r} mesh axis")
            sharding = batch_sharding(mesh, v.ndim, axis, spatial_axis)
            if multiprocess:
                out[k] = jax.make_array_from_process_local_data(sharding, v)
            else:
                out[k] = jax.device_put(v, sharding)
        else:
            out[k] = v
    return out


def global_put(x, mesh: Mesh, spec: P):
    """Place a host array on the mesh with ``spec`` — multi-host aware.

    Single-process: a plain sharded device_put. Multi-process (one program
    spanning DCN-connected hosts): every process holds the identical global
    value (e.g. each read the same raster), so the global jax.Array is
    assembled from per-device slices of it via make_array_from_callback.
    Leaves that are ALREADY process-spanning global arrays pass through
    untouched — re-placing them would pay a full D2H fetch per call.
    """
    sh = NamedSharding(mesh, spec)
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return x  # already global (placed by a previous call)
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0,
                    fill=0) -> tuple[np.ndarray, int]:
    """Pad dim to a multiple (static shapes for jit; returns (arr, n_valid))."""
    n = arr.shape[axis]
    rem = n % multiple
    if rem == 0:
        return arr, n
    pad = multiple - rem
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths, constant_values=fill), n
