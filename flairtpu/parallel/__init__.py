"""Device mesh + sharding utilities (the NCCL/DDP replacement).

The reference delegates distribution to Lightning DDP over NCCL
(reference src/flair/tasks.py:83-93, configs/flair-1-config.yaml:81-85).
Here parallelism is SPMD over a `jax.sharding.Mesh`: batch-sharded train and
inference steps with XLA-inserted collectives riding ICI, `jax.distributed`
for multi-host (DCN), and `process_index() == 0` gating replacing
`rank_zero_only`.
"""

from flairtpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    is_main_process,
    make_mesh,
    replicate,
    shard_batch,
)
from flairtpu.parallel.sharding import (  # noqa: F401
    leaf_spec,
    shard_tree,
    sharded_bytes,
    tree_shardings,
    tree_specs,
)
