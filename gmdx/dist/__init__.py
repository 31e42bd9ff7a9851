"""Device-mesh and sharding helpers (replaces the reference's Accelerate/NCCL
substrate — SURVEY.md §5.8)."""

from gmdx.dist.multihost import (
    initialize,
    is_main_process,
    barrier,
    coordination_barrier,
    main_process_first,
    broadcast_from_main,
)
from gmdx.dist.mesh import (
    make_mesh,
    make_train_mesh,
    zero1_shard,
    fsdp_shard,
    apply_shard_strategy,
    data_sharding,
    spatial_sharding,
    replicated_sharding,
    shard_batch,
    shard_batch_spatial,
    replicate,
    local_device_count,
)
from gmdx.dist.tp import (
    tp_param_specs,
    tp_shard_params,
    tp_spec_for_path,
)

__all__ = [
    "initialize",
    "is_main_process",
    "barrier",
    "coordination_barrier",
    "main_process_first",
    "broadcast_from_main",
    "make_mesh",
    "make_train_mesh",
    "zero1_shard",
    "fsdp_shard",
    "apply_shard_strategy",
    "data_sharding",
    "spatial_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_batch_spatial",
    "replicate",
    "local_device_count",
    "tp_param_specs",
    "tp_shard_params",
    "tp_spec_for_path",
]
