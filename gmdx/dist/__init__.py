"""Device-mesh and sharding helpers (replaces the reference's Accelerate/NCCL
substrate — SURVEY.md §5.8)."""

from gmdx.dist.mesh import (
    make_mesh,
    zero1_shard,
    data_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    local_device_count,
)

__all__ = [
    "make_mesh",
    "zero1_shard",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "local_device_count",
]
