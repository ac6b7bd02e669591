from .mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    shard_params,
    param_partition_spec,
)
from .sequence import make_sp_mesh, sp_detect, sp_encode

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_params",
    "param_partition_spec",
    "make_sp_mesh",
    "sp_encode",
    "sp_detect",
]
