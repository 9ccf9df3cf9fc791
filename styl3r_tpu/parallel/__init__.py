from .mesh import batch_sharding, make_mesh, replicated_sharding, shard_batch
from .tp import (
    batch_sharding_2d,
    make_mesh_2d,
    shard_params_tp,
    tensor_parallel_shardings,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "make_mesh_2d",
    "batch_sharding_2d",
    "shard_params_tp",
    "tensor_parallel_shardings",
]
