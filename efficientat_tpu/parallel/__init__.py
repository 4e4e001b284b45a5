from efficientat_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicate_sharding,
    shard_batch,
)
from efficientat_tpu.parallel.ensemble import (
    make_member_parallel_ensemble,
    shard_member_params,
    stack_member_params,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicate_sharding",
    "shard_batch",
    "make_member_parallel_ensemble",
    "shard_member_params",
    "stack_member_params",
]
