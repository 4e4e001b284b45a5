from efficientat_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicate_sharding,
    shard_batch,
)

__all__ = ["make_mesh", "data_sharding", "replicate_sharding", "shard_batch"]
