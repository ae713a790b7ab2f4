from vfisr_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    spatial_sharding,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "spatial_sharding",
    "shard_batch",
]
