from vfidkr_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = ["create_mesh", "batch_sharding", "replicated", "shard_batch",
           "replicate"]
