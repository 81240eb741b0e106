from .mesh import (DATA_AXIS, batch_sharding, get_mesh, host_allgather,
                   is_primary, replicated_sharding, shard_batch)

__all__ = ["DATA_AXIS", "get_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "host_allgather", "is_primary"]
