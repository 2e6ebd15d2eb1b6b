from .mesh import (  # noqa: F401
    DATA_AXIS,
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    replicate,
    local_batch_size,
)
