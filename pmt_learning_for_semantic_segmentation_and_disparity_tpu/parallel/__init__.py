from .mesh import (  # noqa: F401
    DATA_AXIS,
    REPLICA_AXIS,
    make_mesh,
    mesh_size,
    batch_sharding,
    replicated,
    shard_batch,
    replicate,
    local_batch_size,
)
from .spatial import (  # noqa: F401
    spatial_shard_infer,
    split_bands,
    merge_bands,
)
