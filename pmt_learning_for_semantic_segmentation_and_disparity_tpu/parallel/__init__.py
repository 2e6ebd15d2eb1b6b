from .mesh import (  # noqa: F401
    DATA_AXIS,
    make_mesh,
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
