from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    process_is_primary,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "batch_sharding", "make_mesh",
    "process_is_primary", "replicate", "replicated", "shard_batch",
]
