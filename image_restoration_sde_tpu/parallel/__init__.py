from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    process_is_primary,
    replicate,
    replicated,
    shape_based_tp_sharding,
    shard_batch,
    shard_tree,
)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "batch_sharding", "make_mesh",
    "process_is_primary", "replicate", "replicated",
    "shape_based_tp_sharding", "shard_batch", "shard_tree",
]
