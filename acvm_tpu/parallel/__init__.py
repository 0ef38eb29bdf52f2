from .mesh import (
    batch_sharding,
    make_mesh,
    rows_sharding,
    shard_batch,
    shard_state,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "rows_sharding",
    "shard_batch",
    "shard_state",
]
