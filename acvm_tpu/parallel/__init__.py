from .mesh import batch_sharding, make_mesh, shard_batch

__all__ = ["make_mesh", "batch_sharding", "shard_batch"]
