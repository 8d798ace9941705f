from .mesh import make_mesh, shard_batch, replicate, on_master, data_sharding

__all__ = ["make_mesh", "shard_batch", "replicate", "on_master", "data_sharding"]
