from .mesh import (data_sharding, initialize_distributed, make_mesh,
                   on_master, put_tree, replicate, shard_batch)

__all__ = ["make_mesh", "shard_batch", "replicate", "on_master",
           "data_sharding", "initialize_distributed", "put_tree"]
