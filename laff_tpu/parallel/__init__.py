from .mesh import (data_parallel_mesh, initialize_multihost,
                   replicate, shard_batch)

__all__ = ["data_parallel_mesh", "initialize_multihost",
           "shard_batch", "replicate"]
