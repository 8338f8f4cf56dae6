from .mesh import (data_parallel_mesh, initialize_multihost,
                   replicate, seed_data_mesh, shard_batch)

__all__ = ["data_parallel_mesh", "initialize_multihost",
           "seed_data_mesh", "shard_batch", "replicate"]
