from .mesh import (make_mesh, batch_sharding, param_sharding,  # noqa: F401
                   replicated, shard_batch, shard_params)
