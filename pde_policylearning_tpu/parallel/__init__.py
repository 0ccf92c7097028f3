from .mesh import (DATA_AXIS, MODEL_AXIS, get_data_parallel_size,
                   get_model_parallel_size, init_distributed, make_mesh,
                   replicate, shard_batch, split_batch_size)
from .patching import (MultigridPatching2D, make_mg_patches, make_patches,
                       stitch_patches)
from .sharded_env import (data_parallel_rollout, shard_env_batch,
                          shard_env_state, sharded_rollout,
                          sharded_step)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "get_data_parallel_size",
    "get_model_parallel_size", "init_distributed", "make_mesh", "replicate",
    "shard_batch", "split_batch_size",
    "MultigridPatching2D", "make_mg_patches", "make_patches",
    "stitch_patches",
    "shard_env_state", "sharded_rollout", "sharded_step",
    "data_parallel_rollout", "shard_env_batch",
]
