from icl_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    param_shardings,
    replicated,
    shard_state,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "param_shardings",
    "replicated",
    "shard_state",
]
