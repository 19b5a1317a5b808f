from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    lavila_param_sharding,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "lavila_param_sharding",
    "make_mesh",
    "replicated",
    "shard_batch",
]
