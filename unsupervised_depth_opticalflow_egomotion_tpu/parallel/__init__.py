from .mesh import (
    batch_sharding,
    distributed_init,
    local_replica,
    make_global_batch,
    make_mesh,
    replicated,
    shard_batch,
)
from .train_step import TrainState, build_model, init_state, make_optimizer, make_train_step

__all__ = [
    "batch_sharding",
    "distributed_init",
    "local_replica",
    "make_global_batch",
    "make_mesh",
    "replicated",
    "shard_batch",
    "TrainState",
    "build_model",
    "init_state",
    "make_optimizer",
    "make_train_step",
]
