from .checkpoint import load_checkpoint, restore_into, save_checkpoint
from .distributed import initialize as distributed_initialize
from .distributed import local_batch_slice, make_global_batch
from .mesh import make_mesh, shard_batch, shard_params
from .metrics import JsonlWriter, MetricWriter, MultiWriter, StdoutWriter
from .optim import PlateauState, make_optimizer, plateau_init, plateau_update
from .trainer import (
    TrainState,
    data_init_from_batch,
    init_train_state,
    make_eval_step,
    make_train_step,
    train,
)

__all__ = [
    "load_checkpoint", "restore_into", "save_checkpoint",
    "distributed_initialize", "local_batch_slice", "make_global_batch",
    "make_mesh", "shard_batch", "shard_params",
    "JsonlWriter", "MetricWriter", "MultiWriter", "StdoutWriter",
    "PlateauState", "make_optimizer", "plateau_init", "plateau_update",
    "TrainState", "data_init_from_batch", "init_train_state",
    "make_eval_step", "make_train_step", "train",
]
