from .optimizer import (GROUPS, GroupLRs, ReduceLROnPlateau,
                        build_gradient_transform, group_index_tree)
from .train_step import (DynamicScalars, TrainState, compute_losses,
                         make_eval_step, make_train_step)
from .trainer import SmartContractTrainer
from .checkpoint import (checkpoint_suffix, find_checkpoint, load_checkpoint,
                         save_checkpoint)

__all__ = [
    "GROUPS",
    "GroupLRs",
    "ReduceLROnPlateau",
    "build_gradient_transform",
    "group_index_tree",
    "DynamicScalars",
    "TrainState",
    "compute_losses",
    "make_eval_step",
    "make_train_step",
    "SmartContractTrainer",
    "checkpoint_suffix",
    "find_checkpoint",
    "load_checkpoint",
    "save_checkpoint",
]
