from .checkpoint import (load_checkpoint, load_msgpack, save_checkpoint,
                         save_msgpack)
from .optimizers import adam_l2, multistep_lr, negadam, step_lr
from .torch_init import torch_reinit
from .trainer import Trainer, relative_l2_loss

__all__ = [
    "load_checkpoint", "load_msgpack", "save_checkpoint", "save_msgpack",
    "adam_l2", "multistep_lr", "negadam", "step_lr", "torch_reinit",
    "Trainer", "relative_l2_loss",
]
