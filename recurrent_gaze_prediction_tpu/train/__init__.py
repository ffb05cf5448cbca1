from . import schedules
from .checkpoint import (
    Checkpointer,
    load_params,
    restore_shallownet,
    save_params,
)
from .loop import fit
from .state import (
    TrainState,
    build_optimizer,
    build_schedule,
    create_train_state,
    flip_half_batch,
    make_eval_step,
    make_predict_fn,
    make_train_step,
)

__all__ = [
    "schedules",
    "TrainState",
    "create_train_state",
    "build_optimizer",
    "build_schedule",
    "flip_half_batch",
    "make_train_step",
    "make_eval_step",
    "make_predict_fn",
    "fit",
    "Checkpointer",
    "save_params",
    "load_params",
    "restore_shallownet",
]
