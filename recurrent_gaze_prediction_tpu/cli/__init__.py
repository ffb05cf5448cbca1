from . import (
    evaluate_gaze,
    extract_map,
    pretrain_shallownet,
    process_gazemap,
    train_gaze,
)

__all__ = [
    "train_gaze",
    "evaluate_gaze",
    "extract_map",
    "pretrain_shallownet",
    "process_gazemap",
]
