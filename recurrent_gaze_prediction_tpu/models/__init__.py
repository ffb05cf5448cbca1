from . import (
    common,
    gaze_c3d_conv,
    gaze_framewise_shallownet,
    gaze_grcn,
    gaze_grcn_cascade,
    gaze_lstm,
    gaze_rnn,
    shallownet,
)
from .common import GazeModel, sequence_loss

__all__ = [
    "common",
    "shallownet",
    "gaze_rnn",
    "gaze_grcn",
    "gaze_lstm",
    "gaze_grcn_cascade",
    "gaze_c3d_conv",
    "gaze_framewise_shallownet",
    "GazeModel",
    "sequence_loss",
]
