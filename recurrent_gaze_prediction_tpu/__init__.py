"""recurrent_gaze_prediction_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework
with the capabilities of yj-yu/Recurrent_Gaze_Prediction (CVPR 2017 RGP).

Layer map (mirrors SURVEY.md section 1, rebuilt TPU-first):
  config    — typed config tree (replaces BaseModelConfig/argparse/HParams)
  ops       — conv/deconv/pool/maxout layers, ConvGRU/ConvLSTM/FlatGRU cells
              under lax.scan, map normalizers (replaces models/basic ops)
  models    — gaze model zoo: shallownet, gaze_rnn(77), gaze_grcn(77),
              gaze_lstm, gaze_grcn_cascade, gaze_c3d_conv,
              gaze_framewise_shallownet, C3D feature extractor
  data      — clip datasets, gazemap preprocessing, seq2batch chunking,
              synthetic generators, blob codec
  train     — optax train step (jit, donated), train loop, orbax checkpoints
  eval      — saliency metrics (NumPy parity + batched on-device), evaluator
  parallel  — device mesh + NamedSharding data/model parallelism
"""

__version__ = "0.1.0"

from . import ops, utils
from .config import (
    ExperimentConfig,
    ModelConfig,
    OptimizerConfig,
    ShardingConfig,
    TrainSchedule,
)

__all__ = [
    "ops",
    "utils",
    "ExperimentConfig",
    "ModelConfig",
    "OptimizerConfig",
    "ShardingConfig",
    "TrainSchedule",
    "__version__",
]
