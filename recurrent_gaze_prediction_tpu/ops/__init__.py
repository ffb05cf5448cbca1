from . import initializers
from .cells import ConvGRU, ConvLSTM, FlatGRU
from .layers import (
    avg_pool2d,
    conv2d,
    conv2d_transpose,
    conv3d,
    dropout,
    frozen_batch_norm,
    linear,
    max_pool2d,
    max_pool3d,
    maxout2,
)
from .normalize import (
    kl_divergence_2d,
    normalize_map,
    normalize_probability_map,
    softmax_2d,
    softmax_cross_entropy_2d,
)

__all__ = [
    "initializers",
    "ConvGRU",
    "ConvLSTM",
    "FlatGRU",
    "conv2d",
    "conv2d_transpose",
    "conv3d",
    "max_pool2d",
    "avg_pool2d",
    "max_pool3d",
    "linear",
    "maxout2",
    "dropout",
    "frozen_batch_norm",
    "normalize_map",
    "normalize_probability_map",
    "softmax_2d",
    "softmax_cross_entropy_2d",
    "kl_divergence_2d",
]
