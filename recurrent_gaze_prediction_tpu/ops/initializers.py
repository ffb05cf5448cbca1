"""Parameter initializers matching the reference's per-layer init recipes.

The reference mixes several init families (SURVEY.md section 7 "hard parts"):
  * truncated-normal stddev=1e-4 for ConvGRU/ConvLSTM kernels
    (`/root/reference/models/gaze_grcn.py:64-81`, `models/gaze_lstm.py:64-88`)
  * Xavier-uniform for conv / deconv / fc layers
    (`models/saliency_shallownet.py:97,112,145`, `models/gaze_grcn.py:292-310`)
  * uniform(-0.1, 0.1) for projection matrices
    (`models/gaze_grcn.py:234-237,311-314`)
  * orthogonal for the flat GRU kernel (`models/gaze_rnn.py:315`)

Fan computation follows TF's `_compute_fans`: receptive_field = prod of all
dims except the last two; fan_in = shape[-2] * rf, fan_out = shape[-1] * rf.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def _fans(shape: Sequence[int]) -> tuple[float, float]:
    if len(shape) < 1:
        return 1.0, 1.0
    if len(shape) == 1:
        return float(shape[0]), float(shape[0])
    receptive = 1
    for dim in shape[:-2]:
        receptive *= dim
    return float(shape[-2] * receptive), float(shape[-1] * receptive)


def xavier_uniform(key: jax.Array, shape: Sequence[int],
                   dtype=jnp.float32) -> jax.Array:
    """TF `xavier_initializer(_conv2d)(uniform=True)` equivalent."""
    fan_in, fan_out = _fans(shape)
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def truncated_normal(key: jax.Array, shape: Sequence[int], stddev: float = 1e-4,
                     dtype=jnp.float32) -> jax.Array:
    """TF `tf.truncated_normal`: normal truncated at 2 sigma."""
    return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def uniform_scale(key: jax.Array, shape: Sequence[int], scale: float = 0.1,
                  dtype=jnp.float32) -> jax.Array:
    """`tf.random_uniform([-scale, scale])` used for projection weights."""
    return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)


def orthogonal(key: jax.Array, shape: Sequence[int],
               dtype=jnp.float32) -> jax.Array:
    """Orthogonal init for 2-D kernels (flat GRU, `models/gaze_rnn.py:315`)."""
    if len(shape) != 2:
        raise ValueError(f"orthogonal init expects 2-D shape, got {shape}")
    return jax.nn.initializers.orthogonal()(key, shape, dtype)


def zeros(shape: Sequence[int], dtype=jnp.float32) -> jax.Array:
    return jnp.zeros(shape, dtype)


def constant(value: float, shape: Sequence[int], dtype=jnp.float32) -> jax.Array:
    return jnp.full(shape, value, dtype)
