"""ShallowNet — the Pan et al. (CVPR 2016) shallow saliency ConvNet.

TPU-native rebuild of `SaliencyModel.create_shallownet`
(`/root/reference/models/saliency_shallownet.py:74-216`):

    98x98x3 -> conv 5x5x32 VALID + relu -> maxpool 2/2 SAME      (94 -> 47)
            -> conv 3x3x64 VALID + relu -> maxpool 3/2 SAME      (45 -> 23)
            -> conv 3x3x32 VALID + relu -> maxpool 3/2 SAME      (21 -> 11)
            -> fc 4802 + relu (+ dropout) -> maxout/2 -> 2401
            -> fc 4802 + relu            -> maxout/2 -> 2401
            -> reshape [49, 49]

Xavier-uniform weights, zero biases. Pure function over an explicit params
pytree; the convs/matmuls run in `compute_dtype` (bf16 on TPU) with fp32
accumulation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import initializers as init
from ..ops.layers import conv2d, dropout, linear, max_pool2d, maxout2

FC_WIDTH = 4802          # maxout halves this to 2401 = 49 * 49
FLAT_IN = 11 * 11 * 32   # pool3 output


def init_params(key: jax.Array) -> dict:
    ks = jax.random.split(key, 5)
    return {
        "conv1_w": init.xavier_uniform(ks[0], (5, 5, 3, 32)),
        "conv1_b": init.zeros((32,)),
        "conv2_w": init.xavier_uniform(ks[1], (3, 3, 32, 64)),
        "conv2_b": init.zeros((64,)),
        "conv3_w": init.xavier_uniform(ks[2], (3, 3, 64, 32)),
        "conv3_b": init.zeros((32,)),
        "fc1_w": init.xavier_uniform(ks[3], (FLAT_IN, FC_WIDTH)),
        "fc1_b": init.zeros((FC_WIDTH,)),
        "fc2_w": init.xavier_uniform(ks[4], (FC_WIDTH // 2, FC_WIDTH)),
        "fc2_b": init.zeros((FC_WIDTH,)),
    }


def apply(params: dict, images: jax.Array, *,
          dropout_keep_prob: float = 1.0,
          rng: Optional[jax.Array] = None,
          train: bool = False,
          compute_dtype=None) -> jax.Array:
    """images [B, 98, 98, 3] -> saliency [B, 49, 49].

    Dropout (keep 0.4 in the reference's standalone training,
    `saliency_shallownet.py:330`) applies after fc1-relu only, and is
    disabled when ShallowNet runs inside the gaze models
    (`models/gaze_rnn.py:256-260` passes dropout=False).
    """
    assert images.ndim == 4, images.shape
    x = conv2d(images, params["conv1_w"], padding="VALID",
               compute_dtype=compute_dtype) + params["conv1_b"]
    x = jax.nn.relu(x)
    x = max_pool2d(x, 2, 2, "SAME")

    x = conv2d(x, params["conv2_w"], padding="VALID",
               compute_dtype=compute_dtype) + params["conv2_b"]
    x = jax.nn.relu(x)
    x = max_pool2d(x, 3, 2, "SAME")

    x = conv2d(x, params["conv3_w"], padding="VALID",
               compute_dtype=compute_dtype) + params["conv3_b"]
    x = jax.nn.relu(x)
    x = max_pool2d(x, 3, 2, "SAME")

    x = x.reshape(x.shape[0], -1)
    x = jax.nn.relu(linear(x, params["fc1_w"], params["fc1_b"],
                           compute_dtype=compute_dtype))
    x = dropout(x, dropout_keep_prob, rng, deterministic=not train)
    x = maxout2(x)

    x = jax.nn.relu(linear(x, params["fc2_w"], params["fc2_b"],
                           compute_dtype=compute_dtype))
    x = maxout2(x)
    return x.reshape(-1, 49, 49)


def l2_regularizer(params: dict) -> jax.Array:
    """1e-7 * sum of l2_loss over model vars
    (`saliency_shallownet.py:247`); tf.nn.l2_loss = sum(x^2)/2."""
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(params):
        total = total + 0.5 * jnp.sum(jnp.square(leaf))
    return 1e-7 * total
