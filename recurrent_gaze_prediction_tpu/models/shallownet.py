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

# variant geometries:
#   default — saliency_shallownet.py:92-216 (32/64/32 convs, fc 4802, 49x49)
#   7x7     — 7x7shallownet.py:96-195 (64/128/128 convs, fc 98, 7x7 output)
VARIANTS = {
    "default": dict(widths=(32, 64, 32), fc_width=FC_WIDTH, out_hw=(49, 49)),
    "7x7": dict(widths=(64, 128, 128), fc_width=98, out_hw=(7, 7)),
}


def init_params(key: jax.Array, variant: str = "default",
                batch_norm: bool = False) -> dict:
    """`batch_norm=True` adds the BN scale/offset pairs of the
    `saliency_shallownet_nobatch.py` variant (BN after conv1/2/3 and fc1/2)."""
    geo = VARIANTS[variant]
    w1, w2, w3 = geo["widths"]
    fc_width = geo["fc_width"]
    flat_in = 11 * 11 * w3
    ks = jax.random.split(key, 5)
    params = {
        "conv1_w": init.xavier_uniform(ks[0], (5, 5, 3, w1)),
        "conv1_b": init.zeros((w1,)),
        "conv2_w": init.xavier_uniform(ks[1], (3, 3, w1, w2)),
        "conv2_b": init.zeros((w2,)),
        "conv3_w": init.xavier_uniform(ks[2], (3, 3, w2, w3)),
        "conv3_b": init.zeros((w3,)),
        "fc1_w": init.xavier_uniform(ks[3], (flat_in, fc_width)),
        "fc1_b": init.zeros((fc_width,)),
        "fc2_w": init.xavier_uniform(ks[4], (fc_width // 2, fc_width)),
        "fc2_b": init.zeros((fc_width,)),
    }
    if batch_norm:
        for name, dim in (("bn1", w1), ("bn2", w2), ("bn3", w3),
                          ("bn_fc1", fc_width), ("bn_fc2", fc_width)):
            params[f"{name}_scale"] = jnp.ones((dim,))
            params[f"{name}_offset"] = jnp.zeros((dim,))
    return params


def _batch_norm(x: jax.Array, params: dict, name: str,
                eps: float = 1e-3) -> jax.Array:
    """Current-batch-statistics BN with learnable scale/offset (the tflearn
    BN of the nobatch variant never wires moving averages correctly —
    `gaze_rnn.py:427` 'tflearn BN sucks'; batch stats are used here)."""
    if f"{name}_scale" not in params:
        return x
    axes = tuple(range(x.ndim - 1))
    mean = x.mean(axis=axes, keepdims=True)
    var = x.var(axis=axes, keepdims=True)
    norm = (x - mean) * jax.lax.rsqrt(var + eps)
    return norm * params[f"{name}_scale"] + params[f"{name}_offset"]


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
    out_cells = params["fc2_w"].shape[-1] // 2
    out_hw = {2401: (49, 49), 49: (7, 7)}[out_cells]

    x = conv2d(images, params["conv1_w"], padding="VALID",
               compute_dtype=compute_dtype) + params["conv1_b"]
    x = jax.nn.relu(_batch_norm(x, params, "bn1"))
    x = max_pool2d(x, 2, 2, "SAME")

    x = conv2d(x, params["conv2_w"], padding="VALID",
               compute_dtype=compute_dtype) + params["conv2_b"]
    x = jax.nn.relu(_batch_norm(x, params, "bn2"))
    x = max_pool2d(x, 3, 2, "SAME")

    x = conv2d(x, params["conv3_w"], padding="VALID",
               compute_dtype=compute_dtype) + params["conv3_b"]
    x = jax.nn.relu(_batch_norm(x, params, "bn3"))
    x = max_pool2d(x, 3, 2, "SAME")

    x = x.reshape(x.shape[0], -1)
    x = linear(x, params["fc1_w"], params["fc1_b"],
               compute_dtype=compute_dtype)
    x = jax.nn.relu(_batch_norm(x, params, "bn_fc1"))
    x = dropout(x, dropout_keep_prob, rng, deterministic=not train)
    x = maxout2(x)

    x = linear(x, params["fc2_w"], params["fc2_b"],
               compute_dtype=compute_dtype)
    x = jax.nn.relu(_batch_norm(x, params, "bn_fc2"))
    x = maxout2(x)
    return x.reshape(-1, *out_hw)


def l2_regularizer(params: dict) -> jax.Array:
    """1e-7 * sum of l2_loss over model vars
    (`saliency_shallownet.py:247`); tf.nn.l2_loss = sum(x^2)/2."""
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(params):
        total = total + 0.5 * jnp.sum(jnp.square(leaf))
    return 1e-7 * total
