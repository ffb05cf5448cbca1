"""Map normalizers + 2-D softmax / cross-entropy.

Parity targets (tested against NumPy formulas in tests/test_normalize.py):
  * `tf_normalize_map` / `normalize_map`: per-map min-max to [0, 1]
    (`/root/reference/models/model_util.py:5-38`)
  * `normalize_probability_map`: per-map divide-by-sum
    (`models/model_util.py:40-58`)
  * `tf_softmax_2d` / `tf_softmax_cross_entropy_with_logits_2d`: softmax /
    xent over the flattened HxW grid (`models/model_util.py:61-72`)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_map(t: jax.Array) -> jax.Array:
    """Min-max normalize each H x W map to [0, 1].

    Accepts [..., H, W]; reduces over the last two axes. Matches the numpy
    reference which guards the divide when max == 0 after min-subtraction.
    """
    t = t - jnp.min(t, axis=(-2, -1), keepdims=True)
    mx = jnp.max(t, axis=(-2, -1), keepdims=True)
    return jnp.where(mx > 0, t / jnp.where(mx > 0, mx, 1.0), t)


def normalize_probability_map(t: jax.Array) -> jax.Array:
    """Normalize each H x W map to sum to 1 (`models/model_util.py:40-58`)."""
    s = jnp.sum(t, axis=(-2, -1), keepdims=True)
    return t / s


def softmax_2d(logits: jax.Array) -> jax.Array:
    """Softmax over the flattened last-two (H, W) axes (`tf_softmax_2d`)."""
    shape = logits.shape
    flat = logits.reshape(*shape[:-2], shape[-2] * shape[-1])
    return jax.nn.softmax(flat, axis=-1).reshape(shape)


def softmax_cross_entropy_2d(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-map softmax cross entropy over flattened H x W
    (`tf_softmax_cross_entropy_with_logits_2d`). Returns [...] (one scalar per
    leading index), like `tf.nn.softmax_cross_entropy_with_logits`."""
    shape = logits.shape
    n = shape[-2] * shape[-1]
    logits_flat = logits.reshape(*shape[:-2], n)
    labels_flat = labels.reshape(*shape[:-2], n)
    log_probs = jax.nn.log_softmax(logits_flat, axis=-1)
    return -jnp.sum(labels_flat * log_probs, axis=-1)


def kl_divergence_2d(pred_probs: jax.Array, label_probs: jax.Array,
                     eps: float = 1e-12) -> jax.Array:
    """KL(labels || pred) over flattened H x W maps.

    The reference's KLD branch is broken (`models/gaze_rnn.py:395-399` calls
    `tf.contrib.distributions.kl_divergence` on raw tensors, which raises);
    this is the working TPU-native implementation of the intended loss.
    """
    shape = pred_probs.shape
    n = shape[-2] * shape[-1]
    p = label_probs.reshape(*shape[:-2], n)
    q = pred_probs.reshape(*shape[:-2], n)
    return jnp.sum(p * (jnp.log(p + eps) - jnp.log(q + eps)), axis=-1)
