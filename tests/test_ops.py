"""Shape/value tests for the ops layer against NumPy ground truth and the
reference's documented shape chains."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recurrent_gaze_prediction_tpu.ops import (
    avg_pool2d,
    conv2d,
    conv2d_transpose,
    dropout,
    frozen_batch_norm,
    kl_divergence_2d,
    linear,
    max_pool2d,
    maxout2,
    normalize_map,
    normalize_probability_map,
    softmax_2d,
    softmax_cross_entropy_2d,
)


def test_shallownet_shape_chain():
    """98 -> 94 -> 47 -> 45 -> 23 -> 21 -> 11 per saliency_shallownet.py:92-138."""
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 98, 98, 3))
    k1 = jax.random.normal(key, (5, 5, 3, 32)) * 0.01
    c1 = conv2d(x, k1, padding="VALID")
    assert c1.shape == (2, 94, 94, 32)
    p1 = max_pool2d(c1, 2, 2, "SAME")
    assert p1.shape == (2, 47, 47, 32)
    k2 = jax.random.normal(key, (3, 3, 32, 64)) * 0.01
    c2 = conv2d(p1, k2, padding="VALID")
    assert c2.shape == (2, 45, 45, 64)
    p2 = max_pool2d(c2, 3, 2, "SAME")
    assert p2.shape == (2, 23, 23, 64)
    k3 = jax.random.normal(key, (3, 3, 64, 32)) * 0.01
    c3 = conv2d(p2, k3, padding="VALID")
    assert c3.shape == (2, 21, 21, 32)
    p3 = max_pool2d(c3, 3, 2, "SAME")
    assert p3.shape == (2, 11, 11, 32)


def test_grcn_decoder_deconv_chain():
    """7 ->(k5,s3,VALID) 23 ->(k5,s2,VALID) 49 ->(k7,s1,SAME) 49
    per gaze_grcn.py:326-358."""
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((3, 7, 7, 128))
    d1 = conv2d_transpose(x, jax.random.normal(key, (5, 5, 128, 64)) * 0.01,
                          stride=3, padding="VALID")
    assert d1.shape == (3, 23, 23, 64)
    d2 = conv2d_transpose(d1, jax.random.normal(key, (5, 5, 64, 32)) * 0.01,
                          stride=2, padding="VALID")
    assert d2.shape == (3, 49, 49, 32)
    d3 = conv2d_transpose(d2, jax.random.normal(key, (7, 7, 32, 12)) * 0.01,
                          stride=1, padding="SAME")
    assert d3.shape == (3, 49, 49, 12)


def test_conv2d_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 8, 8, 2).astype(np.float32)
    k = rng.randn(3, 3, 2, 4).astype(np.float32)
    out = np.asarray(conv2d(jnp.array(x), jnp.array(k), padding="VALID"))
    # naive numpy conv
    expected = np.zeros((1, 6, 6, 4), np.float32)
    for i in range(6):
        for j in range(6):
            patch = x[0, i:i + 3, j:j + 3, :]
            expected[0, i, j, :] = np.tensordot(patch, k, axes=([0, 1, 2],
                                                                [0, 1, 2]))
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_avg_pool_49_to_7():
    """49x49 -> 7x7 avg pool (gaze_rnn.py:262-269 downsampling path)."""
    x = jnp.ones((2, 49, 49, 1))
    out = avg_pool2d(x, 7, 7, "VALID")
    assert out.shape == (2, 7, 7, 1)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)


def test_maxout2():
    x = jnp.array([[1.0, 5.0, 3.0, 2.0]])  # halves: [1,5] vs [3,2]
    out = np.asarray(maxout2(x))
    np.testing.assert_array_equal(out, [[3.0, 5.0]])


def test_linear_matches_numpy():
    rng = np.random.RandomState(1)
    x = rng.randn(4, 10).astype(np.float32)
    w = rng.randn(10, 3).astype(np.float32)
    b = rng.randn(3).astype(np.float32)
    out = np.asarray(linear(jnp.array(x), jnp.array(w), jnp.array(b)))
    np.testing.assert_allclose(out, x @ w + b, rtol=1e-5, atol=1e-5)


def test_dropout_train_and_eval():
    x = jnp.ones((1000,))
    out_eval = dropout(x, 0.5, None, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(x))
    out_train = np.asarray(dropout(x, 0.5, jax.random.PRNGKey(0),
                                   deterministic=False))
    kept = out_train != 0
    assert 300 < kept.sum() < 700  # ~50% kept
    np.testing.assert_allclose(out_train[kept], 2.0)  # scaled by 1/keep


def test_frozen_batch_norm_is_affine():
    """Reference BN runs in inference mode with untrained moving stats
    (gaze_grcn.py:325): y = x * scale / sqrt(1 + eps) + offset."""
    x = jnp.array([[1.0, -2.0]])
    scale = jnp.array([2.0, 2.0])
    offset = jnp.array([1.0, 1.0])
    out = np.asarray(frozen_batch_norm(x, scale, offset, eps=1e-3))
    expected = x * 2.0 / np.sqrt(1.001) + 1.0
    np.testing.assert_allclose(out, np.asarray(expected), rtol=1e-6)


# ---------------------------------------------------------------- normalize

def _np_normalize_map(t):
    """NumPy reference: models/model_util.py:20-38."""
    t = np.array(t, copy=True)
    for i in range(len(t)):
        t[i] -= t[i].min()
        if t[i].max() > 0:
            t[i] /= t[i].max()
    return t


def _np_normalize_probability_map(t):
    """NumPy reference: models/model_util.py:40-58."""
    t = np.array(t, copy=True)
    for i in range(len(t)):
        t[i] /= t[i].sum()
    return t


def test_normalize_map_parity():
    rng = np.random.RandomState(2)
    t = rng.rand(5, 7, 7).astype(np.float32) * 10 - 3
    np.testing.assert_allclose(np.asarray(normalize_map(jnp.array(t))),
                               _np_normalize_map(t), rtol=1e-5, atol=1e-6)


def test_normalize_probability_map_parity():
    rng = np.random.RandomState(3)
    t = rng.rand(5, 7, 7).astype(np.float32) + 0.1
    np.testing.assert_allclose(
        np.asarray(normalize_probability_map(jnp.array(t))),
        _np_normalize_probability_map(t), rtol=1e-5, atol=1e-6)


def test_softmax_2d_sums_to_one():
    rng = np.random.RandomState(4)
    logits = jnp.array(rng.randn(3, 7, 7).astype(np.float32))
    probs = np.asarray(softmax_2d(logits))
    np.testing.assert_allclose(probs.reshape(3, -1).sum(-1), 1.0, rtol=1e-5)


def test_softmax_xent_2d_matches_manual():
    rng = np.random.RandomState(5)
    logits = rng.randn(2, 4, 4).astype(np.float32)
    labels = rng.rand(2, 4, 4).astype(np.float32)
    labels /= labels.reshape(2, -1).sum(-1)[:, None, None]
    out = np.asarray(softmax_cross_entropy_2d(jnp.array(logits),
                                              jnp.array(labels)))
    lf = logits.reshape(2, -1)
    log_probs = lf - np.log(np.exp(lf - lf.max(-1, keepdims=True)).sum(
        -1, keepdims=True)) - lf.max(-1, keepdims=True)
    expected = -(labels.reshape(2, -1) * log_probs).sum(-1)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_kl_divergence_zero_for_identical():
    p = jnp.full((1, 4, 4), 1.0 / 16.0)
    kl = np.asarray(kl_divergence_2d(p, p))
    np.testing.assert_allclose(kl, 0.0, atol=1e-6)


