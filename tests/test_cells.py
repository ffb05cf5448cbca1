"""Cell tests: fused-gate implementations must match a naive per-gate NumPy
implementation of the reference equations, and scan must equal step-by-step."""

import jax
import jax.numpy as jnp
import numpy as np

from recurrent_gaze_prediction_tpu.ops import ConvGRU, ConvLSTM, FlatGRU
from recurrent_gaze_prediction_tpu.ops.layers import conv2d
import pytest

# >60s on the virtual-CPU harness: deselected by default (pyproject addopts
# -m "not slow"); run everything with `pytest -m ""`.
pytestmark = pytest.mark.slow


def _np_conv_same(x, k):
    return np.asarray(conv2d(jnp.array(x), jnp.array(k), padding="SAME"))


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_convgru_step_matches_reference_equations():
    """Fused 3-conv step == naive 6-conv GRU-RCN (gaze_grcn.py:108-129)."""
    rng = np.random.RandomState(0)
    B, H, W, C, U = 2, 7, 7, 12, 8
    params = ConvGRU.init(jax.random.PRNGKey(0), C, U, stddev=0.5)
    params = {k: jnp.array(rng.randn(*v.shape).astype(np.float32)) * 0.3
              for k, v in params.items()}
    x = rng.randn(B, H, W, C).astype(np.float32)
    h = rng.randn(B, H, W, U).astype(np.float32)

    # naive reference equations
    u = _sigmoid(_np_conv_same(x, params["W_z"]) + _np_conv_same(h, params["U_z"]))
    r = _sigmoid(_np_conv_same(x, params["W_r"]) + _np_conv_same(h, params["U_r"]))
    c = np.tanh(_np_conv_same(x, params["W"]) + _np_conv_same(r * h, params["U"]))
    expected = u * h + (1 - u) * c

    fused = ConvGRU.fuse(params)
    new_h, y = ConvGRU.step(fused, jnp.array(h), jnp.array(x))
    np.testing.assert_allclose(np.asarray(new_h), expected, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(new_h), np.asarray(y))


def test_convgru_scan_equals_manual_unroll():
    rng = np.random.RandomState(1)
    B, T, H, W, C, U = 2, 5, 7, 7, 6, 4
    params = ConvGRU.init(jax.random.PRNGKey(1), C, U, stddev=0.3)
    xs = jnp.array(rng.randn(T, B, H, W, C).astype(np.float32))
    h0 = ConvGRU.zero_state(B, (H, W), U)

    final_h, ys = ConvGRU.scan(params, xs, h0)
    assert ys.shape == (T, B, H, W, U)

    # manual unroll
    fused = ConvGRU.fuse(params)
    h = h0
    for t in range(T):
        h, y = ConvGRU.step(fused, h, xs[t])
        np.testing.assert_allclose(np.asarray(ys[t]), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(final_h), np.asarray(h),
                               rtol=1e-5, atol=1e-6)


def test_convlstm_step_matches_reference_equations():
    """Fused step == naive peephole ConvLSTM with the reference's old-c output
    peephole (gaze_lstm.py:103-133, candidate bug fixed to use W_hc)."""
    rng = np.random.RandomState(2)
    B, H, W, C, U = 2, 7, 7, 5, 4
    params = ConvLSTM.init(jax.random.PRNGKey(2), C, U, (H, W))
    params = {k: jnp.array(rng.randn(*v.shape).astype(np.float32)) * 0.2
              for k, v in params.items()}
    x = rng.randn(B, H, W, C).astype(np.float32)
    c = rng.randn(B, H, W, U).astype(np.float32)
    h = rng.randn(B, H, W, U).astype(np.float32)

    i = _sigmoid(_np_conv_same(x, params["W_xi"]) +
                 _np_conv_same(h, params["W_hi"]) + np.asarray(params["W_ci"]) * c)
    f = _sigmoid(_np_conv_same(x, params["W_xf"]) +
                 _np_conv_same(h, params["W_hf"]) + np.asarray(params["W_cf"]) * c)
    new_c = f * c + i * np.tanh(_np_conv_same(x, params["W_xc"]) +
                                _np_conv_same(h, params["W_hc"]))
    o = _sigmoid(_np_conv_same(x, params["W_xo"]) +
                 _np_conv_same(h, params["W_ho"]) + np.asarray(params["W_co"]) * c)
    expected_h = np.tanh(new_c) * o

    fused = ConvLSTM.fuse(params)
    (out_c, out_h), y = ConvLSTM.step(fused, (jnp.array(c), jnp.array(h)),
                                      jnp.array(x))
    np.testing.assert_allclose(np.asarray(out_c), new_c, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_h), expected_h, rtol=1e-4,
                               atol=1e-5)


def test_flatgru_matches_tf_gru_equations():
    """TF GRUCell: [r,u]=sig([x,h]Wg+1.0), c=tanh([x,r*h]Wc), h'=u*h+(1-u)*c."""
    rng = np.random.RandomState(3)
    B, D, U = 3, 10, 6
    params = FlatGRU.init(jax.random.PRNGKey(3), D, U)
    x = rng.randn(B, D).astype(np.float32)
    h = rng.randn(B, U).astype(np.float32)

    gk = np.asarray(params["gates_kernel"])
    gb = np.asarray(params["gates_bias"])
    ck = np.asarray(params["candidate_kernel"])
    cb = np.asarray(params["candidate_bias"])
    assert gb.min() == gb.max() == 1.0  # TF gate bias init

    gates = _sigmoid(np.concatenate([x, h], -1) @ gk + gb)
    r, u = gates[:, :U], gates[:, U:]
    c = np.tanh(np.concatenate([x, r * h], -1) @ ck + cb)
    expected = u * h + (1 - u) * c

    new_h, _ = FlatGRU.step(params, jnp.array(h), jnp.array(x))
    np.testing.assert_allclose(np.asarray(new_h), expected, rtol=1e-4,
                               atol=1e-5)


def test_flatgru_scan_shapes():
    B, T, D, U = 2, 4, 8, 5
    params = FlatGRU.init(jax.random.PRNGKey(4), D, U)
    xs = jnp.zeros((T, B, D))
    h0 = FlatGRU.zero_state(B, U)
    final_h, ys = FlatGRU.scan(params, xs, h0)
    assert ys.shape == (T, B, U)
    assert final_h.shape == (B, U)


def test_convgru_orthogonal_gate_order_under_jit():
    """scan must be jittable and produce identical results."""
    params = ConvGRU.init(jax.random.PRNGKey(5), 4, 3)
    xs = jax.random.normal(jax.random.PRNGKey(6), (3, 2, 7, 7, 4))
    h0 = ConvGRU.zero_state(2, (7, 7), 3)
    eager_h, eager_ys = ConvGRU.scan(params, xs, h0)
    jit_h, jit_ys = jax.jit(lambda p, x, h: ConvGRU.scan(p, x, h))(params, xs, h0)
    np.testing.assert_allclose(np.asarray(eager_ys), np.asarray(jit_ys),
                               rtol=1e-5, atol=1e-6)
