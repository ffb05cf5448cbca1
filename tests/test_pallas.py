"""Pallas ConvGRU kernel parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from recurrent_gaze_prediction_tpu.ops.cells import ConvGRU, ConvLSTM
from recurrent_gaze_prediction_tpu.ops.pallas.convgru import (
    convgru_scan,
    convgru_scan_pallas,
)
from recurrent_gaze_prediction_tpu.ops.pallas.convlstm import convlstm_scan
import pytest

# >60s on the virtual-CPU harness: deselected by default (pyproject addopts
# -m "not slow"); run everything with `pytest -m ""`.
pytestmark = pytest.mark.slow


def test_pallas_convgru_matches_reference_scan():
    rng = np.random.RandomState(0)
    t, b, h, w, c, u = 5, 2, 7, 7, 12, 8
    params = ConvGRU.init(jax.random.PRNGKey(0), c, u, stddev=0.3)
    params = {k: jnp.array(rng.randn(*v.shape).astype(np.float32)) * 0.3
              for k, v in params.items()}
    xs = jnp.array(rng.randn(t, b, h, w, c).astype(np.float32))
    h0 = ConvGRU.zero_state(b, (h, w), u)

    ref_final, ref_ys = ConvGRU.scan(params, xs, h0)
    pl_final, pl_ys = convgru_scan(params, xs, h0,
                                   compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(pl_ys), np.asarray(ref_ys),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pl_final), np.asarray(ref_final),
                               rtol=1e-4, atol=1e-5)


def test_pallas_convlstm_matches_reference_scan():
    rng = np.random.RandomState(3)
    t, b, h, w, c, u = 4, 2, 7, 7, 6, 4
    params = ConvLSTM.init(jax.random.PRNGKey(2), c, u, (h, w))
    params = {k: jnp.array(rng.randn(*v.shape).astype(np.float32)) * 0.2
              for k, v in params.items()}
    xs = jnp.array(rng.randn(t, b, h, w, c).astype(np.float32))
    carry0 = ConvLSTM.zero_state(b, (h, w), u)

    (_, ref_h), ref_ys = ConvLSTM.scan(params, xs, carry0)
    (_, pl_h), pl_ys = convlstm_scan(params, xs, carry0,
                                     compute_dtype=jnp.float32,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(pl_ys), np.asarray(ref_ys),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pl_h), np.asarray(ref_h),
                               rtol=1e-4, atol=1e-5)


def test_pallas_convgru_custom_vjp_grads_match_scan():
    """Fused fwd+bwd kernels: gradients must match jax.grad of the scan."""
    from recurrent_gaze_prediction_tpu.ops.pallas.convgru_vjp import (
        convgru_scan_trainable,
    )

    rng = np.random.RandomState(7)
    t, b, h, w, cdim, u = 5, 2, 7, 7, 8, 4
    params = ConvGRU.init(jax.random.PRNGKey(0), cdim, u, stddev=0.3)
    params = {k: jnp.array(rng.randn(*v.shape).astype(np.float32)) * 0.3
              for k, v in params.items()}
    xs = jnp.array(rng.randn(t, b, h, w, cdim).astype(np.float32))
    h0 = ConvGRU.zero_state(b, (h, w), u)
    target = jnp.array(rng.randn(t, b, h, w, u).astype(np.float32))

    def loss_scan(p):
        _, ys = ConvGRU.scan(p, xs, h0)
        return jnp.sum((ys - target) ** 2)

    def loss_pallas(p):
        _, ys = convgru_scan_trainable(p, xs, h0,
                                       compute_dtype=jnp.float32,
                                       interpret=True)
        return jnp.sum((ys - target) ** 2)

    l1, g1 = jax.value_and_grad(loss_scan)(params)
    l2, g2 = jax.value_and_grad(loss_pallas)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g2[k]), np.asarray(g1[k]),
                                   rtol=1e-3, atol=1e-5, err_msg=k)


def test_pallas_convgru_vjp_v2_grads_match_scan():
    """Decomposed backward (XLA gate recompute + Pallas dh recursion +
    XLA weight grads) must also match jax.grad of the scan."""
    from recurrent_gaze_prediction_tpu.ops.pallas.convgru_vjp2 import (
        convgru_scan_trainable_v2,
    )

    rng = np.random.RandomState(9)
    t, b, h, w, cdim, u = 5, 2, 7, 7, 8, 4
    params = ConvGRU.init(jax.random.PRNGKey(0), cdim, u, stddev=0.3)
    params = {k: jnp.array(rng.randn(*v.shape).astype(np.float32)) * 0.3
              for k, v in params.items()}
    xs = jnp.array(rng.randn(t, b, h, w, cdim).astype(np.float32))
    h0 = ConvGRU.zero_state(b, (h, w), u)
    target = jnp.array(rng.randn(t, b, h, w, u).astype(np.float32))

    def loss_scan(p):
        _, ys = ConvGRU.scan(p, xs, h0)
        return jnp.sum((ys - target) ** 2)

    def loss_v2(p):
        _, ys = convgru_scan_trainable_v2(p, xs, h0,
                                          compute_dtype=jnp.float32,
                                          interpret=True)
        return jnp.sum((ys - target) ** 2)

    l1, g1 = jax.value_and_grad(loss_scan)(params)
    l2, g2 = jax.value_and_grad(loss_v2)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g2[k]), np.asarray(g1[k]),
                                   rtol=1e-3, atol=1e-5, err_msg=k)


def test_pallas_kernel_precomputed_inputs():
    """Kernel consumes precomputed Wx directly; state must thread through
    all steps (step t depends on step t-1)."""
    rng = np.random.RandomState(1)
    t, b, h, w, u = 4, 1, 7, 7, 4
    params = ConvGRU.init(jax.random.PRNGKey(1), 4, u, stddev=0.5)
    wx = jnp.array(rng.randn(t, b, h, w, 3 * u).astype(np.float32))
    h0 = jnp.zeros((b, h, w, u))

    ys = convgru_scan_pallas(params, wx, h0, interpret=True)
    assert ys.shape == (t, b, h, w, u)

    # manual unroll using step_precomputed
    fused = ConvGRU.fuse(params)
    hh = h0
    for i in range(t):
        hh, _ = ConvGRU.step_precomputed(fused, hh, wx[i])
        np.testing.assert_allclose(np.asarray(ys[i]), np.asarray(hh),
                                   rtol=1e-4, atol=1e-5)
