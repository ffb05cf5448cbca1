"""Model-zoo tests: every registry model builds, runs forward with the right
shapes, produces a finite loss, and is differentiable."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recurrent_gaze_prediction_tpu import registry
from recurrent_gaze_prediction_tpu.models import shallownet
from recurrent_gaze_prediction_tpu.utils import param_count

# >60s on the virtual-CPU harness: deselected by default (pyproject addopts
# -m "not slow"); run everything with `pytest -m ""`.
pytestmark = pytest.mark.slow

# tiny geometry for CPU tests
B, T = 2, 3
ALL_MODELS = registry.available_models()


def _tiny_batch(gh, gw, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "frames": jnp.array(rng.rand(B, T, 98, 98, 3).astype(np.float32)),
        "c3d": jnp.array(rng.rand(B, T, 1024, 7, 7).astype(np.float32)),
        "gazemaps": jnp.array(
            rng.rand(B, T, gh, gw).astype(np.float32) + 0.01),
        "pupils": jnp.array(rng.rand(B, T).astype(np.float32)),
    }


def _build(name):
    # float32 compute on CPU tests for numerical checks
    return registry.create_model(name, n_lstm_steps=T, batch_size=B,
                                 compute_dtype="float32")


def test_registry_lists_all_reference_models():
    expected = {"gaze_rnn", "gaze_rnn77", "gaze_grcn", "gaze_grcn77",
                "gaze_lstm", "gaze_grcn_cascade", "gaze_c3d_conv",
                "gaze_framewise_shallownet",
                "gaze_pupil_grcn", "gaze_pupil_gru2"}
    assert expected == set(ALL_MODELS)


def test_shallownet_variants():
    p7 = shallownet.init_params(jax.random.PRNGKey(0), variant="7x7")
    out = shallownet.apply(p7, jnp.zeros((2, 98, 98, 3)))
    assert out.shape == (2, 7, 7)
    pbn = shallownet.init_params(jax.random.PRNGKey(1), batch_norm=True)
    assert "bn1_scale" in pbn
    out = shallownet.apply(pbn, jnp.ones((2, 98, 98, 3)))
    assert out.shape == (2, 49, 49)
    assert np.isfinite(np.asarray(out)).all()


def test_pupil_models_loss_includes_pupil_term():
    for name in ("gaze_pupil_grcn", "gaze_pupil_gru2"):
        model = registry.create_model(name, n_lstm_steps=T, batch_size=B,
                                      compute_dtype="float32",
                                      rnn_state_size=16)
        params = model.init(jax.random.PRNGKey(0))
        batch = _tiny_batch(7, 7)
        batch["pupils"] = jnp.ones((B, T))
        loss, aux = model.loss(params, batch, train=False)
        assert np.isfinite(float(loss)), name
        assert "pupil" in aux, name
        assert aux["pupil"].shape == (B, T), name
        # gradient flows through both heads
        grads = jax.grad(lambda p: model.loss(p, batch, train=False)[0])(
            params)
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree_util.tree_leaves(grads)), name


@pytest.mark.parametrize("name", ALL_MODELS)
def test_forward_shape_and_loss(name):
    model = _build(name)
    gh, gw = model.cfg.gazemap_height, model.cfg.gazemap_width
    params = model.init(jax.random.PRNGKey(0))
    batch = _tiny_batch(gh, gw)

    logits = model.apply(params, batch["frames"], batch["c3d"], train=False)
    assert logits.shape == (B, T, gh, gw), name
    assert np.isfinite(np.asarray(logits)).all(), name

    loss, aux = model.loss(params, batch, train=False)
    assert np.isfinite(float(loss)), name

    # train mode with dropout rng
    loss_t, _ = model.loss(params, batch, train=True,
                           rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss_t)), name


@pytest.mark.parametrize("name", ["gaze_grcn", "gaze_rnn"])
def test_gradients_flow(name):
    model = _build(name)
    gh, gw = model.cfg.gazemap_height, model.cfg.gazemap_width
    params = model.init(jax.random.PRNGKey(0))
    batch = _tiny_batch(gh, gw)

    def loss_fn(p):
        return model.loss(p, batch, train=False)[0]

    grads = jax.grad(loss_fn)(params)
    norms = [float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert max(norms) > 0  # something learns


def test_predict_is_probability_for_xentropy():
    model = _build("gaze_grcn")
    assert model.cfg.loss_type == "xentropy"
    params = model.init(jax.random.PRNGKey(0))
    batch = _tiny_batch(49, 49)
    probs = model.predict(params, batch["frames"], batch["c3d"])
    sums = np.asarray(probs).reshape(B * T, -1).sum(-1)
    np.testing.assert_allclose(sums, 1.0, rtol=1e-4)


def test_shallownet_standalone_shape_and_param_count():
    params = shallownet.init_params(jax.random.PRNGKey(0))
    out = shallownet.apply(params, jnp.zeros((4, 98, 98, 3)))
    assert out.shape == (4, 49, 49)
    # conv params + fc1 (3872*4802) + fc2 (2401*4802)
    expected = (5 * 5 * 3 * 32 + 32 + 3 * 3 * 32 * 64 + 64 +
                3 * 3 * 64 * 32 + 32 + 3872 * 4802 + 4802 +
                2401 * 4802 + 4802)
    assert param_count(params) == expected


def test_model_defaults_match_reference():
    m = registry.create_model("gaze_rnn77")
    assert (m.cfg.gazemap_height, m.cfg.gazemap_width) == (7, 7)
    assert m.cfg.n_lstm_steps == 35
    assert m.cfg.loss_type == "l2"
    m2 = registry.create_model("gaze_grcn")
    assert m2.cfg.dim_cnn_proj == 512
    assert m2.cfg.rnn_state_size == 128
    assert m2.cfg.loss_type == "xentropy"


def test_grcn_jit_forward():
    model = _build("gaze_grcn")
    params = model.init(jax.random.PRNGKey(0))
    batch = _tiny_batch(49, 49)
    f = jax.jit(lambda p, fr, c3: model.apply(p, fr, c3, train=False))
    out1 = f(params, batch["frames"], batch["c3d"])
    out2 = model.apply(params, batch["frames"], batch["c3d"], train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=2e-4, atol=2e-5)


def test_sequence_loss_frame_mask_excludes_padding():
    """Masked loss ignores padded frames and normalizes by valid count."""
    from recurrent_gaze_prediction_tpu.models.common import sequence_loss

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 4, 7, 7).astype(np.float32))
    gt = jnp.asarray(rng.rand(2, 4, 7, 7).astype(np.float32))
    gt = gt / gt.sum(axis=(-2, -1), keepdims=True)

    # corrupt the last frame of each clip; mask should make it irrelevant
    bad = logits.at[:, -1].set(1e3)
    mask = jnp.asarray([[1, 1, 1, 0], [1, 1, 1, 0]], np.float32)
    for lt in ("l2", "xentropy", "kld"):
        masked_clean = float(sequence_loss(logits, gt, lt, frame_mask=mask))
        masked_bad = float(sequence_loss(bad, gt, lt, frame_mask=mask))
        np.testing.assert_allclose(masked_clean, masked_bad, rtol=1e-6)
        # unmasked differs (padded frames contribute, like the reference)
        assert float(sequence_loss(bad, gt, lt)) != pytest.approx(
            float(sequence_loss(logits, gt, lt)))
    # masked loss == unmasked loss over only the valid prefix
    np.testing.assert_allclose(
        float(sequence_loss(logits, gt, "l2", frame_mask=mask)),
        float(sequence_loss(logits[:, :3], gt[:, :3], "l2")), rtol=1e-6)


def test_linearized_decoder_matches_stagewise():
    """round-3: the decoder runs as ONE composed [6272,2401] matmul
    (models/common._decoder_matrix); it must match the literal 3-deconv
    reference formulation exactly (incl. the frozen-BN fold), and so must
    its gradients wrt the ORIGINAL kernels."""
    from recurrent_gaze_prediction_tpu.models import common

    rng = np.random.RandomState(1)
    key = jax.random.PRNGKey(0)
    params = common.init_decoder(key, 128, with_batch_norm=True)
    params["bn_scale"] = jnp.asarray(
        rng.rand(128).astype(np.float32) + 0.5)
    params["bn_offset"] = jnp.asarray(
        rng.randn(128).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.randn(4, 7, 7, 128).astype(np.float32))

    a = common.apply_decoder_stagewise(params, x, keep_prob=1.0, rng=None,
                                       train=False)
    b = common.apply_decoder_composed(params, x, keep_prob=1.0, rng=None,
                                      train=False)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-5, atol=1e-5)

    # the public entry dispatches on N: small N -> stagewise (per-call
    # composition would exceed the useful work), large N -> composed
    small = common.apply_decoder(params, x, keep_prob=1.0, rng=None,
                                 train=False)
    np.testing.assert_array_equal(np.asarray(small), np.asarray(a))
    xl = jnp.tile(x, (common._COMPOSE_MIN_N // 4, 1, 1, 1))
    large = common.apply_decoder(params, xl, keep_prob=1.0, rng=None,
                                 train=False)
    # allclose, not equal: a wider N picks a different matmul tiling
    np.testing.assert_allclose(np.asarray(large[:4]), np.asarray(b),
                               rtol=1e-5, atol=1e-5)

    def loss_stage(p):
        out = common.apply_decoder_stagewise(p, x, keep_prob=1.0, rng=None,
                                             train=False)
        return (out ** 2).sum()

    def loss_lin(p):
        out = common.apply_decoder_composed(p, x, keep_prob=1.0, rng=None,
                                            train=False)
        return (out ** 2).sum()

    ga = jax.grad(loss_stage)(params)
    gb = jax.grad(loss_lin)(params)
    for k in ga:
        np.testing.assert_allclose(np.asarray(gb[k]), np.asarray(ga[k]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)
