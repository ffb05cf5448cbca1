"""Network-level golden tests: full model forwards re-implemented in plain
NumPy (independent of the ops layer) and compared against the framework.

Per-op tests pin individual pieces; these pin the COMPOSITION — projection
order, gate wiring, BN placement, deconv geometry, head reshape — of the
flagship models end to end at fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np

from recurrent_gaze_prediction_tpu import registry
from recurrent_gaze_prediction_tpu.models import shallownet
import pytest

# >60s on the virtual-CPU harness: deselected by default (pyproject addopts
# -m "not slow"); run everything with `pytest -m ""`.
pytestmark = pytest.mark.slow


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _np_conv_same(x, k):
    """[B,H,W,Cin] x [kh,kw,Cin,Cout], stride 1, SAME, pure NumPy."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = k.shape
    ph, pw = kh // 2, kw // 2
    xp = np.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    out = np.zeros((b, h, w, cout), np.float64)
    for dy in range(kh):
        for dx in range(kw):
            patch = xp[:, dy:dy + h, dx:dx + w, :]
            out += patch @ k[dy, dx]
    return out


def _np_conv_valid(x, k):
    b, h, w, cin = x.shape
    kh, kw, _, cout = k.shape
    oh, ow = h - kh + 1, w - kw + 1
    out = np.zeros((b, oh, ow, cout), np.float64)
    for dy in range(kh):
        for dx in range(kw):
            out += x[:, dy:dy + oh, dx:dx + ow, :] @ k[dy, dx]
    return out


def _np_deconv(x, k, stride, padding):
    """conv_transpose semantics of ops.layers.conv2d_transpose: scatter each
    input pixel's SPATIALLY FLIPPED kernel patch at i*stride; VALID keeps
    the full (in-1)*s + k output, SAME center-crops to in*s. (Verified
    empirically: lax.conv_transpose(transpose_kernel=False) == scatter of
    k[::-1, ::-1].)"""
    k = k[::-1, ::-1]
    b, h, w, cin = x.shape
    kh, kw, _, cout = k.shape
    fh, fw = (h - 1) * stride + kh, (w - 1) * stride + kw
    out = np.zeros((b, fh, fw, cout), np.float64)
    for i in range(h):
        for j in range(w):
            patch = np.einsum("bc,yxco->byxo", x[:, i, j, :], k)
            out[:, i * stride:i * stride + kh,
                j * stride:j * stride + kw, :] += patch
    if padding == "SAME":
        th, tw = h * stride, w * stride
        fr = (fh - th) // 2
        fc = (fw - tw) // 2
        out = out[:, fr:fr + th, fc:fc + tw, :]
    return out


def _np_maxpool_same(x, win, stride):
    b, h, w, c = x.shape
    oh = -(-h // stride)
    ow = -(-w // stride)
    pad_h = max((oh - 1) * stride + win - h, 0)
    pad_w = max((ow - 1) * stride + win - w, 0)
    xp = np.pad(x, ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
                    (pad_w // 2, pad_w - pad_w // 2), (0, 0)),
                constant_values=-np.inf)
    out = np.zeros((b, oh, ow, c), np.float64)
    for i in range(oh):
        for j in range(ow):
            out[:, i, j, :] = xp[:, i * stride:i * stride + win,
                                 j * stride:j * stride + win, :].max((1, 2))
    return out


def test_gaze_grcn_full_forward_golden():
    """projection -> ConvGRU x T -> frozen BN -> 3 deconvs -> 12->1 head."""
    b, t = 2, 3
    model = registry.create_model("gaze_grcn", n_lstm_steps=t, batch_size=b,
                                  compute_dtype="float32",
                                  dim_cnn_proj=24, rnn_state_size=12)
    rng = np.random.RandomState(0)
    params = model.init(jax.random.PRNGKey(0))
    # randomize so nothing is accidentally zero
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.randn(*x.shape).astype(np.float32) * 0.2),
        params)
    c3d = rng.rand(b, t, 1024, 7, 7).astype(np.float32)
    frames = np.zeros((b, t, 98, 98, 3), np.float32)

    got = np.asarray(model.apply(params, jnp.asarray(frames),
                                 jnp.asarray(c3d), train=False))

    p = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), params)
    units = 12
    # projection: [B,T,1024,7,7] -> channels-last -> 1024->proj (+bias)
    x = np.transpose(c3d.astype(np.float64), (0, 1, 3, 4, 2))
    emb = x @ p["c3d_proj"]["proj_c3d_W"] + p["c3d_proj"]["proj_c3d_b"]

    h = np.zeros((b, 7, 7, units))
    hs = []
    cp = p["cell"]
    for step in range(t):
        xt = emb[:, step]
        u = _sigmoid(_np_conv_same(xt, cp["W_z"]) + _np_conv_same(h, cp["U_z"]))
        r = _sigmoid(_np_conv_same(xt, cp["W_r"]) + _np_conv_same(h, cp["U_r"]))
        c = np.tanh(_np_conv_same(xt, cp["W"]) + _np_conv_same(r * h, cp["U"]))
        h = u * h + (1 - u) * c
        hs.append(h)

    dp = p["decoder"]
    maps = []
    for step in range(t):
        y = hs[step]
        y = y * (dp["bn_scale"] / np.sqrt(1.001)) + dp["bn_offset"]
        y = _np_deconv(y, dp["up1_w"], 3, "VALID")
        y = _np_deconv(y, dp["up2_w"], 2, "VALID")
        y = _np_deconv(y, dp["up3_w"], 1, "SAME")
        y = y.reshape(-1, 12) @ dp["out_W"] + dp["out_b"]
        maps.append(y.reshape(b, 49, 49))
    expected = np.stack(maps, axis=1)

    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


def test_gaze_lstm_full_forward_golden():
    """projection -> peephole ConvLSTM x T -> frozen BN -> decoder."""
    b, t = 2, 3
    model = registry.create_model("gaze_lstm", n_lstm_steps=t, batch_size=b,
                                  compute_dtype="float32",
                                  dim_cnn_proj=12, rnn_state_size=6)
    rng = np.random.RandomState(8)
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.randn(*x.shape).astype(np.float32) * 0.2),
        params)
    c3d = rng.rand(b, t, 1024, 7, 7).astype(np.float32)
    frames = np.zeros((b, t, 98, 98, 3), np.float32)

    got = np.asarray(model.apply(params, jnp.asarray(frames),
                                 jnp.asarray(c3d), train=False))

    p = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), params)
    x = np.transpose(c3d.astype(np.float64), (0, 1, 3, 4, 2))
    emb = x @ p["c3d_proj"]["proj_c3d_W"] + p["c3d_proj"]["proj_c3d_b"]

    cp = p["cell"]
    c = np.zeros((b, 7, 7, 6))
    h = np.zeros((b, 7, 7, 6))
    hs = []
    for step in range(t):
        xt = emb[:, step]
        i = _sigmoid(_np_conv_same(xt, cp["W_xi"])
                     + _np_conv_same(h, cp["W_hi"]) + cp["W_ci"] * c)
        f = _sigmoid(_np_conv_same(xt, cp["W_xf"])
                     + _np_conv_same(h, cp["W_hf"]) + cp["W_cf"] * c)
        new_c = f * c + i * np.tanh(_np_conv_same(xt, cp["W_xc"])
                                    + _np_conv_same(h, cp["W_hc"]))
        o = _sigmoid(_np_conv_same(xt, cp["W_xo"])
                     + _np_conv_same(h, cp["W_ho"]) + cp["W_co"] * c)
        c, h = new_c, np.tanh(new_c) * o
        hs.append(h)

    dp = p["decoder"]
    maps = []
    for step in range(t):
        y = hs[step] * (dp["bn_scale"] / np.sqrt(1.001)) + dp["bn_offset"]
        y = _np_deconv(y, dp["up1_w"], 3, "VALID")
        y = _np_deconv(y, dp["up2_w"], 2, "VALID")
        y = _np_deconv(y, dp["up3_w"], 1, "SAME")
        y = y.reshape(-1, 12) @ dp["out_W"] + dp["out_b"]
        maps.append(y.reshape(b, 49, 49))
    expected = np.stack(maps, axis=1)
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


def test_gaze_c3d_conv_full_forward_golden():
    """Non-recurrent ablation: projection -> 3 deconvs (no BN) -> head."""
    b, t = 2, 2
    model = registry.create_model("gaze_c3d_conv", n_lstm_steps=t,
                                  batch_size=b, compute_dtype="float32",
                                  dim_cnn_proj=16)
    rng = np.random.RandomState(4)
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.randn(*x.shape).astype(np.float32) * 0.2),
        params)
    c3d = rng.rand(b, t, 1024, 7, 7).astype(np.float32)
    frames = np.zeros((b, t, 98, 98, 3), np.float32)

    got = np.asarray(model.apply(params, jnp.asarray(frames),
                                 jnp.asarray(c3d), train=False))

    p = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), params)
    x = np.transpose(c3d.astype(np.float64), (0, 1, 3, 4, 2))
    emb = x @ p["c3d_proj"]["proj_c3d_W"] + p["c3d_proj"]["proj_c3d_b"]
    dp = p["decoder"]
    assert "bn_scale" not in dp  # no batch norm in this ablation
    maps = []
    for step in range(t):
        y = emb[:, step]
        y = _np_deconv(y, dp["up1_w"], 3, "VALID")
        y = _np_deconv(y, dp["up2_w"], 2, "VALID")
        y = _np_deconv(y, dp["up3_w"], 1, "SAME")
        y = y.reshape(-1, 12) @ dp["out_W"] + dp["out_b"]
        maps.append(y.reshape(b, 49, 49))
    expected = np.stack(maps, axis=1)
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


def test_shallownet_full_forward_golden():
    """conv/pool chain + fc + maxout head vs pure NumPy."""
    params = shallownet.init_params(jax.random.PRNGKey(3))
    rng = np.random.RandomState(1)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.randn(*x.shape).astype(np.float32) * 0.05),
        params)
    images = rng.rand(2, 98, 98, 3).astype(np.float32)

    got = np.asarray(shallownet.apply(params, jnp.asarray(images)))

    p = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), params)
    x = images.astype(np.float64)
    x = np.maximum(_np_conv_valid(x, p["conv1_w"]) + p["conv1_b"], 0)
    x = _np_maxpool_same(x, 2, 2)
    x = np.maximum(_np_conv_valid(x, p["conv2_w"]) + p["conv2_b"], 0)
    x = _np_maxpool_same(x, 3, 2)
    x = np.maximum(_np_conv_valid(x, p["conv3_w"]) + p["conv3_b"], 0)
    x = _np_maxpool_same(x, 3, 2)
    x = x.reshape(2, -1)
    x = np.maximum(x @ p["fc1_w"] + p["fc1_b"], 0)
    a, bb = np.split(x, 2, axis=-1)
    x = np.maximum(a, bb)
    x = np.maximum(x @ p["fc2_w"] + p["fc2_b"], 0)
    a, bb = np.split(x, 2, axis=-1)
    expected = np.maximum(a, bb).reshape(-1, 49, 49)

    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)
