"""Int8 post-training quantization of the C3D tower (models/quant.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from recurrent_gaze_prediction_tpu.models import c3d, quant


def _scaled_params(key=0, factor=12.0):
    """Random-init C3D with conv weights scaled so activations survive all
    8 layers (gaussian-0.01 init decays; trained weights do not)."""
    params = c3d.init_params(jax.random.PRNGKey(key))
    return {k: (v * factor if k.endswith("_w") and "conv" in k else v)
            for k, v in params.items()}


def test_int8_tower_matches_fp32():
    """Quantized conv tower tracks the fp32 tower through all 8 layers.
    Small spatial dims keep the CPU run fast; the conv/pool stack is
    identical at any size."""
    params = _scaled_params()
    raw = np.random.RandomState(0).rand(2, 16, 24, 32, 3).astype(np.float32)
    clips = jnp.asarray(raw * 255.0 - 101.2)

    ref = np.asarray(c3d.apply(params, clips, feature_layer="conv5b",
                               compute_dtype=jnp.float32))
    scales = quant.calibrate_c3d(params, clips)
    qparams = quant.quantize_c3d(params, scales)
    got = np.asarray(quant.apply_int8(qparams, clips))

    assert got.shape == ref.shape
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert corr > 0.995, corr
    assert rel < 0.06, rel


def test_quantize_shapes_and_dtypes():
    params = _scaled_params()
    qparams = quant.quantize_for_pipeline(params)
    for name, out_ch in c3d.CONV_LAYERS:
        assert qparams[f"{name}_wq"].dtype == jnp.int8
        assert qparams[f"{name}_wq"].shape[-1] == out_ch
        assert qparams[f"{name}_wscale"].shape == (out_ch,)
        assert float(qparams[f"{name}_xscale"]) > 0
    # int8 kernels really span the int8 range (per-channel symmetric)
    w1 = np.asarray(qparams["conv1a_wq"])
    assert w1.max() == 127 or w1.min() == -127


def test_pipeline_c3d_forward_hook():
    """`extract_and_predict(c3d_forward=...)` routes feature extraction
    through the hook — the integration point the int8 path plugs into.
    Uses a synthetic extractor so no 3-D convs run (tower accuracy is
    pinned by test_int8_tower_matches_fp32; the TPU end-to-end numbers
    live in BENCHMARKS.md "int8 quantized C3D")."""
    from recurrent_gaze_prediction_tpu import registry
    from recurrent_gaze_prediction_tpu.models import pipeline

    f = 32
    t = pipeline.pipeline_timesteps(f)
    model = registry.create_model("gaze_grcn", n_lstm_steps=t, batch_size=1,
                                  compute_dtype="float32", rnn_state_size=8,
                                  dim_cnn_proj=16)
    gaze_params = model.init(jax.random.PRNGKey(1))
    video = jnp.asarray(np.random.RandomState(2).randint(
        0, 255, (1, f, 48, 64, 3)).astype(np.float32))

    feats_ndhwc = jnp.asarray(
        np.random.RandomState(3).rand(2, 2, 7, 7, 512).astype(np.float32))
    calls = []

    def fake_c3d(params, clips):
        calls.append(clips.shape)
        return feats_ndhwc

    got = np.asarray(pipeline.extract_and_predict(
        {}, gaze_params, model, video, compute_dtype=jnp.float32,
        c3d_forward=fake_c3d))

    assert calls == [(2, 16, 112, 112, 3)]  # preprocessed windows reached it
    # maps must equal predicting directly on the hook's features
    sub = video[:, 15::5][:, :t]
    sub = jax.image.resize(sub, (1, t, 98, 98, 3), "bilinear") / 255.0
    rgp = c3d.conv5b_to_rgp(feats_ndhwc).reshape(1, 2, 1024, 7, 7)[:, :t]
    want = np.asarray(model.predict(gaze_params, sub, rgp))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
