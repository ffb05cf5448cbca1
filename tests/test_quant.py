"""Int8 post-training quantization of the C3D tower (models/quant.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from recurrent_gaze_prediction_tpu.models import c3d, quant
import pytest

# >60s on the virtual-CPU harness: deselected by default (pyproject addopts
# -m "not slow"); run everything with `pytest -m ""`.
pytestmark = pytest.mark.slow


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


def test_int8_through_serving_surfaces(tmp_path):
    """round-3: the +8%% int8 path must be reachable from the CLI serving
    surfaces, not just as a library function. train -> export_serving
    --int8 (with REAL calibration clips from --calib_videos) -> bundle
    predict_fused_int8, gated at map corr >= 0.98 vs the fp32 fused
    program; the HTTP server routes program=fused_int8."""
    import os

    from recurrent_gaze_prediction_tpu.cli import export_serving, train_gaze
    from recurrent_gaze_prediction_tpu.compat.caffemodel import (
        write_caffemodel)
    from recurrent_gaze_prediction_tpu.serving import load_bundle
    from recurrent_gaze_prediction_tpu.serving.server import (
        server_from_bundle)

    cv2 = pytest.importorskip("cv2")

    # --- tiny trained run (f=16 raw frames -> t=1 pipeline step;
    # the int8 conv tower is slow on the CPU harness, so ONE window)
    train_dir = str(tmp_path / "run")
    rc = train_gaze.main([
        "--model", "gaze_grcn", "--dataset", "synthetic",
        "--max_steps", "2", "--n_lstm_steps", "2", "--batch_size", "2",
        "--synthetic_clips", "4", "--compute_dtype", "float32",
        "--train_dir", train_dir,
    ])
    assert rc == 0

    # --- fabricated Sports-1M caffemodel (conv tower ingested by the CLI)
    rng = np.random.RandomState(5)
    layers = {}
    in_ch = 3
    for name, out_ch in c3d.CONV_LAYERS:
        w = rng.randn(out_ch, in_ch, 3, 3, 3).astype(np.float32)
        layers[name] = [w / np.sqrt(27.0 * in_ch),  # keep activations sane
                        0.01 * rng.randn(1, 1, 1, 1, out_ch).astype(
                            np.float32)]
        in_ch = out_ch
    for name, d_in, d_out in c3d.FC_LAYERS:
        layers[f"{name}-1"] = [
            np.zeros((d_out, d_in, 1, 1, 1), np.float32),
            np.zeros((1, 1, 1, 1, d_out), np.float32)]
    caffemodel = str(tmp_path / "sports1m.caffemodel")
    write_caffemodel(caffemodel, layers)

    # --- real calibration video
    calib_dir = str(tmp_path / "calib")
    os.makedirs(calib_dir)
    writer = cv2.VideoWriter(os.path.join(calib_dir, "c.avi"),
                             cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 48))
    assert writer.isOpened()
    vr = np.random.RandomState(9)
    for _ in range(16):
        writer.write(vr.randint(0, 255, (48, 64, 3), np.uint8))
    writer.release()

    # the fused programs are exported at the C3D protocol size 128x171

    out_dir = str(tmp_path / "serving")
    rc = export_serving.main([
        "--train_dir", train_dir, "--out_dir", out_dir,
        "--platforms", "cpu", "--caffemodel", caffemodel,
        "--fused_num_frames", "16", "--int8",
        "--calib_videos", calib_dir, "--calib_windows", "1",
    ])
    assert rc == 0

    bundle = load_bundle(out_dir)
    assert "fused_int8" in bundle.programs and "fused" in bundle.programs
    assert bundle.qparams_int8 is not None
    video = vr.randint(0, 255, (1, 16, 128, 171, 3)).astype(np.float32)
    ref = np.asarray(bundle.predict_fused(video))
    got = np.asarray(bundle.predict_fused_int8(video))
    assert got.shape == ref.shape == (1, 1, 49, 49)
    assert np.isfinite(got).all()
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr >= 0.98, f"int8 map corr {corr} < 0.98"

    # the serve surface routes the int8 program
    import http.client
    import io

    with server_from_bundle(out_dir, program="fused_int8",
                            max_wait_ms=5.0).start() as server:
        host, port = server.address
        body = io.BytesIO()
        np.savez_compressed(body, video=video[0])
        # the server re-compiles its own bundle instance on first use;
        # the int8 conv tower compiles slowly on a contended CPU host
        conn = http.client.HTTPConnection(host, port, timeout=540)
        conn.request("POST", "/predict", body.getvalue(),
                     {"Content-Type": "application/octet-stream"})
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()
        served = np.load(io.BytesIO(resp.read()))["gazemaps"]
        conn.close()
    np.testing.assert_allclose(served, got[0], rtol=1e-4, atol=1e-5)
