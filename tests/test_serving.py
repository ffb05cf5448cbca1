"""Serving bundles: jax.export round-trips, symbolic batch, fused/stream
programs. The loaded bundle must reproduce the live model bit-for-bit —
it is the SAME lowered program, serialized."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recurrent_gaze_prediction_tpu import registry
from recurrent_gaze_prediction_tpu.serving import (
    flatten_params,
    load_bundle,
    save_bundle,
    unflatten_params,
)

# >60s on the virtual-CPU harness: deselected by default (pyproject addopts
# -m "not slow"); run everything with `pytest -m ""`.
pytestmark = pytest.mark.slow

T = 4


@pytest.fixture(scope="module")
def small_grcn():
    model = registry.create_model("gaze_grcn", n_lstm_steps=T, batch_size=2,
                                  compute_dtype="float32")
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def _batch(b, t, seed=0):
    rng = np.random.RandomState(seed)
    frames = rng.rand(b, t, 98, 98, 3).astype(np.float32)
    c3d = rng.rand(b, t, 1024, 7, 7).astype(np.float32)
    return jnp.asarray(frames), jnp.asarray(c3d)


def test_flatten_unflatten_roundtrip(small_grcn):
    _, params = small_grcn
    flat = flatten_params(params)
    assert all("/" in k or isinstance(v, np.ndarray)
               for k, v in flat.items())
    rebuilt = unflatten_params(flat)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        params, rebuilt)


def test_bundle_predict_matches_live_model(tmp_path, small_grcn):
    model, params = small_grcn
    save_bundle(str(tmp_path / "bundle"), model, params)
    bundle = load_bundle(str(tmp_path / "bundle"))
    assert bundle.programs == ["predict"]
    assert bundle.model_config.n_lstm_steps == T

    frames, c3d = _batch(2, T)
    got = np.asarray(bundle.predict(frames, c3d))
    want = np.asarray(model.predict(params, frames, c3d))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_symbolic_batch_serves_any_batch_size(tmp_path, small_grcn):
    model, params = small_grcn
    save_bundle(str(tmp_path / "bundle"), model, params)
    bundle = load_bundle(str(tmp_path / "bundle"))
    for b in (1, 3):
        frames, c3d = _batch(b, T, seed=b)
        maps = np.asarray(bundle.predict(frames, c3d))
        assert maps.shape == (b, T, 49, 49)
        assert np.isfinite(maps).all()


def test_export_serving_cli(tmp_path):
    """train (CLI) -> export bundle (CLI) -> load -> serve."""
    from recurrent_gaze_prediction_tpu.cli import export_serving, train_gaze

    train_dir = str(tmp_path / "run")
    rc = train_gaze.main([
        "--model", "gaze_grcn77", "--dataset", "synthetic",
        "--max_steps", "2", "--n_lstm_steps", "4", "--batch_size", "2",
        "--synthetic_clips", "4", "--compute_dtype", "float32",
        "--train_dir", train_dir,
    ])
    assert rc == 0
    out_dir = str(tmp_path / "serving")
    rc = export_serving.main([
        "--train_dir", train_dir, "--out_dir", out_dir,
        "--platforms", "cpu",
    ])
    assert rc == 0

    bundle = load_bundle(out_dir)
    assert bundle.model_config.name == "gaze_grcn77"
    frames, c3d = _batch(2, 4)
    maps = np.asarray(bundle.predict(frames, c3d))
    assert maps.shape == (2, 4, 7, 7)
    assert np.isfinite(maps).all()


def test_dynamic_batcher_coalesces_and_matches(small_grcn):
    """Concurrent single-clip submissions are coalesced into few device
    calls and every caller gets exactly its own clip's maps back."""
    from recurrent_gaze_prediction_tpu.serving import DynamicBatcher

    model, params = small_grcn
    jitted = jax.jit(model.predict)

    def predict(frames, c3d):
        return jitted(params, frames, c3d)

    n = 12
    frames, c3d = _batch(n, T, seed=7)
    want = np.asarray(predict(frames, c3d))

    with DynamicBatcher(predict, max_batch=8, max_wait_ms=50.0) as batcher:
        futures = [batcher.submit(frames[i], c3d[i]) for i in range(n)]
        got = [f.result(timeout=120) for f in futures]
        calls, requests = batcher.calls, batcher.requests

    assert requests == n
    assert calls < n  # actually coalesced, not one call per request
    for i in range(n):
        assert got[i].shape == (T, 49, 49)
        np.testing.assert_allclose(got[i], want[i], rtol=1e-5, atol=1e-6)


def test_dynamic_batcher_propagates_errors():
    from recurrent_gaze_prediction_tpu.serving import DynamicBatcher

    def broken(x):
        raise RuntimeError("boom")

    with DynamicBatcher(broken, max_batch=4, max_wait_ms=1.0) as batcher:
        fut = batcher.submit(np.zeros((2, 2), np.float32))
        with pytest.raises(RuntimeError, match="boom"):
            fut.result(timeout=30)


def test_fused_and_stream_programs(tmp_path, small_grcn):
    from recurrent_gaze_prediction_tpu.models import c3d as c3d_model
    from recurrent_gaze_prediction_tpu.models.pipeline import (
        extract_and_predict,
    )
    from recurrent_gaze_prediction_tpu.models.streaming import (
        grcn_stream_step,
    )

    model, params = small_grcn
    c3d_params = c3d_model.init_params(jax.random.PRNGKey(1))
    f, hw = 32, (48, 64)
    save_bundle(str(tmp_path / "bundle"), model, params,
                c3d_params=c3d_params, num_frames=f, video_hw=hw,
                stream_chunk_len=2)
    bundle = load_bundle(str(tmp_path / "bundle"))
    assert bundle.programs == ["fused", "predict", "stream"]

    video = jnp.asarray(np.random.RandomState(2).randint(
        0, 255, (1, f) + hw + (3,)).astype(np.float32))
    got = np.asarray(bundle.predict_fused(video))
    want = np.asarray(extract_and_predict(
        c3d_params, params, model, video, compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    state = bundle.initial_stream_state(1)
    chunk = jnp.asarray(
        np.random.RandomState(3).rand(1, 2, 1024, 7, 7).astype(np.float32))
    s1, m1 = bundle.stream_step(state, chunk)
    cfg = dataclasses.replace(model.cfg, use_pallas=False)
    s1_ref, m1_ref = grcn_stream_step(params, state, chunk, cfg)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m1_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s1_ref),
                               rtol=1e-6, atol=1e-6)
    assert m1.shape == (1, 2, 49, 49)


def test_dynamic_batcher_close_lifecycle():
    """close() is idempotent, rejects later submits, and fails (rather
    than strands) futures left in the queue if the worker died
    (code-review r2: a submit/close race could leave a Future unresolved
    forever)."""
    import queue as queue_mod

    from recurrent_gaze_prediction_tpu.serving.batcher import DynamicBatcher

    calls = []

    def predict(x):
        calls.append(len(x))
        return x * 2

    b = DynamicBatcher(predict, max_batch=4, max_wait_ms=1.0)
    assert np.asarray(b.predict(np.ones((2, 2)))).max() == 2.0
    b.close()
    b.close()  # idempotent
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(np.ones((2, 2)))

    # simulate a dead worker with an orphaned queued request: close()
    # must fail its future instead of leaving result() to hang
    b2 = DynamicBatcher(predict, max_batch=4, max_wait_ms=1.0)
    b2._worker.join(timeout=0)  # don't wait; worker is parked on get()
    fut = __import__("concurrent.futures", fromlist=["Future"]).Future()
    b2._queue.put(((np.ones((2, 2)),), fut))
    # kill the worker by feeding the sentinel directly, bypassing close()
    b2._queue.queue.appendleft(None)  # sentinel FIRST so the item orphans
    b2._worker.join(timeout=5)
    assert not b2._worker.is_alive()
    b2.close()
    assert fut.done() and isinstance(fut.exception(), RuntimeError)


def test_http_server_serves_bundle(tmp_path, small_grcn):
    """HTTP front-end: concurrent npz POSTs -> coalesced device calls ->
    per-clip gaze maps matching the direct bundle program; healthz
    reports batcher stats; bad requests get 4xx not hangs."""
    import http.client
    import io
    import json
    from concurrent.futures import ThreadPoolExecutor

    from recurrent_gaze_prediction_tpu.serving import (
        server_from_bundle,
    )

    model, params = small_grcn
    save_bundle(str(tmp_path / "bundle"), model, params)
    with server_from_bundle(str(tmp_path / "bundle"), max_batch=8,
                            max_wait_ms=20.0).start() as server:
        host, port = server.address

        def post_clip(seed):
            frames, c3d = _batch(1, T, seed=seed)
            body = io.BytesIO()
            np.savez_compressed(body, frames=np.asarray(frames[0]),
                                c3d=np.asarray(c3d[0]))
            conn = http.client.HTTPConnection(host, port, timeout=120)
            conn.request("POST", "/predict", body.getvalue(),
                         {"Content-Type": "application/octet-stream"})
            resp = conn.getresponse()
            assert resp.status == 200, resp.read()
            maps = np.load(io.BytesIO(resp.read()))["gazemaps"]
            conn.close()
            return seed, maps

        with ThreadPoolExecutor(max_workers=6) as pool:
            results = dict(pool.map(post_clip, range(6)))

        bundle = load_bundle(str(tmp_path / "bundle"))
        for seed, maps in results.items():
            frames, c3d = _batch(1, T, seed=seed)
            want = np.asarray(bundle.predict(frames, c3d))[0]
            np.testing.assert_allclose(maps, want, rtol=1e-5, atol=1e-6)

        conn = http.client.HTTPConnection(host, port, timeout=30)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["status"] == "ok"
        assert health["requests"] == 6
        assert 1 <= health["calls"] <= 6  # coalescing never inflates calls

        # malformed body -> 400 with an error message
        conn.request("POST", "/predict", b"not-an-npz",
                     {"Content-Type": "application/octet-stream"})
        resp = conn.getresponse()
        assert resp.status == 400
        assert "error" in json.loads(resp.read())

        # missing key -> 400 naming the expected inputs
        body = io.BytesIO()
        np.savez_compressed(body, frames=np.zeros((T, 98, 98, 3), np.float32))
        conn.request("POST", "/predict", body.getvalue(), {})
        resp = conn.getresponse()
        assert resp.status == 400
        assert "c3d" in json.loads(resp.read())["error"]

        # stray batch dim -> per-request 400, NOT a poisoned micro-batch
        body = io.BytesIO()
        np.savez_compressed(body,
                            frames=np.zeros((1, T, 98, 98, 3), np.float32),
                            c3d=np.zeros((1, T, 1024, 7, 7), np.float32))
        conn.request("POST", "/predict", body.getvalue(), {})
        resp = conn.getresponse()
        assert resp.status == 400
        assert "no batch dim" in json.loads(resp.read())["error"]
        conn.close()


def test_serve_cli_subprocess(tmp_path, small_grcn):
    """cli/serve end to end in a real subprocess: bundle -> HTTP server
    -> healthz + one npz predict round-trip, then clean SIGINT exit."""
    import http.client
    import io
    import json
    import os
    import socket
    import signal
    import subprocess
    import sys
    import time

    model, params = small_grcn
    save_bundle(str(tmp_path / "bundle"), model, params)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-m", "recurrent_gaze_prediction_tpu.cli.serve",
         "--bundle", str(tmp_path / "bundle"), "--port", str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        deadline = time.time() + 120
        health = None
        while time.time() < deadline:
            try:
                conn = http.client.HTTPConnection("127.0.0.1", port,
                                                  timeout=10)
                conn.request("GET", "/healthz")
                health = json.loads(conn.getresponse().read())
                break
            except OSError:
                time.sleep(1.0)
        assert health is not None and health["status"] == "ok"

        frames, c3d = _batch(1, T, seed=7)
        body = io.BytesIO()
        np.savez_compressed(body, frames=np.asarray(frames[0]),
                            c3d=np.asarray(c3d[0]))
        conn.request("POST", "/predict", body.getvalue(), {})
        resp = conn.getresponse()
        assert resp.status == 200
        maps = np.load(io.BytesIO(resp.read()))["gazemaps"]
        assert maps.shape == (T, 49, 49) and np.isfinite(maps).all()
        conn.close()
    finally:
        proc.send_signal(signal.SIGINT)
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
    assert proc.returncode == 0


def test_batcher_close_does_not_steal_sentinel_from_slow_worker():
    """close() with a predict_fn still running past the join timeout must
    NOT drain the queue (that would consume the shutdown sentinel and
    deadlock the worker, and fail requests the worker would have served)
    — round-2 ADVICE batcher.py finding."""
    import threading
    import time as _time

    from recurrent_gaze_prediction_tpu.serving.batcher import DynamicBatcher

    release = threading.Event()
    served = []

    def slow_predict(x):
        release.wait(10)
        served.append(x.shape[0])
        return x * 2.0

    b = DynamicBatcher(slow_predict, max_batch=1, max_wait_ms=1.0,
                       join_timeout_s=0.2)
    f1 = b.submit(np.ones((3,), np.float32))  # occupies the worker
    _time.sleep(0.1)
    f2 = b.submit(np.ones((3,), np.float32))  # queued behind it
    b.close()  # join times out while slow_predict blocks
    release.set()
    # both requests are served, not failed by a defensive drain
    np.testing.assert_allclose(f1.result(timeout=10), 2.0)
    np.testing.assert_allclose(f2.result(timeout=10), 2.0)
    # and the worker exits at the sentinel instead of blocking forever
    b._worker.join(timeout=10)
    assert not b._worker.is_alive()


def test_dynamic_batcher_cancelled_future_does_not_poison_batch():
    """A caller that times out and cancels its Future (PENDING futures are
    cancellable) must not make the dispatcher's set_result raise
    InvalidStateError — which previously converted into failures for
    every co-batched neighbour after it (round-4 review)."""
    import threading

    from recurrent_gaze_prediction_tpu.serving import DynamicBatcher

    release = threading.Event()

    def predict(x):
        release.wait(timeout=30)
        return x * 2.0

    # max_wait covers the window where we cancel fut0 BEFORE dispatch runs
    with DynamicBatcher(predict, max_batch=4, max_wait_ms=300.0) as batcher:
        fut0 = batcher.submit(np.full((2,), 1.0, np.float32))
        fut1 = batcher.submit(np.full((2,), 2.0, np.float32))
        fut2 = batcher.submit(np.full((2,), 3.0, np.float32))
        assert fut0.cancel()  # client gave up while still queued
        release.set()
        np.testing.assert_allclose(fut1.result(timeout=30), [4.0, 4.0])
        np.testing.assert_allclose(fut2.result(timeout=30), [6.0, 6.0])
    assert fut0.cancelled()


def test_flatten_params_rejects_non_dict_nodes():
    """unflatten_params only rebuilds dict-of-dicts; a list/tuple node
    must fail at EXPORT time with a clear error, not produce a bundle
    that dies (or permutes leaves) at serve time (round-4 review)."""
    from recurrent_gaze_prediction_tpu.serving.export import flatten_params

    with pytest.raises(TypeError, match="non-dict node"):
        flatten_params({"a": {"b": np.zeros(2)}, "c": [np.ones(2)] * 2})
    # plain dict-of-dicts still flattens
    flat = flatten_params({"a": {"b": np.zeros(2)}})
    assert list(flat) == ["a/b"]


def test_http_server_rejects_wrong_shape_without_poisoning_batch():
    """A right-ndim / wrong-shape request gets its own 400 from the
    manifest-derived shape check instead of poisoning the micro-batch
    (round-4 review)."""
    import io
    import urllib.request

    from recurrent_gaze_prediction_tpu.serving.server import GazeServer

    def predict(frames):
        return frames.sum(axis=(1, 2, 3, 4), keepdims=False)

    with GazeServer(predict, ("frames",), input_ndims={"frames": 4},
                    input_shapes={"frames": (4, 9, 9, 3)},
                    max_wait_ms=1.0).start() as server:
        host, port = server.address

        def post(arr):
            buf = io.BytesIO()
            np.savez(buf, frames=arr)
            req = urllib.request.Request(
                f"http://{host}:{port}/predict", data=buf.getvalue(),
                method="POST")
            try:
                with urllib.request.urlopen(req, timeout=60) as resp:
                    return resp.status
            except urllib.error.HTTPError as e:
                return e.code

        assert post(np.zeros((6, 9, 9, 3), np.float32)) == 400  # T=6 != 4
        assert post(np.zeros((4, 9, 9, 3), np.float32)) == 200


def test_wire_dtype_bf16_bundle(tmp_path, small_grcn):
    """wire_dtype=bfloat16 bundles take bf16 inputs (half the request
    transfer) and equal the fp32 program evaluated on wire-rounded
    inputs; map correlation vs the f32 wire stays ~1."""
    model, params = small_grcn
    bf16 = np.dtype("bfloat16")
    save_bundle(str(tmp_path / "b"), model, params, wire_dtype="bfloat16",
                stream_chunk_len=2)
    bundle = load_bundle(str(tmp_path / "b"))
    assert bundle.input_dtype("predict") == bf16
    assert bundle.manifest["programs"]["predict"]["wire_dtype"] == "bfloat16"

    frames, c3d = _batch(2, T)
    fr_w = np.asarray(frames).astype(bf16)
    c3_w = np.asarray(c3d).astype(bf16)
    got = np.asarray(bundle.predict(fr_w, c3_w))
    # exactly the fp32 model on the wire-rounded inputs
    want = np.asarray(model.predict(
        params, jnp.asarray(fr_w.astype(np.float32)),
        jnp.asarray(c3_w.astype(np.float32))))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # and numerically indistinguishable from the f32 wire for serving
    full = np.asarray(model.predict(params, frames, c3d))
    corr = np.corrcoef(got.ravel(), full.ravel())[0, 1]
    assert corr > 0.9999, corr

    # the stream chunk also rides the wire dtype; the carried state is
    # fp32 BOTH ways (rounding it would accumulate across a long video)
    state = bundle.initial_stream_state(1)
    chunk = np.random.RandomState(3).rand(1, 2, 1024, 7, 7).astype(bf16)
    s1, m1 = bundle.stream_step(state, chunk)
    assert np.asarray(s1).dtype == np.float32
    assert np.isfinite(np.asarray(m1)).all()


def test_video_dtype_uint8_fused_exact(tmp_path, small_grcn):
    """video_dtype=uint8 fused programs are EXACT vs the f32 program on
    decoded pixels (0..255 integers cast losslessly), at a quarter of
    the request transfer."""
    from recurrent_gaze_prediction_tpu.models import c3d as c3d_model

    model, params = small_grcn
    c3d_params = c3d_model.init_params(jax.random.PRNGKey(1))
    f, hw = 32, (48, 64)
    save_bundle(str(tmp_path / "u8"), model, params, c3d_params=c3d_params,
                num_frames=f, video_hw=hw, video_dtype="uint8")
    save_bundle(str(tmp_path / "f32"), model, params, c3d_params=c3d_params,
                num_frames=f, video_hw=hw)
    b_u8 = load_bundle(str(tmp_path / "u8"))
    b_f32 = load_bundle(str(tmp_path / "f32"))
    assert b_u8.input_dtype("fused") == np.uint8

    pixels = np.random.RandomState(2).randint(
        0, 256, (1, f) + hw + (3,)).astype(np.uint8)
    got = np.asarray(b_u8.predict_fused(pixels))
    want = np.asarray(b_f32.predict_fused(pixels.astype(np.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_http_server_casts_request_to_program_dtype():
    """The HTTP boundary casts requests to the program's declared input
    dtype: float programs (incl. bfloat16, which npz cannot carry)
    accept f32/f16 payloads; uint8 programs take integer pixels and
    reject floats with their own 400 (never a poisoned micro-batch)."""
    import io
    import urllib.request

    from recurrent_gaze_prediction_tpu.serving.server import GazeServer

    bf16 = np.dtype("bfloat16")
    seen = []

    def predict(frames):
        seen.append(frames.dtype)
        return frames.astype(np.float32).sum(axis=(1, 2))

    def post(server, arr):
        host, port = server.address
        buf = io.BytesIO()
        np.savez(buf, frames=arr)
        req = urllib.request.Request(
            f"http://{host}:{port}/predict", data=buf.getvalue(),
            method="POST")
        try:
            with urllib.request.urlopen(req, timeout=60) as resp:
                return resp.status
        except urllib.error.HTTPError as e:
            return e.code

    with GazeServer(predict, ("frames",),
                    input_dtypes={"frames": "bfloat16"},
                    max_wait_ms=1.0).start() as server:
        assert post(server, np.ones((3, 4), np.float32)) == 200
        assert post(server, np.ones((3, 4), np.float16)) == 200
        assert post(server, np.ones((3, 4), np.int32)) == 200
    assert seen and all(d == bf16 for d in seen)

    seen.clear()
    with GazeServer(predict, ("frames",),
                    input_dtypes={"frames": "uint8"},
                    max_wait_ms=1.0).start() as server:
        assert post(server, np.full((3, 4), 7, np.int64)) == 200   # in range
        assert post(server, np.full((3, 4), 300, np.int64)) == 400  # range
        assert post(server, np.ones((3, 4), np.float32)) == 400     # lossy
    assert seen and all(d == np.uint8 for d in seen)


def test_save_bundle_rejects_bad_wire_dtypes(tmp_path, small_grcn):
    """save_bundle validates the dtype knobs at EXPORT time — a uint8
    wire or an int32 video program would be dead on arrival at serve
    time (the server would 400 every legitimate payload)."""
    model, params = small_grcn
    with pytest.raises(ValueError, match="wire_dtype"):
        save_bundle(str(tmp_path / "a"), model, params, wire_dtype="uint8")
    with pytest.raises(ValueError, match="video_dtype"):
        save_bundle(str(tmp_path / "b"), model, params,
                    video_dtype="bfloat16")
