"""HTTP inference server: npz in, gaze maps out, dynamically batched.

A stdlib-only (http.server) production front-end over
`serving.DynamicBatcher`: concurrent POSTs from independent clients are
coalesced into single device calls — each request thread blocks on its
Future while the batcher fills a window (BENCHMARKS.md: the fused
pipeline saturates from batch 8, so coalescing multiplies single-clip
serving throughput). The reference has no serving story at all —
inference re-runs the training codebase one clip at a time
(`/root/reference/models/extract_map.py:221-227`).

Protocol:
  GET  /healthz            -> {"status": "ok", "calls": N, "requests": M}
  POST /predict            -> body: .npz, keys = the program's inputs
                              (`frames`+`c3d`, or `video` for the fused
                              program); response: .npz with `gazemaps`.
Each npz array is ONE clip without a batch dimension; the server adds
and strips the batch axis around the coalesced device call.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..utils import log
from .batcher import DynamicBatcher


def _cast_to_program_dtype(key: str, a: np.ndarray, want: np.dtype):
    """Cast a request array to the program's input dtype, or raise
    ValueError with a client-actionable message (-> 400).

    Float targets (f32/f16/bfloat16) accept any real input — bfloat16
    in particular cannot travel in an npz (numpy serializes it as raw
    void bytes), so clients send f32/f16 and the cast happens here.
    uint8 targets accept only integer pixels in range: silently rounding
    a float client payload would hide a lossy conversion."""
    if a.dtype == want:
        return a
    if jnp.issubdtype(want, jnp.floating):
        # np.load of an npz only ever yields standard numpy dtypes
        # (bfloat16 round-trips as raw void bytes), so kind covers it
        if a.dtype.kind in "fiu":
            return a.astype(want)
        raise ValueError(
            f"input {key}: dtype {a.dtype} is not castable to the "
            f"program's {want.name} (send float32/float16 values)")
    if want == np.uint8:
        if a.dtype.kind in "iu":
            lo, hi = (int(a.min()), int(a.max())) if a.size else (0, 0)
            if lo < 0 or hi > 255:
                raise ValueError(
                    f"input {key}: values [{lo},{hi}] out of uint8 range")
            return a.astype(np.uint8)
        raise ValueError(
            f"input {key}: program expects uint8 pixels (0..255); got "
            f"{a.dtype} — round/clip client-side if the source is float")
    raise ValueError(
        f"input {key}: cannot cast {a.dtype} to program dtype {want.name}")


class GazeServer:
    """Wraps `predict_fn(*batched_arrays) -> batched maps` in an HTTP
    endpoint with dynamic micro-batching.

    `input_keys` fixes the npz keys (and their order) a request must
    carry, e.g. ("frames", "c3d") or ("video",).
    """

    def __init__(self, predict_fn: Callable,
                 input_keys: Sequence[str] = ("frames", "c3d"), *,
                 host: str = "127.0.0.1", port: int = 0,
                 max_batch: int = 32, max_wait_ms: float = 5.0,
                 input_ndims: Optional[dict] = None,
                 input_shapes: Optional[dict] = None,
                 input_dtypes: Optional[dict] = None,
                 max_body_bytes: int = 256 * 1024 * 1024,
                 request_timeout: float = 120.0):
        """`input_ndims` maps input key -> expected UNBATCHED ndim, and
        `input_shapes` maps key -> expected UNBATCHED shape tuple (None
        entries are wildcards); a request violating either gets its own
        400 instead of poisoning the whole micro-batch (every co-batched
        Future fails together when np.stack or the program rejects one
        clip's shapes).

        `input_dtypes` maps key -> the dtype the program expects (the
        bundle's wire_dtype/video_dtype). Requests are cast at the HTTP
        boundary: float programs (incl. bfloat16, which npz cannot carry
        — clients send f32/f16) accept any real input; uint8 programs
        accept integer pixels in 0..255 and reject floats with a 400
        (a lossy float->uint8 round should be the CLIENT's decision)."""
        self.input_keys = tuple(input_keys)
        self.input_ndims = dict(input_ndims or {})
        self.input_shapes = {k: tuple(v)
                             for k, v in (input_shapes or {}).items()}
        self.input_dtypes = {k: jnp.dtype(v)
                             for k, v in (input_dtypes or {}).items()}
        self.batcher = DynamicBatcher(predict_fn, max_batch=max_batch,
                                      max_wait_ms=max_wait_ms)
        server = self

        class Handler(BaseHTTPRequestHandler):
            timeout = request_timeout  # socket timeout: a client lying
            # about Content-Length must not pin a handler thread forever

            def log_message(self, fmt, *args):  # route through our logger
                log.info("http: " + fmt, *args)

            def _reply(self, code: int, body: bytes, ctype: str) -> None:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _reply_json(self, code: int, obj) -> None:
                self._reply(code, json.dumps(obj).encode(),
                            "application/json")

            def do_GET(self):
                if self.path != "/healthz":
                    return self._reply_json(404, {"error": "not found"})
                self._reply_json(200, {
                    "status": "ok",
                    "calls": server.batcher.calls,
                    "requests": server.batcher.requests,
                    "inputs": list(server.input_keys),
                })

            def do_POST(self):
                if self.path != "/predict":
                    return self._reply_json(404, {"error": "not found"})
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    if length > max_body_bytes:
                        return self._reply_json(413, {
                            "error": f"body {length} bytes exceeds the "
                                     f"{max_body_bytes} limit"})
                    blob = np.load(io.BytesIO(self.rfile.read(length)),
                                   allow_pickle=False)
                    try:
                        arrays = [blob[k] for k in server.input_keys]
                    except KeyError as e:
                        return self._reply_json(400, {
                            "error": f"missing input {e}; need "
                                     f"{list(server.input_keys)}"})
                    for k, a in zip(server.input_keys, arrays):
                        want = server.input_ndims.get(k)
                        if want is not None and a.ndim != want:
                            return self._reply_json(400, {
                                "error": f"input {k} must be {want}-D "
                                         f"(ONE clip, no batch dim); got "
                                         f"shape {list(a.shape)}"})
                        want_shape = server.input_shapes.get(k)
                        if want_shape is not None and (
                                len(a.shape) != len(want_shape) or any(
                                    w is not None and d != w
                                    for d, w in zip(a.shape, want_shape))):
                            return self._reply_json(400, {
                                "error": f"input {k} must have unbatched "
                                         f"shape {list(want_shape)} (None ="
                                         f" any); got {list(a.shape)}"})
                    arrays = [
                        _cast_to_program_dtype(k, a, server.input_dtypes[k])
                        if k in server.input_dtypes else a
                        for k, a in zip(server.input_keys, arrays)]
                except Exception as e:
                    return self._reply_json(400, {"error": str(e)})
                try:
                    maps = server.batcher.predict(*arrays)
                except Exception as e:
                    return self._reply_json(500, {"error": str(e)})
                out = io.BytesIO()
                np.savez_compressed(out, gazemaps=np.asarray(maps))
                self._reply(200, out.getvalue(), "application/octet-stream")

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: Optional[threading.Thread] = None
        self._serving = False

    @property
    def address(self) -> tuple[str, int]:
        return self._httpd.server_address[:2]

    def start(self) -> "GazeServer":
        """Serve on a daemon thread; returns self (address is then bound)."""
        self._serving = True
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True, name="rgp-http")
        self._thread.start()
        log.infov("serving on http://%s:%d (inputs: %s)", *self.address,
                  ",".join(self.input_keys))
        return self

    def serve_forever(self) -> None:
        log.infov("serving on http://%s:%d (inputs: %s)", *self.address,
                  ",".join(self.input_keys))
        self._serving = True
        self._httpd.serve_forever()

    def close(self) -> None:
        # BaseServer.shutdown() waits on an event only serve_forever sets;
        # calling it on a never-started server would block forever
        if self._serving:
            self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)
        self.batcher.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def server_from_bundle(bundle_dir: str, *, program: str = "predict",
                       host: str = "127.0.0.1", port: int = 0,
                       max_batch: int = 32,
                       max_wait_ms: float = 5.0) -> GazeServer:
    """Serve an exported `serving.save_bundle` artifact.

    program "predict" serves (frames, c3d) -> maps; "fused" serves raw
    (video,) -> maps. Bundles export with a symbolic batch dim, so the
    batcher's power-of-two buckets each specialize once.
    """
    from .export import load_bundle

    bundle = load_bundle(bundle_dir)
    cfg = bundle.model_config
    meta = bundle.manifest["programs"].get(program, {})
    if program == "predict":
        fn, keys = bundle.predict, ("frames", "c3d")
        ndims = {"frames": 4, "c3d": 4}  # [T,H,W,3] / [T,1024,7,7]
        t = meta.get("t", cfg.n_lstm_steps)
        shapes = {"frames": (t, cfg.image_height, cfg.image_width, 3),
                  "c3d": (t, cfg.dim_feature, 7, 7)}
        wire = meta.get("wire_dtype", "float32")
        dtypes = {"frames": wire, "c3d": wire}
    elif program in ("fused", "fused_int8"):
        fn = (bundle.predict_fused if program == "fused"
              else bundle.predict_fused_int8)
        keys = ("video",)
        ndims = {"video": 4}             # [F,H,W,3]
        hw = meta.get("video_hw")
        shapes = {"video": (meta.get("num_frames"),) + tuple(hw or (None,
                                                                    None))
                  + (3,)}
        dtypes = {"video": meta.get("video_dtype", "float32")}
    else:
        raise ValueError(
            f"program must be predict|fused|fused_int8, got {program}")
    if program not in bundle.programs:
        raise ValueError(f"bundle has no '{program}' program "
                         f"(has: {bundle.programs})")
    return GazeServer(fn, keys, host=host, port=port, max_batch=max_batch,
                      max_wait_ms=max_wait_ms, input_ndims=ndims,
                      input_shapes=shapes, input_dtypes=dtypes)
