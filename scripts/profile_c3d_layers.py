"""Per-layer C3D timing on the real TPU: time cumulative prefixes of the
conv stack (scalar-chained), difference them, and report per-layer MFU.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from recurrent_gaze_prediction_tpu.models import c3d
from recurrent_gaze_prediction_tpu.ops.layers import conv3d, max_pool3d
from recurrent_gaze_prediction_tpu.utils import mfu as mfu_lib

N = 80  # windows: matches bench_inference (8 clips x 10 windows)
# device-aware roofline (same source bench.py uses) — a hardcoded v5e
# peak would silently mis-scale every MFU on other generations
PEAK = mfu_lib.peak_flops() or 197e12


def prefix_fn(params, k):
    """Forward through the first k conv layers (with pools)."""

    @jax.jit
    def fn(p, x, eps):
        x = x + eps
        x = x.astype(jnp.bfloat16)
        for name, _ in c3d.CONV_LAYERS[:k]:
            x = conv3d(x, p[f"{name}_w"], padding="SAME",
                       compute_dtype=jnp.bfloat16,
                       out_dtype=jnp.bfloat16) + p[f"{name}_b"].astype(
                           jnp.bfloat16)
            x = jax.nn.relu(x)
            if name in c3d.POOLS and name != "conv5b":
                w, s = c3d.POOLS[name]
                x = max_pool3d(x, w, s, padding="SAME")
        return x.astype(jnp.float32).mean() * 1e-6

    return fn


def time_fn(fn, params, x, iters=20):
    eps = jnp.float32(0.0)
    eps = fn(params, x, eps)
    float(eps)
    start = time.perf_counter()
    for _ in range(iters):
        eps = fn(params, x, eps)
    assert float(eps) != 0.0
    return (time.perf_counter() - start) / iters * 1e3


def layer_flops():
    """FLOPs per conv layer at batch N."""
    shapes = {"conv1a": (16, 112, 112, 3), "conv2a": (16, 56, 56, 64),
              "conv3a": (8, 28, 28, 128), "conv3b": (8, 28, 28, 256),
              "conv4a": (4, 14, 14, 256), "conv4b": (4, 14, 14, 512),
              "conv5a": (2, 7, 7, 512), "conv5b": (2, 7, 7, 512)}
    out = {}
    for name, cout in c3d.CONV_LAYERS:
        d, h, w, cin = shapes[name]
        out[name] = 2 * N * d * h * w * 27 * cin * cout
    return out


if __name__ == "__main__":
    params = {k: (v.astype(jnp.bfloat16) if k.endswith("_w") else v)
              for k, v in c3d.init_params(jax.random.PRNGKey(0)).items()}
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 16, 112, 112, 3),
                           jnp.float32) * 255.0 - 101.2

    flops = layer_flops()
    times = []
    for k in range(0, len(c3d.CONV_LAYERS) + 1):
        if k == 0:
            t = 0.0
        else:
            t = time_fn(prefix_fn(params, k), params, x)
        times.append(t)
        if k:
            name = c3d.CONV_LAYERS[k - 1][0]
            dt = times[k] - times[k - 1]
            f = flops[name]
            mfu = f / (dt / 1e3) / PEAK if dt > 0 else float("nan")
            print(f"{name}: prefix {t:7.2f} ms  layer {dt:6.2f} ms  "
                  f"{f/1e9:7.1f} GFLOP  mfu={mfu:.3f}", flush=True)
    total_f = sum(flops.values())
    print(f"TOTAL conv stack: {times[-1]:.2f} ms  {total_f/1e9:.0f} GFLOP  "
          f"mfu={total_f / (times[-1]/1e3) / PEAK:.3f}", flush=True)
