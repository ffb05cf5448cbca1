"""Benchmark: end-to-end gaze-saliency inference throughput on one chip.

Measures frames/sec/chip for the flagship RGP model (gaze_grcn: C3D-feature
projection -> ConvGRU -> deconv decoder -> 49x49 maps + per-frame softmax),
bf16 compute. Baseline target (BASELINE.md): 2000 frames/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 2000.0


def main() -> None:
    from recurrent_gaze_prediction_tpu import registry

    b, t = 16, 42  # reference T=42 windows
    model = registry.create_model("gaze_grcn", n_lstm_steps=t, batch_size=b,
                                  compute_dtype="bfloat16")
    params = model.init(jax.random.PRNGKey(0))

    # Each call consumes a scalar produced by the previous call, so the
    # device must execute every iteration sequentially — async dispatch or
    # runtime-side caching cannot fake the timing.
    @jax.jit
    def step(params, frames, c3d, eps):
        out = model.predict(params, frames, c3d + eps)
        return out.mean() * 1e-6

    key = jax.random.PRNGKey(1)
    frames = jax.random.uniform(key, (b, t, 98, 98, 3), jnp.float32)
    c3d = jax.random.uniform(key, (b, t, 1024, 7, 7), jnp.float32)

    eps = jnp.float32(0.0)
    eps = step(params, frames, c3d, eps)  # compile + warmup
    float(eps)

    n_iters = 30
    start = time.perf_counter()
    for _ in range(n_iters):
        eps = step(params, frames, c3d, eps)
    assert float(eps) != 0.0  # the chain really ran
    elapsed = time.perf_counter() - start

    frames_per_sec = b * t * n_iters / elapsed
    print(json.dumps({
        "metric": "gaze_grcn_inference_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 1),
        "unit": "frames/sec",
        "vs_baseline": round(frames_per_sec / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
