"""Measure the fused raw-video TRAIN step on the real chip.

Raw uint8 frames -> C3D (in-graph) -> ConvGRU -> decoder -> loss, one
jitted program (`models/pipeline.make_fused_train_step`). Two variants:

  * frozen tower (reference regime: C3D is a fixed feature extractor,
    gradients stop at the projection) — reference trains feature-fed
    instead (`/root/reference/models/train_gaze.py:137-157` consumes
    offline .c3d features), so this is the same optimization problem with
    the extraction folded into the step;
  * `--finetune` joint fine-tuning (beyond reference): gradients flow
    through the rematerialized conv tower, per-tree optimizer.

Scalar-chained timing (each step consumes the previous state), same
protocol as bench.py — see BENCHMARKS.md "relay wall-clock" note.

Usage:  python scripts/bench_fused_train.py [--finetune] [--b B] [--f F]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_rgp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=8)
    p.add_argument("--f", type=int, default=160)
    p.add_argument("--finetune", action="store_true")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import optax

    from recurrent_gaze_prediction_tpu import registry
    from recurrent_gaze_prediction_tpu.models import c3d, pipeline
    from recurrent_gaze_prediction_tpu.utils import mfu as mfu_lib

    b, f = args.b, args.f
    t = pipeline.pipeline_timesteps(f)
    model = registry.create_model("gaze_grcn", n_lstm_steps=t, batch_size=b,
                                  compute_dtype="bfloat16")
    c3d_params = c3d.init_params(jax.random.PRNGKey(0))
    gaze_params = model.init(jax.random.PRNGKey(1))
    tx = optax.adam(1e-3)
    c3d_tx = optax.sgd(1e-5) if args.finetune else None
    opt_state = pipeline.init_fused_opt_state(
        tx, gaze_params, c3d_params, c3d_tx=c3d_tx,
        finetune_c3d=args.finetune)
    step = pipeline.make_fused_train_step(
        model, tx, finetune_c3d=args.finetune, c3d_tx=c3d_tx)

    rng0 = np.random.RandomState(0)
    batch = {
        "video": jnp.asarray(rng0.randint(0, 255, (b, f, 128, 171, 3))
                             .astype(np.uint8)),
        "gazemaps": jnp.asarray(rng0.rand(b, t, 49, 49)
                                .astype(np.float32) + 0.01),
    }

    flops = None
    try:
        lowerable = getattr(step, "jitted", step)
        flops = mfu_lib.compiled_flops(lowerable, gaze_params, opt_state,
                                       c3d_params, batch,
                                       jax.random.PRNGKey(2))
    except Exception as e:  # cost model unavailable on some backends
        print(f"flops analysis unavailable: {e}")

    rng = jax.random.PRNGKey(3)
    gp, op, cp = gaze_params, opt_state, c3d_params
    t0 = time.perf_counter()
    gp, op, cp, metrics = step(gp, op, cp, batch, rng)
    loss = float(metrics["loss"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s "
          f"loss={loss:.5f}")

    n = args.iters
    t0 = time.perf_counter()
    for _ in range(n):
        gp, op, cp, metrics = step(gp, op, cp, batch, rng)
    assert float(metrics["loss"]) != 0.0  # sync
    dt = time.perf_counter() - t0
    step_ms = dt / n * 1e3
    frames_s = b * f / (dt / n)
    util = mfu_lib.mfu(flops, n / dt) if flops else None
    print(f"fused train ({'joint' if args.finetune else 'frozen tower'}) "
          f"B={b} F={f} T={t}: {step_ms:.2f} ms/step, "
          f"{frames_s:,.0f} raw frames/s"
          + (f", MFU {util:.1%}" if util else ""))


if __name__ == "__main__":
    main()
