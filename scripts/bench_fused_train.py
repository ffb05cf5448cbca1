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

`--sweep B1,B2,...` runs the batch-scaling study (VERDICT r4 item 7):
one JSON line per (B, variant) with step time, raw frames/s, and BOTH
MFU flavors (XLA cost-model and the corrected optimized-HLO count that
includes while-loop trip counts, `utils/mfu.compiled_flops_corrected`).

Scalar-chained timing (each step consumes the previous state), same
protocol as bench.py — see BENCHMARKS.md "relay wall-clock" note.

Usage:  python scripts/bench_fused_train.py [--finetune] [--b B] [--f F]
        python scripts/bench_fused_train.py --sweep 4,8,16,32 [--finetune]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recurrent_gaze_prediction_tpu.utils import (  # noqa: E402
    enable_compile_cache,
    honor_jax_platforms_env,
)

honor_jax_platforms_env()
enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def run_config(b: int, f: int, finetune: bool, iters: int,
               accum_steps: int = 1) -> dict:
    import optax

    from recurrent_gaze_prediction_tpu import registry
    from recurrent_gaze_prediction_tpu.models import c3d, pipeline
    from recurrent_gaze_prediction_tpu.utils import mfu as mfu_lib

    t = pipeline.pipeline_timesteps(f)
    model = registry.create_model("gaze_grcn", n_lstm_steps=t, batch_size=b,
                                  compute_dtype="bfloat16")
    c3d_params = c3d.init_params(jax.random.PRNGKey(0))
    gaze_params = model.init(jax.random.PRNGKey(1))
    tx = optax.adam(1e-3)
    c3d_tx = optax.sgd(1e-5) if finetune else None
    opt_state = pipeline.init_fused_opt_state(
        tx, gaze_params, c3d_params, c3d_tx=c3d_tx,
        finetune_c3d=finetune)
    step = pipeline.make_fused_train_step(
        model, tx, finetune_c3d=finetune, c3d_tx=c3d_tx,
        accum_steps=accum_steps)

    rng0 = np.random.RandomState(0)
    batch = {
        "video": jnp.asarray(rng0.randint(0, 255, (b, f, 128, 171, 3))
                             .astype(np.uint8)),
        "gazemaps": jnp.asarray(rng0.rand(b, t, 49, 49)
                                .astype(np.float32) + 0.01),
    }

    flops = flops_corr = None
    lowerable = getattr(step, "jitted", step)
    try:
        flops = mfu_lib.compiled_flops(lowerable, gaze_params, opt_state,
                                       c3d_params, batch,
                                       jax.random.PRNGKey(2))
    except Exception as e:  # cost model unavailable on some backends
        print(f"# flops analysis unavailable: {e}", file=sys.stderr)
    try:
        flops_corr, _ = mfu_lib.compiled_flops_corrected(
            lowerable, gaze_params, opt_state, c3d_params, batch,
            jax.random.PRNGKey(2))
    except Exception as e:
        print(f"# corrected-flops analysis unavailable: {e}",
              file=sys.stderr)

    rng = jax.random.PRNGKey(3)
    gp, op, cp = gaze_params, opt_state, c3d_params
    t0 = time.perf_counter()
    gp, op, cp, metrics = step(gp, op, cp, batch, rng)
    loss = float(metrics["loss"])
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        gp, op, cp, metrics = step(gp, op, cp, batch, rng)
    assert float(metrics["loss"]) != 0.0  # sync
    dt = time.perf_counter() - t0
    step_ms = dt / iters * 1e3
    frames_s = b * f / (dt / iters)
    util = mfu_lib.mfu(flops, iters / dt) if flops else None
    util_corr = mfu_lib.mfu(flops_corr, iters / dt) if flops_corr else None
    return {
        "variant": "finetune_c3d" if finetune else "frozen",
        "b": b, "f": f, "t": t, "accum_steps": accum_steps,
        "compile_plus_first_step_s": round(compile_s, 1),
        "first_loss": round(loss, 5),
        "step_ms": round(step_ms, 2),
        "raw_frames_per_sec": round(frames_s, 0),
        "mfu_xla_costmodel": round(util, 4) if util else None,
        "mfu_corrected": round(util_corr, 4) if util_corr else None,
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--b", type=int, default=8)
    p.add_argument("--f", type=int, default=160)
    p.add_argument("--finetune", action="store_true")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient-accumulation microbatching (the memory "
                        "lever past the HBM ceiling: frozen B=32/F=160 "
                        "OOMs at 19.2G vs 15.75G without it)")
    p.add_argument("--sweep", default=None,
                   help="comma-separated batch sizes; one JSON line each. "
                        "A size may carry xN for accumulation (e.g. "
                        "'8,16,32x2': B=32 with accum_steps=2). A config "
                        "that fails (e.g. HBM OOM) prints an error row "
                        "and the sweep continues.")
    args = p.parse_args()

    if args.sweep:
        for spec in args.sweep.split(","):
            b, _, acc = spec.partition("x")
            b, acc = int(b), int(acc) if acc else args.accum_steps
            try:
                row = run_config(b, args.f, args.finetune, args.iters,
                                 accum_steps=acc)
            except Exception as e:
                msg = str(e)
                row = {"variant": ("finetune_c3d" if args.finetune
                                   else "frozen"),
                       "b": b, "f": args.f, "accum_steps": acc,
                       "error": (msg[:200] + "...") if len(msg) > 200
                       else msg}
            print(json.dumps(row), flush=True)
        return
    row = run_config(args.b, args.f, args.finetune, args.iters,
                     accum_steps=args.accum_steps)
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
