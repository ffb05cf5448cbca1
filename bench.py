"""Benchmark: end-to-end C3D+GRCN saliency inference throughput on one chip.

The BASELINE.json headline metric: raw video frames/sec/chip through the
FUSED pipeline — 16-frame C3D windows -> conv5b -> channel fold -> frame
subsample/resize -> ConvGRU (Pallas kernel) -> deconv decoder -> 49x49
probability maps — as one jitted XLA program. Baseline target: 2000
frames/sec/chip (BASELINE.md).

Also reports MFU (XLA cost-model FLOPs / device peak) for the inference
program and for the feature-fed training step, so throughput is anchored
to the roofline rather than only to the reference baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N,
   "mfu": ..., "train_step_ms": ..., "train_mfu": ..., "device": ...}
"""

from __future__ import annotations

import json
import sys
import time

import jax

# Persistent compilation cache: the fused pipeline's cold compile through
# the remote-compile relay can take minutes; cached runs start in seconds.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_rgp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

BASELINE_FPS = 2000.0


def bench_inference():
    """Fused raw-video inference: frames/sec + MFU."""
    from recurrent_gaze_prediction_tpu import registry
    from recurrent_gaze_prediction_tpu.models import c3d, pipeline
    from recurrent_gaze_prediction_tpu.utils import mfu as mfu_lib

    b, f = 8, 160  # 8 clips x 160 raw frames (10 C3D windows each)
    t = pipeline.pipeline_timesteps(f)
    gaze_model = registry.create_model("gaze_grcn", n_lstm_steps=t,
                                       batch_size=b,
                                       compute_dtype="bfloat16")
    c3d_params = c3d.init_params(jax.random.PRNGKey(0))
    gaze_params = gaze_model.init(jax.random.PRNGKey(1))

    # Each call consumes a scalar produced by the previous call, so the
    # device must execute every iteration sequentially — async dispatch or
    # runtime-side caching cannot fake the timing.
    @jax.jit
    def step(c3dp, gp, frames, eps):
        out = pipeline.extract_and_predict(c3dp, gp, gaze_model,
                                           frames + eps)
        return out.mean() * 1e-6

    frames = jax.random.uniform(jax.random.PRNGKey(2),
                                (b, f, 128, 171, 3), jnp.float32) * 255.0

    eps = jnp.float32(0.0)
    eps = step(c3d_params, gaze_params, frames, eps)  # compile + warmup
    float(eps)

    n_iters = 20
    start = time.perf_counter()
    for _ in range(n_iters):
        eps = step(c3d_params, gaze_params, frames, eps)
    assert float(eps) != 0.0  # the chain really ran
    elapsed = time.perf_counter() - start

    frames_per_sec = b * f * n_iters / elapsed
    flops, _ = mfu_lib.compiled_flops_corrected(step, c3d_params,
                                                gaze_params, frames,
                                                jnp.float32(0.0))
    util = mfu_lib.mfu(flops, n_iters / elapsed)
    return frames_per_sec, util


def bench_inference_int8():
    """Fused raw-video inference with the int8-quantized C3D tower
    (`models/quant.py`, reachable via `export_serving --int8` / `serve
    --program fused_int8`): frames/sec on the same shapes as
    bench_inference, so the two rows are directly comparable."""
    from recurrent_gaze_prediction_tpu import registry
    from recurrent_gaze_prediction_tpu.models import c3d, pipeline, quant

    b, f = 8, 160
    t = pipeline.pipeline_timesteps(f)
    gaze_model = registry.create_model("gaze_grcn", n_lstm_steps=t,
                                       batch_size=b,
                                       compute_dtype="bfloat16")
    c3d_params = c3d.init_params(jax.random.PRNGKey(0))
    gaze_params = gaze_model.init(jax.random.PRNGKey(1))
    qparams = quant.quantize_for_pipeline(c3d_params)

    @jax.jit
    def step(qp, gp, frames, eps):
        out = pipeline.extract_and_predict(
            qp, gp, gaze_model, frames + eps,
            c3d_forward=lambda p, clips: quant.apply_int8(p, clips))
        return out.mean() * 1e-6

    frames = jax.random.uniform(jax.random.PRNGKey(2),
                                (b, f, 128, 171, 3), jnp.float32) * 255.0
    eps = jnp.float32(0.0)
    eps = step(qparams, gaze_params, frames, eps)  # compile + warmup
    float(eps)

    n_iters = 20
    start = time.perf_counter()
    for _ in range(n_iters):
        eps = step(qparams, gaze_params, frames, eps)
    assert float(eps) != 0.0
    elapsed = time.perf_counter() - start
    return b * f * n_iters / elapsed


def bench_fused_train_step(b: int = 8, f: int = 160):
    """Raw-video TRAIN step (C3D in-graph, frozen tower — the reference's
    feature-extractor regime with extraction folded into the step):
    raw frames/sec through training. Same clip shapes as bench_inference
    so the train and inference rows are directly comparable."""
    import optax

    from recurrent_gaze_prediction_tpu import registry
    from recurrent_gaze_prediction_tpu.models import c3d, pipeline

    import numpy as np

    t = pipeline.pipeline_timesteps(f)
    model = registry.create_model("gaze_grcn", n_lstm_steps=t, batch_size=b,
                                  compute_dtype="bfloat16")
    c3d_params = c3d.init_params(jax.random.PRNGKey(0))
    gaze_params = model.init(jax.random.PRNGKey(1))
    tx = optax.adam(1e-3)
    opt_state = pipeline.init_fused_opt_state(tx, gaze_params)
    step = pipeline.make_fused_train_step(model, tx)

    rng0 = np.random.RandomState(0)
    batch = {
        "video": jnp.asarray(rng0.randint(0, 255, (b, f, 128, 171, 3))
                             .astype(np.uint8)),
        "gazemaps": jnp.asarray(rng0.rand(b, t, 49, 49)
                                .astype(np.float32) + 0.01),
    }
    rng = jax.random.PRNGKey(2)
    gp, op, cp = gaze_params, opt_state, c3d_params
    gp, op, cp, metrics = step(gp, op, cp, batch, rng)  # compile + warmup
    float(metrics["loss"])

    n_iters = 10
    start = time.perf_counter()
    for _ in range(n_iters):
        gp, op, cp, metrics = step(gp, op, cp, batch, rng)
    assert float(metrics["loss"]) != 0.0  # state-chained: syncs the loop
    elapsed = time.perf_counter() - start
    return b * f * n_iters / elapsed


def bench_train_step(b: int = 16, t: int = 42):
    """Feature-fed gaze_grcn train step at the reference's shape regime
    (T=42): step latency + MFU. State chaining (step i+1 consumes step i's
    TrainState) forces sequential execution; the final loss transfer syncs
    the whole chain. B=16 is the round-1/2-comparable row; B=56 (2x the
    reference default 28) is the throughput-optimal shippable config
    (BENCHMARKS.md round-3 MFU-vs-batch curve)."""
    from recurrent_gaze_prediction_tpu import registry
    from recurrent_gaze_prediction_tpu.config import ExperimentConfig
    from recurrent_gaze_prediction_tpu.data import synthetic
    from recurrent_gaze_prediction_tpu.train import (
        create_train_state,
        make_train_step,
    )
    from recurrent_gaze_prediction_tpu.utils import mfu as mfu_lib

    exp = ExperimentConfig()
    model = registry.create_model("gaze_grcn", exp.model, n_lstm_steps=t,
                                  batch_size=b, compute_dtype="bfloat16")
    state, tx = create_train_state(model, exp.optimizer,
                                   jax.random.PRNGKey(0))
    step = make_train_step(model, tx, use_flip=True, donate=True)

    data = synthetic.make_clip_windows(b, t, seed=0)
    batch = {k: jnp.asarray(v)
             for k, v in data.next_batch(b).items() if k != "clipnames"}
    rng = jax.random.PRNGKey(1)

    # corrected = XLA cost model + the scan-body undercount (the cost
    # model counts each while body once; the ConvGRU fwd+bwd scans run
    # T times). The raw cost-model figure is kept for cross-round
    # continuity (BENCH_r01-r03 used it).
    flops, flops_xla = mfu_lib.compiled_flops_corrected(step, state, batch,
                                                        rng)

    state, metrics = step(state, batch, rng)  # compile + warmup
    float(metrics["loss"])

    n_iters = 10
    start = time.perf_counter()
    for _ in range(n_iters):
        state, metrics = step(state, batch, rng)
    assert float(metrics["loss"]) != 0.0
    elapsed = time.perf_counter() - start

    step_ms = elapsed / n_iters * 1e3
    util = mfu_lib.mfu(flops, n_iters / elapsed)
    util_xla = mfu_lib.mfu(flops_xla, n_iters / elapsed)
    return step_ms, util, util_xla


def bench_metric_eval(n: int = 4200, iters: int = 2000):
    """On-device saliency-metric evaluation (sim/cc/AUC_shuffled/AUC_Borji,
    exact closed-form AUCs): frames/sec scored. Replaces the reference's
    10-worker joblib pool (`models/evaluate_gaze.py:203-232`). All iters
    run as one lax.scan program with EVERY input perturbed by the carried
    scalar (nothing is loop-invariant, so XLA cannot hoist any stage), so
    the measurement is device time, not relay round-trips. iters must be
    large: one exact eval is ~0.2 ms, far below dispatch noise."""
    import functools

    import numpy as np

    from jax import lax

    from recurrent_gaze_prediction_tpu.eval import metrics_jax

    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.rand(n, 49, 49).astype(np.float32))
    gt = jnp.asarray(rng.rand(n, 49, 49).astype(np.float32))
    # guaranteed >=4 fixations per frame (like scripts/bench_metrics.py):
    # a zero-fixation frame scores NaN, and one NaN in the carry fold
    # would poison eps for every later iteration, breaking the
    # bit-identical-values invariant the 1e-18 trick relies on
    fix_np = np.zeros((n, 49, 49), np.float32)
    for i in range(n):
        k = rng.randint(4, 14)
        fix_np[i, rng.randint(0, 49, k), rng.randint(0, 49, k)] = 1.0
    fix = jnp.asarray(fix_np)
    other = metrics_jax.build_other_map_union(fix, jax.random.PRNGKey(7))
    metrics = metrics_jax.AVAILABLE_METRICS

    @functools.partial(jax.jit, static_argnames=("n_it",))
    def loop(p_, g_, f_, o_, key_, n_it):
        def body(carry, i):
            # 1e-18*carry (NOT 0.0*carry): a x0.0 multiply is algebraically
            # simplified away and the hoist-proof dependency vanishes. The
            # perturbation is below fp32 resolution next to O(1) pixels, so
            # values are bit-identical — but XLA cannot prove that, so no
            # stage of any metric is loop-invariant.
            eps = 1e-18 * carry
            out = metrics_jax._evaluate_batch_impl(
                p_ + eps, g_ + eps, f_ + eps, o_ + eps,
                jax.random.fold_in(key_, i), metrics, 16, 100, None, True)
            # consume EVERY metric: an unconsumed output is dead code and
            # XLA deletes that metric's whole computation from the loop
            return sum(v.mean() for v in out.values()), ()
        carry, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(n_it))
        return carry

    key = jax.random.PRNGKey(0)

    def timed(n_it):
        # warm first: n_it is static, so each chain length is its own
        # executable and the first call compiles/deserializes; then take
        # the min of 3 — single-call dispatch noise through the relay
        # (10-500 ms) dwarfs the ~0.2 ms/eval device time
        float(loop(pred, gt, fix, other, key, n_it))
        walls = []
        for _ in range(3):
            start = time.perf_counter()
            float(loop(pred, gt, fix, other, key, n_it))
            walls.append(time.perf_counter() - start)
        return min(walls)

    lo = max(iters // 10, 1)
    dev_s = max((timed(iters) - timed(lo)) / (iters - lo), 1e-9)
    return n / dev_s


def main() -> None:
    frames_per_sec, infer_mfu = bench_inference()
    try:
        int8_fps = bench_inference_int8()
    except Exception as e:  # int8 conv unsupported on some backends —
        # but print the cause so a real quant-path regression is not
        # silently reported as "unsupported"
        print(f"# int8 bench skipped: {type(e).__name__}: {e}",
              file=sys.stderr)
        int8_fps = None
    train_ms, train_mfu, train_mfu_xla = bench_train_step(16)
    train56_ms, train56_mfu, train56_mfu_xla = bench_train_step(56)
    try:
        fused_train_fps = bench_fused_train_step()
    except Exception as e:
        print(f"# fused-train bench skipped: {type(e).__name__}: {e}",
              file=sys.stderr)
        fused_train_fps = None
    try:
        eval_fps = bench_metric_eval()
    except Exception as e:
        print(f"# metric-eval bench skipped: {type(e).__name__}: {e}",
              file=sys.stderr)
        eval_fps = None
    print(json.dumps({
        "metric": "c3d_grcn_e2e_inference_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 1),
        "unit": "frames/sec",
        "vs_baseline": round(frames_per_sec / BASELINE_FPS, 3),
        "mfu": round(infer_mfu, 4) if infer_mfu else None,
        "int8_frames_per_sec": round(int8_fps, 1) if int8_fps else None,
        "train_step_ms": round(train_ms, 2),
        "train_mfu": round(train_mfu, 4) if train_mfu else None,
        "train_mfu_xla_costmodel": (
            round(train_mfu_xla, 4) if train_mfu_xla else None),
        "train_step_ms_b56": round(train56_ms, 2),
        "train_mfu_b56": round(train56_mfu, 4) if train56_mfu else None,
        "train_mfu_b56_xla_costmodel": (
            round(train56_mfu_xla, 4) if train56_mfu_xla else None),
        "train_frames_per_sec_b56": round(56 * 42 / (train56_ms / 1e3), 0),
        "fused_train_raw_frames_per_sec": (
            round(fused_train_fps, 1) if fused_train_fps else None),
        "metric_eval_frames_per_sec": (
            round(eval_fps, 0) if eval_fps else None),
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
