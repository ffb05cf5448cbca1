"""The training loop — `ModelBase.fit` rebuilt
(`/root/reference/models/base.py:330-358`).

Single jitted train step per iteration; periodic checkpoint / validation /
on-device evaluation at the reference cadences; auto-resume from the latest
checkpoint at start (`base.py:341-342`); per-step timing logs matching the
reference's `sec/batch, instances/sec` instrumentation
(`models/gaze_rnn.py:547-563`).
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..data.datasets import DataSplits
from ..eval import evaluator
from ..models.common import GazeModel
from ..utils import log
from .checkpoint import Checkpointer
from .state import (
    TrainState,
    build_schedule,
    make_eval_step,
    make_predict_fn,
    make_train_step,
)


def _device_batch(batch: dict, input_cast=None, sharding=None) -> dict:
    """Transfer a host batch; `input_cast` optionally casts the two big
    input streams (frames/c3d) HOST-side first — on transfer-bound hosts
    the fp32 wire bytes dominate (BENCHMARKS.md); the models cast inputs
    to their compute dtype in-graph anyway. Loss targets stay fp32.
    `sharding` (a NamedSharding) places the batch dim over the mesh's
    data axis instead of the default device."""
    out = {}
    for k, v in batch.items():
        if k == "clipnames":
            continue
        if getattr(v, "dtype", None) == np.dtype(object):
            # ragged original-scale fixation maps (data/crc.py mixed-
            # resolution fallback) cannot become one device array; the
            # train/eval steps don't consume them — they belong to the
            # NumPy evaluation protocol
            continue
        if input_cast is not None and k in ("frames", "c3d"):
            v = np.asarray(v).astype(input_cast)
        out[k] = (jax.device_put(np.asarray(v), sharding)
                  if sharding is not None else jnp.asarray(v))
    return out


def fit(model: GazeModel, state: TrainState, tx, data: DataSplits,
        exp: ExperimentConfig, *,
        train_dir: Optional[str] = None,
        metric_writer: Optional[Callable[[int, dict], None]] = None,
        max_eval_instances: int = 50,
        train_iterator=None,
        profile_steps: int = 0,
        profile_start: int = 3,
        mesh=None,
        model_parallel: Optional[bool] = None) -> TrainState:
    """Train until `exp.schedule.max_steps`. Returns the final state.

    `train_iterator` (optional) supplies training batches instead of
    `data.train.next_batch` — e.g. a grain DataLoader iterator
    (`data/grain_pipeline.make_dataloader`) or a device prefetcher
    (`data/prefetch.prefetch_batches`).

    `profile_steps > 0` captures a TensorBoard-viewable device trace of
    that many train steps into `{train_dir}/profile`, starting at
    `profile_start` (after the compile step) — the reference's only
    instrumentation was wall-clock logs (SURVEY.md section 5).

    `mesh` (a jax.sharding.Mesh with a "data" axis) runs the WHOLE loop
    sharded: the train step partitioned over the mesh (gradients psum
    over "data"), batches placed batch-dim-sharded, validation/eval
    cadences fed sharded arrays, and checkpoints restored DIRECTLY onto
    the mesh layout — so a run saved under one topology resumes under
    another (cross-mesh elasticity; orbax re-shards on load when the
    abstract target carries shardings). `model_parallel` adds the wide-FC
    "model"-axis sharding rules on top (parallel/mesh.param_spec).
    """
    sched_cfg = exp.schedule
    batch_size = model.cfg.batch_size
    rng = jax.random.PRNGKey(exp.seed)
    lr_schedule = build_schedule(exp.optimizer)

    batch_sharding = None
    shard_fn = None
    if mesh is not None:
        from jax.sharding import NamedSharding

        from ..parallel import (DATA_AXIS, batch_spec, make_sharded_predict,
                                make_sharded_train_step, place_state,
                                shard_batch, state_shardings)

        if exp.optimizer.accum_steps > 1:
            raise NotImplementedError(
                "gradient accumulation + mesh sharding are not composed in "
                "fit(); shard the batch (data_parallel) OR accumulate, "
                "not both")
        if batch_size % mesh.shape[DATA_AXIS] != 0:
            raise ValueError(
                f"batch_size {batch_size} must be divisible by the mesh "
                f"data axis ({mesh.shape[DATA_AXIS]})")
        train_step = make_sharded_train_step(model, tx, mesh,
                                             model_parallel=model_parallel)
        # eval_step/predict propagate shardings from their (sharded)
        # operands; predict gets explicit in_shardings so the evaluator's
        # host-built arrays land batch-sharded too
        eval_step = make_eval_step(model)
        predict_fn = make_sharded_predict(model, mesh,
                                          model_parallel=model_parallel)
        batch_sharding = NamedSharding(mesh, batch_spec())
        shard_fn = lambda b: shard_batch(b, mesh)  # noqa: E731
        state_sh = state_shardings(state, mesh, model_parallel)
    else:
        train_step = make_train_step(model, tx,
                                     accum_steps=exp.optimizer.accum_steps)
        eval_step = make_eval_step(model)
        predict_fn = make_predict_fn(model)

    ckpt = None
    if train_dir is not None:
        ckpt = Checkpointer(train_dir)
        ckpt.save_config(exp)
        if mesh is not None:
            # abstract target CARRIES the mesh shardings: orbax re-shards
            # on load, so a checkpoint saved under any other topology
            # (single device, other mesh shape) restores onto this one
            abstract = jax.tree_util.tree_map(
                lambda x, sh: jax.ShapeDtypeStruct(np.shape(x), x.dtype,
                                                   sharding=sh),
                state, state_sh)
        else:
            abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), state)
        restored = ckpt.restore_latest(abstract)
        if restored is not None:
            state = restored
            log.info(" [Checkpoint] resumed at step %d", int(state.step))
        else:
            log.warn(" [Checkpoint] none found (starting from scratch)")
    if mesh is not None:
        state = place_state(state, mesh, model_parallel)

    # Preemption safety: a SIGTERM/SIGINT requests a checkpoint-and-exit at
    # the next step boundary (the reference had no fault tolerance at all;
    # SURVEY.md section 5 "failure detection ... none").
    import signal

    stop_requested = {"flag": False}

    def _request_stop(signum, frame):
        del frame
        log.warn("signal %s received: checkpointing and stopping", signum)
        stop_requested["flag"] = True

    prev_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _request_stop)
        except ValueError:  # non-main thread
            pass

    n_train = max(len(data.train), 1) if data.train is not None else 1
    input_cast = (jnp.bfloat16
                  if model.cfg.compute_dtype == "bfloat16" else None)
    step = int(state.step)
    last_logged_step, t_logged = step, time.time()
    profile_active = False
    profile_end = 0  # last step index to trace; nonzero once armed
    if profile_steps and train_dir is None:
        log.warn("profile_steps=%d requested but train_dir is unset; "
                 "profiling disabled", profile_steps)
    try:
        while step < sched_cfg.max_steps and not stop_requested["flag"]:
            # arm once at the first step past profile_start (>=, not ==: a
            # resumed run enters with step >> profile_start and must still
            # capture a trace)
            if (profile_steps and train_dir is not None and not profile_active
                    and profile_end == 0 and step + 1 >= profile_start):
                jax.profiler.start_trace(f"{train_dir}/profile")
                profile_active = True
                profile_end = step + profile_steps
                log.info("profiler: tracing steps %d..%d -> %s/profile",
                         step + 1, profile_end, train_dir)
            if train_iterator is not None:
                raw = next(train_iterator, None)
                if raw is None:
                    log.warn("train iterator exhausted at step %d", step)
                    break
                if shard_fn is not None:
                    batch = shard_fn(raw)
                else:
                    batch = {k: jnp.asarray(v) for k, v in raw.items()
                             if k != "clipnames"}
            else:
                batch = _device_batch(data.train.next_batch(batch_size),
                                      input_cast=input_cast,
                                      sharding=batch_sharding)
            state, metrics = train_step(state, batch, rng)
            # host-side counter: int(metrics["step"]) would block on the
            # device every iteration, serializing dispatch with host batch
            # prep; the logging branches below sync when they need values
            step += 1

            if profile_active and step >= profile_end:
                float(metrics["loss"])  # sync the traced steps
                jax.profiler.stop_trace()
                profile_active = False

            if step % sched_cfg.steps_per_logprint == 0:
                loss = float(metrics["loss"])  # device sync happens HERE
                t1 = time.time()
                steps_since = step - last_logged_step
                sec_per_batch = (t1 - t_logged) / max(steps_since, 1)
                last_logged_step, t_logged = step, t1
                epoch = step * batch_size / n_train
                lr = float(lr_schedule(step))
                log.info(
                    " [train epoch %.1f / step %4d] %s loss: %.5f "
                    "(%.3f sec/batch, %.3f instances/sec) (lr=%.3g)",
                    epoch, step,
                    (exp.train_tag + " |" if exp.train_tag else ""),
                    loss, sec_per_batch,
                    batch_size / max(sec_per_batch, 1e-9), lr)
                if metric_writer:
                    metric_writer(step, {"loss/train": loss,
                                         "grad_norm": float(metrics["grad_norm"]),
                                         "learning_rate": lr})

            if ckpt is not None and step % sched_cfg.steps_per_checkpoint == 0:
                ckpt.save(state)

            if data.valid is not None and len(data.valid) >= batch_size \
                    and step % sched_cfg.steps_per_validation == 0:
                vbatch = _device_batch(data.valid.next_batch(batch_size),
                                       input_cast=input_cast,
                                       sharding=batch_sharding)
                vmetrics = eval_step(state.params, vbatch)
                vloss = float(vmetrics["loss"])
                log.infov(" [val   step %4d] loss: %.5f", step, vloss)
                if metric_writer:
                    metric_writer(step, {"loss/val": vloss})
                    # image summaries of the last timestep, like the reference's
                    # validation-step dumps (gaze_rnn.py:172-208, max_outputs=2)
                    if hasattr(metric_writer, "images"):
                        preds = predict_fn(state.params, vbatch["frames"],
                                           vbatch["c3d"])
                        preds = np.asarray(preds)[:, -1]
                        metric_writer.images(step, "inputimage",
                                             np.asarray(vbatch["frames"])[:, -1])
                        metric_writer.images(step, "saliency_maps_gt",
                                             np.asarray(vbatch["gazemaps"])[:, -1])
                        metric_writer.images(step, "saliency_maps_pred_norm",
                                             preds)

            if data.valid is not None and len(data.valid) >= batch_size \
                    and step % sched_cfg.steps_per_evaluation == 0:
                _, scores = evaluator.generate_and_evaluate(
                    predict_fn, state.params, data.valid, batch_size,
                    max_instances=max_eval_instances, input_cast=input_cast,
                    mesh=mesh)
                if metric_writer:
                    metric_writer(step, {f"evaluation/{m}": s
                                         for m, s in scores.items()})

        if profile_active:  # loop ended inside the trace window
            jax.profiler.stop_trace()
            profile_active = False
        if profile_steps and train_dir is not None and profile_end == 0:
            log.warn("profile_steps=%d requested but no step ran past "
                     "profile_start=%d (max_steps=%d); nothing was traced",
                     profile_steps, profile_start, sched_cfg.max_steps)
        if ckpt is not None:
            ckpt.save(state, wait=True)
            ckpt.close()
            ckpt = None
    finally:
        # run on EVERY exit path (fit_fused got this try/finally first;
        # an exception mid-loop must not leave the process with dead
        # stop-flag handlers, an open trace, or an unclosed orbax manager)
        if profile_active:
            jax.profiler.stop_trace()
        if ckpt is not None:  # exception path: close without a final save
            ckpt.close()
        for sig, handler in prev_handlers.items():
            signal.signal(sig, handler)
    return state
