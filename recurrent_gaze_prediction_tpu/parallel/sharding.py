"""Sharded train / inference steps.

Data-parallel (+ optional model-parallel) versions of the train and predict
steps: the same pure step functions as `train/state.py`, jit-partitioned
over a mesh with explicit in/out shardings. XLA inserts the gradient psum
over the "data" axis and the all-gathers for "model"-sharded weights — no
hand-written collectives (SURVEY.md section 7 step 7).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.common import GazeModel
from ..train.state import TrainState, flip_half_batch
from .mesh import DATA_AXIS, batch_spec, params_shardings


def _pad_batch_dim(arrays, n_data: int):
    """Zero-pad each array's leading (batch) dim up to a multiple of the
    mesh data axis — jit in_shardings reject a non-divisible dim, and tail
    batches (dataset size % batch_size, eval max_instances) are routinely
    short. Returns (padded_arrays, original_batch). Pads host-side for
    NumPy inputs (no extra transfer) and device-side for jax.Arrays."""
    import numpy as np

    b = arrays[0].shape[0]
    pad = (-b) % n_data
    if pad == 0:
        return arrays, b
    out = []
    for x in arrays:
        xp = jax.numpy if isinstance(x, jax.Array) else np
        out.append(xp.concatenate(
            [x, xp.zeros((pad, *x.shape[1:]), dtype=x.dtype)]))
    return out, b


def _state_shardings(state: TrainState, mesh: Mesh,
                     model_parallel: Optional[bool] = None) -> TrainState:
    param_sh = params_shardings(state.params, mesh, model_parallel)

    # optimizer state mirrors param shapes (adam mu/nu etc.); leaves whose
    # shape/dtype matches a param leaf get that param's sharding, everything
    # else (counters, scalars) is replicated
    opt_sh = _match_shardings(state.params, param_sh, state.opt_state, mesh)
    return TrainState(params=param_sh, opt_state=opt_sh,
                      step=NamedSharding(mesh, P()))


def state_shardings(state: TrainState, mesh: Mesh,
                    model_parallel: Optional[bool] = None) -> TrainState:
    """NamedSharding pytree for a TrainState (params per the model-parallel
    rules, optimizer state mirroring them, step replicated). Public so the
    train loop can restore checkpoints DIRECTLY onto a mesh (cross-mesh
    resume: pass these as the sharding of the abstract restore target)."""
    return _state_shardings(state, mesh, model_parallel)


def place_state(state: TrainState, mesh: Mesh,
                model_parallel: Optional[bool] = None) -> TrainState:
    """Device-put the train state according to the mesh layout."""
    sh = _state_shardings(state, mesh, model_parallel)
    return jax.device_put(state, sh)


def make_sharded_train_step(model: GazeModel, tx, mesh: Mesh, *,
                            use_flip: Optional[bool] = None,
                            model_parallel: Optional[bool] = None,
                            donate: bool = True) -> Callable:
    """jitted `step(state, batch, rng) -> (state, metrics)` partitioned over
    the mesh: batch sharded on "data", params per the model-parallel rules."""
    flip = model.cfg.use_flip_batch if use_flip is None else use_flip

    def step_fn(state: TrainState, batch: dict, rng: jax.Array):
        rng_step = jax.random.fold_in(rng, state.step)
        k_flip, k_drop = jax.random.split(rng_step)
        if flip:
            batch = flip_half_batch(batch, k_flip)

        def loss_fn(params):
            loss, _ = model.loss(params, batch, train=True, rng=k_drop)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, opt_state=new_opt,
                               step=state.step + 1)
        return new_state, {"loss": loss,
                           "grad_norm": optax.global_norm(grads),
                           "step": state.step + 1}

    batch_sh = NamedSharding(mesh, batch_spec())
    repl = NamedSharding(mesh, P())
    cache: dict = {}

    def wrapper(state, batch, rng):
        # Build the jitted step ONCE per (state structure, batch keys) —
        # rebuilding jax.jit per call would retrace/recompile every step.
        key = (jax.tree_util.tree_structure(state), tuple(sorted(batch)))
        jitted = cache.get(key)
        if jitted is None:
            state_sh = _state_shardings(state, mesh, model_parallel)
            batch_shardings = {k: batch_sh for k in batch}
            jitted = jax.jit(
                step_fn,
                in_shardings=(state_sh, batch_shardings, repl),
                out_shardings=(state_sh, {"loss": repl, "grad_norm": repl,
                                          "step": repl}),
                donate_argnums=(0,) if donate else (),
            )
            cache[key] = jitted
        return jitted(state, batch, rng)

    return wrapper


def make_sharded_stream_fn(cfg, mesh: Mesh, *,
                           model_parallel: Optional[bool] = None) -> Callable:
    """Sharded chunked-streaming step: a BATCH OF STREAMS distributed over
    the "data" axis, recurrent state carried across chunks on-device.

    Returns jitted `step(params, state, c3d_chunk) -> (state, maps)` with
    state [B,7,7,U] and chunk [B,Tc,1024,7,7] batch-sharded — the
    composition of the two flagship capabilities (streaming + mesh
    parallelism; VERDICT r1 item 7). The carried state never leaves its
    shard, so chunk boundaries cost no collectives.
    """
    from ..models.streaming import grcn_stream_step

    batch_sh = NamedSharding(mesh, batch_spec())
    cache: dict = {}

    def wrapper(params, state, c3d_chunk):
        key = jax.tree_util.tree_structure(params)
        jitted = cache.get(key)
        if jitted is None:
            param_sh = params_shardings(params, mesh, model_parallel)
            jitted = jax.jit(
                lambda p, s, c: grcn_stream_step(p, s, c, cfg),
                in_shardings=(param_sh, batch_sh, batch_sh),
                out_shardings=(batch_sh, batch_sh),
                donate_argnums=(1,),
            )
            cache[key] = jitted
        return jitted(params, state, c3d_chunk)

    return wrapper


def make_sharded_fused_predict(gaze_model: GazeModel, mesh: Mesh, *,
                               compute_dtype=None,
                               model_parallel: Optional[bool] = None
                               ) -> Callable:
    """Sharded raw-video bulk inference: the fused C3D+gaze program
    (`models/pipeline.extract_and_predict`) partitioned over the mesh with
    the video batch on "data" — multi-chip serving of the production path.
    """
    import jax.numpy as jnp

    from ..models.pipeline import extract_and_predict

    cdt = jnp.bfloat16 if compute_dtype is None else compute_dtype
    batch_sh = NamedSharding(mesh, batch_spec())
    n_data = mesh.shape[DATA_AXIS]
    cache: dict = {}

    def wrapper(c3d_params, gaze_params, video_frames):
        key = (jax.tree_util.tree_structure(gaze_params),
               video_frames.shape[1])
        jitted = cache.get(key)
        if jitted is None:
            c3d_sh = params_shardings(c3d_params, mesh, False)
            gaze_sh = params_shardings(gaze_params, mesh, model_parallel)
            jitted = jax.jit(
                lambda cp, gp, v: extract_and_predict(
                    cp, gp, gaze_model, v, compute_dtype=cdt),
                in_shardings=(c3d_sh, gaze_sh, batch_sh),
                out_shardings=batch_sh,
            )
            cache[key] = jitted
        (video_frames,), b = _pad_batch_dim((video_frames,), n_data)
        out = jitted(c3d_params, gaze_params, video_frames)
        return out[:b] if out.shape[0] != b else out

    return wrapper


def _match_shardings(ref_params, ref_shardings, tree, mesh: Mesh):
    """Sharding pytree for `tree` (e.g. optimizer state): leaves whose
    (shape, dtype) matches a param leaf inherit that param's sharding,
    everything else (counters, scalars) is replicated."""
    shape_to_sharding = {}
    for leaf, sh in zip(jax.tree_util.tree_leaves(ref_params),
                        jax.tree_util.tree_leaves(ref_shardings)):
        shape_to_sharding.setdefault((leaf.shape, str(leaf.dtype)), sh)

    def match(leaf):
        key = (getattr(leaf, "shape", ()), str(getattr(leaf, "dtype", "")))
        return shape_to_sharding.get(key, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(match, tree)


def make_sharded_fused_train_step(gaze_model: GazeModel, tx, mesh: Mesh, *,
                                  finetune_c3d: bool = False,
                                  c3d_tx=None,
                                  use_flip: Optional[bool] = None,
                                  compute_dtype=None,
                                  model_parallel: Optional[bool] = None,
                                  donate: bool = True,
                                  remat_c3d: Optional[bool] = None,
                                  accum_steps: int = 1) -> Callable:
    """Multi-chip raw-video training: `models/pipeline.make_fused_train_step`
    partitioned over the mesh — video batch on "data" (XLA psums the
    gradients over ICI), gaze params per the model-parallel rules, the C3D
    tower replicated (its conv kernels are small; its FLOPs scale with the
    data axis).

    Same contract as the single-chip step: `step(gaze_params, opt_state,
    c3d_params, batch, rng) -> (gaze_params, opt_state, c3d_params,
    metrics)` with `opt_state` from `pipeline.init_fused_opt_state`. With
    `finetune_c3d`, C3D gradients psum over "data" like the gaze ones and
    the tower is rematerialized.
    """
    import jax.numpy as jnp

    from ..models.pipeline import make_fused_raw_step

    cdt = jnp.bfloat16 if compute_dtype is None else compute_dtype
    raw_step = make_fused_raw_step(
        gaze_model, tx, finetune_c3d=finetune_c3d, c3d_tx=c3d_tx,
        use_flip=use_flip, compute_dtype=cdt, remat_c3d=remat_c3d,
        accum_steps=accum_steps)

    batch_sh = NamedSharding(mesh, batch_spec())
    repl = NamedSharding(mesh, P())
    cache: dict = {}

    def wrapper(gaze_params, opt_state, c3d_params, batch, rng):
        key = (jax.tree_util.tree_structure(gaze_params),
               jax.tree_util.tree_structure(opt_state),
               batch["video"].shape[1], tuple(sorted(batch)))
        jitted = cache.get(key)
        if jitted is None:
            gaze_sh = params_shardings(gaze_params, mesh, model_parallel)
            c3d_sh = params_shardings(c3d_params, mesh, False)  # replicated
            if finetune_c3d:
                opt_sh = (_match_shardings(gaze_params, gaze_sh,
                                           opt_state[0], mesh),
                          _match_shardings(c3d_params, c3d_sh,
                                           opt_state[1], mesh))
                out_sh = (gaze_sh, opt_sh, c3d_sh, {"loss": repl})
                donate_args = (0, 1, 2) if donate else ()
            else:
                opt_sh = _match_shardings(gaze_params, gaze_sh, opt_state,
                                          mesh)
                out_sh = (gaze_sh, opt_sh, {"loss": repl})
                donate_args = (0, 1) if donate else ()
            batch_shardings = {k: batch_sh for k in batch}
            jitted = jax.jit(
                raw_step,
                in_shardings=(gaze_sh, opt_sh, c3d_sh, batch_shardings,
                              repl),
                out_shardings=out_sh,
                donate_argnums=donate_args,
            )
            cache[key] = jitted
        if finetune_c3d:
            return jitted(gaze_params, opt_state, c3d_params, batch, rng)
        # frozen tower passes through HOST-side (returning a non-donated
        # input from the jit would copy it), same as the single-chip step
        gaze_params, opt_state, metrics = jitted(gaze_params, opt_state,
                                                 c3d_params, batch, rng)
        return gaze_params, opt_state, c3d_params, metrics

    return wrapper


def make_sharded_predict(model: GazeModel, mesh: Mesh, *,
                         model_parallel: Optional[bool] = None) -> Callable:
    """jitted batched inference partitioned over the mesh — the bulk
    `extract_map.py`-style path, with batch over "data"."""
    batch_sh = NamedSharding(mesh, batch_spec())
    repl = NamedSharding(mesh, P())
    n_data = mesh.shape[DATA_AXIS]

    def predict_fn(params, frames, c3d):
        return model.predict(params, frames, c3d)

    cache: dict = {}

    def wrapper(params, frames, c3d):
        key = jax.tree_util.tree_structure(params)
        jitted = cache.get(key)
        if jitted is None:
            param_sh = params_shardings(params, mesh, model_parallel)
            jitted = jax.jit(
                predict_fn,
                in_shardings=(param_sh, batch_sh, batch_sh),
                out_shardings=batch_sh,
            )
            cache[key] = jitted
        (frames, c3d), b = _pad_batch_dim((frames, c3d), n_data)
        out = jitted(params, frames, c3d)
        return out[:b] if out.shape[0] != b else out

    return wrapper


def make_sharded_evaluate(mesh: Mesh, *, metrics=None, max_fix: int = 64,
                          n_rep: int = 100, exact: bool = True) -> Callable:
    """Frame-parallel on-device metric evaluation over the "data" axis.

    Saliency scoring is embarrassingly parallel across frames — the only
    cross-frame couplings are the AUC_shuffled other-map union (computed
    once from the FULL fixation population, `evaluation_metrics.py:283-287`,
    then replicated) and the AUC capacity preamble (a global max) — so an
    eval epoch shards its frame axis across the mesh and N chips score
    N x the frames in the same ~0.5 ms (BENCHMARKS.md "On-device metric
    evaluation"). Replaces the reference's per-frame joblib pool
    (`models/evaluate_gaze.py:203-232`) at multi-chip scale.

    Returns `evaluate(pred, gt, fixation, key, other_map=None) ->
    {metric: [N]}`; N is padded up to a multiple of the data axis
    internally (padded frames have empty fixation maps and are sliced off
    before returning).
    """
    import functools

    import jax.numpy as jnp

    from ..eval import metrics_jax

    metrics = tuple(metrics if metrics is not None
                    else metrics_jax.AVAILABLE_METRICS)
    frame_sh = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    n_data = mesh.shape[DATA_AXIS]

    jitted = jax.jit(
        metrics_jax._evaluate_batch_impl,
        static_argnames=("metrics", "max_fix", "n_rep", "max_other",
                         "exact"),
        in_shardings=(frame_sh, frame_sh, frame_sh, repl, repl),
        out_shardings=frame_sh,
    )

    def evaluate(pred, gt, fixation, key, other_map=None):
        pred = jnp.asarray(pred)
        gt = jnp.asarray(gt)
        fixation = jnp.asarray(fixation)
        pred = pred.reshape(pred.shape[0], *pred.shape[-2:])
        n = pred.shape[0]

        key, k_other = jax.random.split(key)
        if other_map is None:
            if "AUC_shuffled" in metrics:
                other_map = metrics_jax.build_other_map_union(fixation,
                                                              k_other)
            else:
                other_map = jnp.zeros(fixation.shape[-2:], fixation.dtype)

        cap, max_other = max_fix, None
        needs_capacity = ("AUC_Judd" in metrics
                          or (not exact and any(m.startswith("AUC")
                                                for m in metrics)))
        if needs_capacity:
            densest, n_other = (int(x) for x in
                                metrics_jax._preamble_stats(fixation,
                                                            other_map))
            if densest > cap:
                cap = 1 << (densest - 1).bit_length()
            if not exact and "AUC_shuffled" in metrics:
                max_other = min(1 << (max(n_other, 1) - 1).bit_length(),
                                pred.shape[-2] * pred.shape[-1])

        (pred, gt, fixation), _ = _pad_batch_dim((pred, gt, fixation),
                                                 n_data)
        out = jitted(pred, gt, fixation, other_map, key, metrics, cap,
                     n_rep, max_other, exact)
        return ({m: v[:n] for m, v in out.items()}
                if pred.shape[0] != n else out)

    return evaluate
