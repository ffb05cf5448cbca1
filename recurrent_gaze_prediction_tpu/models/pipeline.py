"""Fused end-to-end inference pipeline: raw video frames -> C3D -> gaze model.

The reference runs C3D as an OFFLINE subprocess producing `.c3d` pickles
that a later process loads (`extract_C3D_features.py` -> `crc_input_data_seq
.py` -> `models/extract_map.py`). Here the whole chain is one jitted XLA
program: windowed 3-D conv feature extraction, channel folding, frame
subsampling, recurrent gaze prediction — "train_gaze-style loops never leave
the TPU" (BASELINE.json north star).

Temporal protocol (faithful to the reference's loader):
  * C3D features: one timestep per non-overlapping 16-frame window
    (`extract_C3D_features.py:866`)
  * model frames: every 5th frame starting at 15 ([15::5],
    `crc_input_data_seq.py:186`), resized to 98x98
  * streams truncated to the common length (`crc_input_data_seq.py:338-347`)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models.common import GazeModel
from . import c3d as c3d_model


def pipeline_timesteps(num_frames: int, window: int = 16,
                       frame_offset: int = 15, frame_stride: int = 5) -> int:
    n_windows = num_frames // window
    n_frames = max(0, (num_frames - frame_offset + frame_stride - 1)
                   // frame_stride)
    return min(n_windows, n_frames)


def extract_and_predict(c3d_params: dict, gaze_params, gaze_model: GazeModel,
                        video_frames: jax.Array, *,
                        mean_cube: Optional[jax.Array] = None,
                        compute_dtype=jnp.bfloat16,
                        logits: bool = False,
                        train: bool = False,
                        rng: Optional[jax.Array] = None,
                        window_constraint=None,
                        stream_constraint=None,
                        c3d_forward=None) -> jax.Array:
    """[B, F, H, W, 3] raw pixel frames (0..255) -> [B, T, GH, GW] gaze maps.

    Frames are RGB (what `data/video.decode_video` yields); `c3d_params`
    must follow this framework's RGB-input convention — fold BGR-trained
    Caffe weights through `c3d.fold_bgr_into_params` at load time (the
    CLIs do; a per-frame channel swap here would cost every step what the
    one-time conv1a permutation costs never).

    F is static; T = pipeline_timesteps(F). Jit this (optionally with the
    model closed over) for the fused single-program path. `train=True`
    applies the gaze model's dropout (driven by `rng`); the C3D extractor
    runs inference-mode either way (its dropout sits in the unused fc
    layers, `extract_C3D_features.py:474-520`).

    Sharding hooks (used by `parallel/temporal.py` to shard the WINDOW axis
    of a single long video over the mesh): `window_constraint` is applied to
    the folded [B*W, 16, H, W, 3] clip batch before C3D so the 3-D convs
    run window-sharded; `stream_constraint` is applied to both recurrence
    inputs (features and subsampled frames) to gather them before the
    sequential scan. Both default to no-ops.

    `c3d_forward(c3d_params, clips) -> [N, 2, 7, 7, 512]` overrides the
    feature extractor (e.g. `models/quant.make_int8_c3d_forward` for the
    int8 serving path); defaults to the bf16/fp32 `c3d.apply` tower.
    """
    b, f = video_frames.shape[:2]
    t = pipeline_timesteps(f)
    if t <= 0:
        raise ValueError(f"need >= 16 frames and >= 16 subsampled offset, "
                         f"got F={f}")

    # --- C3D stream: [B, n_windows, 16, H, W, 3] -> conv5b -> fold
    n_windows = f // 16
    windows = video_frames[:, :n_windows * 16].reshape(
        b, n_windows, 16, *video_frames.shape[2:])
    clips = windows.reshape(b * n_windows, 16, *video_frames.shape[2:])
    if window_constraint is not None:
        clips = window_constraint(clips)
    clips = c3d_model.preprocess_frames(clips, mean_cube=mean_cube)
    if c3d_forward is None:
        feats = c3d_model.apply(c3d_params, clips, feature_layer="conv5b",
                                compute_dtype=compute_dtype)
    else:
        feats = c3d_forward(c3d_params, clips)
    feats = c3d_model.conv5b_to_rgp(feats)          # [B*W, 1024, 7, 7]
    feats = feats.reshape(b, n_windows, 1024, 7, 7)[:, :t]
    if stream_constraint is not None:
        feats = stream_constraint(feats)

    # --- frame stream: [15::5] subsample, resize to 98x98, [0, 1] scale
    sub = video_frames[:, 15::5][:, :t]
    sub = jax.image.resize(sub.astype(jnp.float32),
                           (b, t, 98, 98, 3), method="bilinear") / 255.0
    if stream_constraint is not None:
        sub = stream_constraint(sub)

    if logits:
        return gaze_model.apply(gaze_params, sub, feats, train=train,
                                rng=rng)
    return gaze_model.predict(gaze_params, sub, feats)


def make_fused_predict(gaze_model: GazeModel, *, num_frames: int,
                       compute_dtype=jnp.bfloat16):
    """Returns jitted `fn(c3d_params, gaze_params, video_frames)` for a fixed
    clip length — the production bulk-inference entry point. Calls with a
    different frame count raise instead of silently compiling a second
    shape specialization."""

    @jax.jit
    def fn(c3d_params, gaze_params, video_frames):
        if video_frames.shape[1] != num_frames:
            raise ValueError(
                f"fused predict built for num_frames={num_frames}, got "
                f"{video_frames.shape[1]}")
        return extract_and_predict(c3d_params, gaze_params, gaze_model,
                                   video_frames,
                                   compute_dtype=compute_dtype)

    return fn


def predict_video(c3d_params: dict, gaze_params, gaze_model: GazeModel,
                  video_path: str, *, num_frames: Optional[int] = None,
                  compute_dtype=jnp.bfloat16):
    """Video FILE -> per-frame gaze maps, no pre-extracted arrays.

    Replaces the reference's three-process chain (OpenCV frame dump ->
    C3D Caffe subprocess -> `.c3d` pickle -> extract_map session,
    `extract_C3D_features.py:801-926` + `models/extract_map.py`): decode
    the video on host, then run the one fused XLA program.

    `num_frames` fixes the jitted clip length (pad short / truncate long,
    like `extract_map.py:170-199`); by default the decoded length is
    rounded down to a whole number of 16-frame windows. Returns
    (maps [T, GH, GW], n_valid_timesteps).
    """
    import numpy as np

    from ..data import video as video_lib

    frames = list(video_lib.decode_video(video_path))
    if not frames:
        raise ValueError(f"no frames decoded from {video_path}")
    stacked = np.stack(frames)
    f_avail = stacked.shape[0]
    f = num_frames if num_frames is not None else (f_avail // 16) * 16
    if f < 16:
        raise ValueError(f"need >= 16 frames, decoded {f_avail}")
    if f_avail >= f:
        stacked = stacked[:f]
    else:  # zero-pad to the static length (extract_map.py:170-199)
        pad = np.zeros((f - f_avail,) + stacked.shape[1:], stacked.dtype)
        stacked = np.concatenate([stacked, pad])

    fn = make_fused_predict(gaze_model, num_frames=f,
                            compute_dtype=compute_dtype)
    maps = fn(c3d_params, gaze_params,
              jnp.asarray(stacked, jnp.float32)[None])
    n_valid = pipeline_timesteps(min(f_avail, f))
    return maps[0], n_valid


def flip_half_video_batch(batch: dict, key: jax.Array) -> dict:
    """Mirror a random half of a RAW-VIDEO batch horizontally, in-graph:
    video [B,F,H,W,3] on W, gazemaps [B,T,GH,GW] on GW — the raw-video
    analog of `train/state.flip_half_batch` (`gaze_rnn.py:502-510`; no
    c3d stream to flip here, the in-graph extractor sees flipped pixels).
    """
    from ..train.state import random_half_flip

    return random_half_flip(batch, key, {"video": 3, "gazemaps": 3})


def init_fused_opt_state(tx, gaze_params, c3d_params=None, *,
                         c3d_tx=None, finetune_c3d: bool = False):
    """Optimizer state for `make_fused_train_step`: `tx.init(gaze_params)`
    when C3D is frozen, else the pair `(tx.init(gaze_params),
    (c3d_tx or tx).init(c3d_params))`."""
    if not finetune_c3d:
        return tx.init(gaze_params)
    return (tx.init(gaze_params), (c3d_tx or tx).init(c3d_params))


def make_fused_loss_fn(gaze_model: GazeModel, *,
                       compute_dtype=jnp.bfloat16,
                       remat_c3d: bool = False):
    """`loss_fn(gaze_params, c3d_params, batch, k_drop) -> scalar` over a
    raw-video batch — the differentiable core shared by the single-chip
    train step below and `parallel/sharding.make_sharded_fused_train_step`.
    `remat_c3d` wraps the conv tower in `jax.checkpoint` so a backward
    pass through it recomputes activations instead of storing them."""
    from .common import sequence_loss
    from ..ops.normalize import normalize_probability_map

    c3d_fwd = None
    if remat_c3d:
        @jax.checkpoint
        def c3d_fwd(params, clips):
            return c3d_model.apply(params, clips, feature_layer="conv5b",
                                   compute_dtype=compute_dtype)

    def loss_fn(gaze_params, c3d_params, batch, k_drop):
        logits = extract_and_predict(c3d_params, gaze_params, gaze_model,
                                     batch["video"],
                                     compute_dtype=compute_dtype,
                                     logits=True, train=True, rng=k_drop,
                                     c3d_forward=c3d_fwd)
        gt = batch["gazemaps"]
        if gaze_model.cfg.loss_type in ("xentropy", "kld"):
            gt = normalize_probability_map(gt)
        return sequence_loss(logits, gt, gaze_model.cfg.loss_type)

    return loss_fn


def make_fused_grads_fn(loss_fn, *, finetune_c3d: bool,
                        accum_steps: int = 1):
    """`grads(gaze_params, c3d_params, batch, k_drop) -> (loss, grads)`
    over the fused loss; grads is the gaze tree, or (gaze, c3d) trees
    when `finetune_c3d`.

    `accum_steps > 1`: gradient accumulation over a `lax.scan` of
    microbatch passes with ONE result — same mean-over-batch gradient
    (the sequence loss divides by B*T), 1/accum_steps the activation
    memory. Microbatch rows are STRIDED (row j of microbatch i is batch
    row j*accum_steps+i) so under a "data"-sharded batch every
    microbatch stays balanced across shards — provided batch is
    divisible by n_data * accum_steps (validated by `fit_fused` when a
    mesh is in play; with b/accum not divisible by the data axis GSPMD
    would reshard each microbatch inside the scan).
    """
    argnums = (0, 1) if finetune_c3d else 0
    vg = jax.value_and_grad(loss_fn, argnums=argnums)
    if accum_steps == 1:
        return vg

    def tree_zeros(tree):
        return jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape, x.dtype), tree)

    def grads(gaze_params, c3d_params, batch, k_drop):
        b = jax.tree_util.tree_leaves(batch)[0].shape[0]
        if b % accum_steps:
            raise ValueError(f"batch size {b} not divisible by "
                             f"accum_steps {accum_steps}")
        micro = {
            k: jnp.moveaxis(
                v.reshape(b // accum_steps, accum_steps, *v.shape[1:]),
                1, 0)
            for k, v in batch.items()
        }
        keys = jax.random.split(k_drop, accum_steps)
        zeros = ((tree_zeros(gaze_params), tree_zeros(c3d_params))
                 if finetune_c3d else tree_zeros(gaze_params))

        def body(carry, xs):
            mb, key = xs
            loss, g = vg(gaze_params, c3d_params, mb, key)
            return (carry[0] + loss,
                    jax.tree_util.tree_map(jnp.add, carry[1], g)), None

        (loss_sum, grad_sum), _ = jax.lax.scan(
            body, (jnp.float32(0.0), zeros), (micro, keys))
        inv = 1.0 / accum_steps
        return (loss_sum * inv,
                jax.tree_util.tree_map(lambda g: g * inv, grad_sum))

    return grads


def make_fused_raw_step(gaze_model: GazeModel, tx, *,
                        finetune_c3d: bool = False,
                        c3d_tx=None,
                        use_flip: Optional[bool] = None,
                        compute_dtype=jnp.bfloat16,
                        remat_c3d: Optional[bool] = None,
                        accum_steps: int = 1):
    """The UN-JITTED fused train-step body: flip augmentation, grads,
    optax update(s). One definition shared by the single-chip jit
    (`make_fused_train_step`) and the mesh-partitioned wrapper
    (`parallel.sharding.make_sharded_fused_train_step`), so a change to
    the step math cannot silently diverge between the two paths.

    finetune_c3d=True: `step(gaze, opt, c3d, batch, rng) -> (gaze,
    (gaze_opt, c3d_opt), c3d, metrics)`; False: `-> (gaze, opt, metrics)`
    with the frozen tower passed through by the caller.
    """
    import optax

    flip = gaze_model.cfg.use_flip_batch if use_flip is None else use_flip
    c3d_tx = c3d_tx if c3d_tx is not None else tx
    if remat_c3d is None:
        remat_c3d = finetune_c3d

    loss_fn = make_fused_loss_fn(gaze_model, compute_dtype=compute_dtype,
                                 remat_c3d=remat_c3d)
    grads_fn = make_fused_grads_fn(loss_fn, finetune_c3d=finetune_c3d,
                                   accum_steps=accum_steps)

    if finetune_c3d:
        def raw_step(gaze_params, opt_state, c3d_params, batch, rng):
            k_flip, k_drop = jax.random.split(rng)
            if flip:
                batch = flip_half_video_batch(batch, k_flip)
            gaze_opt, c3d_opt = opt_state
            loss, (g_gaze, g_c3d) = grads_fn(gaze_params, c3d_params,
                                             batch, k_drop)
            updates, gaze_opt = tx.update(g_gaze, gaze_opt, gaze_params)
            gaze_params = optax.apply_updates(gaze_params, updates)
            c3d_up, c3d_opt = c3d_tx.update(g_c3d, c3d_opt, c3d_params)
            c3d_params = optax.apply_updates(c3d_params, c3d_up)
            return (gaze_params, (gaze_opt, c3d_opt), c3d_params,
                    {"loss": loss})
        return raw_step

    def raw_step(gaze_params, opt_state, c3d_params, batch, rng):
        k_flip, k_drop = jax.random.split(rng)
        if flip:
            batch = flip_half_video_batch(batch, k_flip)
        loss, grads = grads_fn(gaze_params, c3d_params, batch, k_drop)
        updates, opt_state = tx.update(grads, opt_state, gaze_params)
        gaze_params = optax.apply_updates(gaze_params, updates)
        return gaze_params, opt_state, {"loss": loss}

    return raw_step


def make_fused_train_step(gaze_model: GazeModel, tx, *,
                          finetune_c3d: bool = False,
                          c3d_tx=None,
                          use_flip: Optional[bool] = None,
                          compute_dtype=jnp.bfloat16,
                          remat_c3d: Optional[bool] = None,
                          accum_steps: int = 1):
    """End-to-end training FROM RAW VIDEO: the C3D extractor sits inside
    the training graph, so the host ships uint8/float frames instead of
    fp32 conv5b features (~12x less wire traffic — BENCHMARKS.md "input
    transfer dominates"). The reference cannot do this at all: its C3D is
    an offline C++ subprocess with no gradient path
    (`extract_C3D_features.py:689-724`).

    Returns jitted `step(gaze_params, opt_state, c3d_params, batch, rng)
    -> (gaze_params, opt_state, c3d_params, metrics)`. batch: {"video":
    [B,F,H,W,3] pixels 0..255, "gazemaps": [B,T,GH,GW]} with T =
    pipeline_timesteps(F). Build `opt_state` with `init_fused_opt_state`.

    finetune_c3d=False (default, the reference's frozen-feature-extractor
    regime): gradients flow only to the gaze model; c3d_params pass
    through untouched and no backward runs through the 3-D conv tower
    (the gaze loss does not depend on C3D's weights via the gaze params,
    so the tower's VJP is never built).

    finetune_c3d=True (beyond reference — JOINT end-to-end fine-tuning):
    the loss is differentiated w.r.t. BOTH trees and each gets its own
    optax update — `c3d_tx` (default `tx`) for the tower, e.g. a smaller
    LR for a Sports-1M-pretrained backbone. The tower is rematerialized
    (`jax.checkpoint`) by default so the backward pass recomputes conv
    activations instead of storing ~2 GB of them per bench-sized batch;
    pass remat_c3d=False to keep residuals when memory allows.

    Regularization matches the feature-fed step
    (`train/state.make_train_step`): `rng` drives the random half-batch
    horizontal flip (per `use_flip` / cfg.use_flip_batch) and the gaze
    model's dropout.

    `accum_steps > 1`: gradient accumulation (`make_fused_grads_fn`) —
    raw-video batches are where activation memory actually bites
    ([B,F,H,W,3] frames plus C3D intermediates), so a big logical batch
    can train in accum_steps microbatch passes with one update.
    """
    raw_step = make_fused_raw_step(
        gaze_model, tx, finetune_c3d=finetune_c3d, c3d_tx=c3d_tx,
        use_flip=use_flip, compute_dtype=compute_dtype,
        remat_c3d=remat_c3d, accum_steps=accum_steps)

    if finetune_c3d:
        return jax.jit(raw_step, donate_argnums=(0, 1, 2))

    jitted = jax.jit(raw_step, donate_argnums=(0, 1))

    def step(gaze_params, opt_state, c3d_params, batch, rng):
        # c3d_params pass through on the HOST side: returning a
        # non-donated input from the jit would copy the whole tower
        gaze_params, opt_state, metrics = jitted(gaze_params, opt_state,
                                                 c3d_params, batch, rng)
        return gaze_params, opt_state, c3d_params, metrics

    step.jitted = jitted  # for cost analysis (utils.mfu.compiled_flops)
    return step
