"""End-to-end training FROM RAW VIDEO as a product surface.

The reference cannot train from video at all: its C3D is an offline Caffe
subprocess (`/root/reference/C3D/.../extract_C3D_features.py:689-724`) whose
`.c3d` pickles a separate TF process later consumes
(`crc_input_data_seq.py:318-347`). Here the extractor lives inside the jitted
training graph (`models/pipeline.make_fused_train_step`), so a training run
needs only `.avi` files plus processed gaze `.mat` files — no feature-
extraction stage, ~12x less host->device wire traffic (uint8 pixels instead
of fp32 conv5b maps), and optionally JOINT fine-tuning of the 3-D conv tower.

This module supplies the pieces the CLI (`cli/train_fused.py`) wires up:

  * `RawVideoDataset` — fixed-shape raw-pixel clips + aligned gazemaps
  * `load_fused_corpus` — decode a videos dir + gazemap .mat dir into one
  * `make_synthetic_fused_corpus` — hermetic learnable stand-in corpus
  * `FusedTrainState` + `fit_fused` — checkpointed/resumable training loop
    mirroring `train/loop.fit`'s cadences on the fused step
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..models import pipeline
from ..models.common import GazeModel
from ..utils import log
from .checkpoint import Checkpointer

# Temporal protocol shared with `models/pipeline.extract_and_predict`:
# gaze targets align with the model's subsampled frame stream
# ([15::5], `crc_input_data_seq.py:186`), truncated to
# pipeline_timesteps(F) = min(F // 16, ceil((F - 15) / 5)).
FRAME_OFFSET = 15
FRAME_STRIDE = 5


@dataclasses.dataclass
class RawVideoDataset:
    """Raw-pixel clips at a fixed frame count.

    video    [N, F, H, W, 3] uint8 pixels (shipped uint8; the fused graph
             casts/preprocesses on device)
    gazemaps [N, T, GH, GW]  float32, T = pipeline_timesteps(F)
    """

    video: np.ndarray
    gazemaps: np.ndarray
    clipnames: list

    def __post_init__(self):
        assert len(self.video) == len(self.gazemaps)
        t = pipeline.pipeline_timesteps(self.video.shape[1])
        assert self.gazemaps.shape[1] == t, \
            (f"gazemaps T={self.gazemaps.shape[1]} does not match "
             f"pipeline_timesteps({self.video.shape[1]})={t}")
        self._index = 0
        self.epochs_completed = 0

    def __len__(self) -> int:
        return len(self.video)

    def shuffle(self, seed: int = 3027300) -> None:
        perm = np.random.RandomState(seed).permutation(len(self))
        self.video = self.video[perm]
        self.gazemaps = self.gazemaps[perm]
        self.clipnames = [self.clipnames[i] for i in perm]

    def next_batch(self, batch_size: int) -> dict:
        start = self._index
        self._index += batch_size
        if self._index > len(self):
            self.epochs_completed += 1
            start = 0
            self._index = batch_size
            assert batch_size <= len(self), \
                f"batch_size {batch_size} > dataset size {len(self)}"
        end = self._index
        return {"video": self.video[start:end],
                "gazemaps": self.gazemaps[start:end],
                "clipnames": self.clipnames[start:end]}

    def split(self, n_valid: int) -> tuple["RawVideoDataset",
                                           Optional["RawVideoDataset"]]:
        """Hold out the LAST n_valid clips as a validation set."""
        if n_valid <= 0 or n_valid >= len(self):
            return self, None
        cut = len(self) - n_valid
        return (RawVideoDataset(self.video[:cut], self.gazemaps[:cut],
                                self.clipnames[:cut]),
                RawVideoDataset(self.video[cut:], self.gazemaps[cut:],
                                self.clipnames[cut:]))


def _gaze_targets_for_clip(mat_path: str, num_frames: int,
                           gazemap_hw: tuple[int, int]) -> np.ndarray:
    """Per-frame mean-over-users blurred gazemaps, subsampled to the fused
    pipeline's T. Follows the CRC loader protocol (`data/crc.read_clip`,
    `crc_input_data_seq.py:271-295`): mean of per-user resolution-matched
    maps, missing frames filled, Gaussian blur at the resolution's sigma."""
    import h5py

    from ..data.gazemap import (
        apply_gaussian_filter,
        fill_missing_frames,
        gazemap_key_and_sigma,
    )

    gh, gw = gazemap_hw
    key, sigma = gazemap_key_and_sigma(gh, gw)
    t = pipeline.pipeline_timesteps(num_frames)
    with h5py.File(mat_path, "r") as mat:
        # root group name is whatever MATLAB wrote, not necessarily "data"
        # (same as data/crc.read_clip)
        root = list(mat.values())[0]
        users = []
        for name in root.keys():
            user = root[name]
            if key not in user:
                log.warn("%s: user %s lacks %s — run cli/process_gazemap "
                         "over the corpus first", mat_path, name, key)
                continue
            if "pupilsize" in user and np.isnan(
                    np.min(np.asarray(user["pupilsize"]))):
                continue  # tracking dropout user (crc.read_clip parity)
            users.append(np.asarray(user[key], np.float32))
    if not users:
        raise ValueError(f"{mat_path}: no usable users with {key}")
    # gazelen heuristic + per-user [15::5] subsample BEFORE averaging,
    # exactly like data/crc.read_clip (crc_input_data_seq.py:261-280)
    if len(users) >= 2:
        gazelen = max(len(users[0]), len(users[1])) - 10
    else:
        gazelen = len(users[0]) - 10
    subs = [u[FRAME_OFFSET:gazelen:FRAME_STRIDE]
            for u in users if len(u) > gazelen - 1]
    if not subs:
        raise ValueError(f"{mat_path}: no gaze record of length >= {gazelen}")
    mean = np.mean(np.asarray(subs, dtype=np.float32), axis=0)
    # records store (W, H); training targets are (H, W)
    # (crc_input_data_seq.py:280 via data/crc.read_clip)
    mean = np.swapaxes(mean, 1, 2).copy()
    if len(mean) and mean.reshape(len(mean), -1).sum(axis=1).min() == 0:
        mean = fill_missing_frames(mean)
    apply_gaussian_filter(mean, sigma)
    sub = mean[:t]
    if len(sub) < t:  # video padded past the gaze record: repeat last map
        pad = np.repeat(sub[-1:] if len(sub) else
                        np.full((1, gh, gw), 1.0 / (gh * gw), np.float32),
                        t - len(sub), axis=0)
        sub = np.concatenate([sub, pad]) if len(sub) else pad
    return sub.astype(np.float32) + 1e-6


def load_fused_corpus(videos_root: str, gaze_root: str, *,
                      num_frames: int = 80,
                      frame_hw: tuple[int, int] = (128, 171),
                      gazemap_hw: tuple[int, int] = (49, 49),
                      max_clips: Optional[int] = None) -> RawVideoDataset:
    """Decode `{videos_root}/*.avi` + read `{gaze_root}/<clip>.mat`.

    Videos are truncated/zero-padded to `num_frames` (static jit shape,
    like `cli/extract_map.py`) and host-resized to `frame_hw` — default
    128x171, the C3D VIDEO_DATA resize target
    (`extract_C3D_features.py:204-216`), so the graph skips its in-graph
    resize and the wire carries the minimum uint8 bytes.
    """
    import glob as globlib

    from ..data import video as video_lib

    paths = sorted(globlib.glob(os.path.join(videos_root, "*.avi")) +
                   globlib.glob(os.path.join(videos_root, "*.mp4")))
    if max_clips:
        paths = paths[:max_clips]
    if not paths:
        raise ValueError(f"no videos under {videos_root}")
    fh, fw = frame_hw
    vids, gazes, names = [], [], []
    for path in paths:
        clip = os.path.splitext(os.path.basename(path))[0]
        mat_path = os.path.join(gaze_root, clip + ".mat")
        if not os.path.exists(mat_path):
            log.warn("skipping %s: no gaze record %s", clip, mat_path)
            continue
        frames = []
        for frame in video_lib.decode_video(path):
            frames.append(_resize_uint8(frame, fh, fw))
            if len(frames) >= num_frames:
                break
        if not frames:
            log.warn("skipping %s: decoded no frames", clip)
            continue
        stacked = np.stack(frames)
        if len(stacked) < num_frames:
            pad = np.zeros((num_frames - len(stacked),) + stacked.shape[1:],
                           stacked.dtype)
            stacked = np.concatenate([stacked, pad])
        try:
            gaze = _gaze_targets_for_clip(mat_path, num_frames, gazemap_hw)
        except ValueError as e:
            # e.g. an all-zero gazemap record (`gazemap.fill_missing_frames`
            # raises) — skip the clip like `data/crc.read_clip` does instead
            # of aborting the whole corpus load
            log.warn("skipping %s: %s", clip, e)
            continue
        vids.append(stacked)
        gazes.append(gaze)
        names.append(clip)
    if not vids:
        raise ValueError(f"no usable (video, gaze) pairs under "
                         f"{videos_root} / {gaze_root}")
    return RawVideoDataset(np.stack(vids), np.stack(gazes), names)


def _resize_uint8(frame: np.ndarray, h: int, w: int) -> np.ndarray:
    if frame.shape[:2] == (h, w):
        return frame.astype(np.uint8)
    try:
        import cv2

        return cv2.resize(frame, (w, h),
                          interpolation=cv2.INTER_LINEAR).astype(np.uint8)
    except ImportError:
        out = jax.image.resize(frame.astype(np.float32), (h, w, 3),
                               method="bilinear")
        return np.clip(np.asarray(out), 0, 255).astype(np.uint8)


def make_synthetic_fused_corpus(n_clips: int = 8, *, num_frames: int = 80,
                                frame_hw: tuple[int, int] = (64, 80),
                                gazemap_hw: tuple[int, int] = (49, 49),
                                seed: int = 0, mode: str = "bright",
                                walk_bounds: Optional[tuple] = None
                                ) -> RawVideoDataset:
    """Learnable raw-video corpus: the gaze target tracks a blob walking
    across gray-noise frames — the raw-pixel analog of
    `data/synthetic.make_clip_windows` (which generates pre-extracted
    features and cannot exercise the fused path).

    mode="bright" (default): one saturated-white blob; gaze follows it.
    Any spatially-selective feature encoding (even a RANDOM frozen C3D
    tower) transmits its position, so this mode measures whether the
    fused training path learns at all.

    mode="flicker": TWO equal-mean-brightness blobs walk independently —
    the gaze target flickers frame-to-frame (amplitude +-60 around 120)
    while the distractor holds steady at 120. Per-frame appearance is
    identical; only the TEMPORAL signature distinguishes them.

    mode="period": both blobs FLICKER, distinguished only by temporal
    FREQUENCY — the gaze target alternates every frame (+-35, period 2),
    the distractor every 2 frames (+-70, period 4) — with global
    brightness jitter (+-15) on every frame. Amplitudes are chosen so
    the mean per-frame |delta| is EQUAL (70) and the distractor carries
    MORE temporal variance (4900 vs 1225), so a naive temporal-contrast
    energy detector prefers the WRONG blob.

    Measured A/B results (BENCHMARKS.md "frozen vs --finetune_c3d"):
    fine-tuning beats frozen on BOTH temporal corpora but by small
    margins at full readout width (flicker +0.027 best-CC, period
    +0.016 best / +0.009 last-3) — a frozen RANDOM tower's nonlinearity
    converts either temporal signature into channel-energy differences
    a 1024-channel readout can decode, echoing the classic
    random-features result. At a CONSTRAINED readout (--dim_cnn_proj
    48) joint training at the default c3d_lr is unstable and LOSES to
    frozen (measured; see BENCHMARKS) — fine-tune LR needs care when
    the readout is narrow.

    `walk_bounds` clamps the normalized random walk; note
    `c3d.preprocess_frames` center-crops 112/171 of the width, so
    positions outside ~[0.18, 0.82] horizontally leave the C3D stream's
    view (the rehearsal passes tighter bounds).
    """
    if mode not in ("bright", "flicker", "period"):
        raise ValueError(f"unknown corpus mode {mode!r}")
    rng = np.random.RandomState(seed)
    fh, fw = frame_hw
    gh, gw = gazemap_hw
    t = pipeline.pipeline_timesteps(num_frames)
    lo, hi = walk_bounds if walk_bounds is not None else (
        (0.15, 0.85) if mode == "bright" else (0.25, 0.75))

    def walk(key_offset: int = 0) -> np.ndarray:
        wrng = np.random.RandomState(seed + key_offset)
        pos = wrng.rand(n_clips, 2) * (hi - lo - 0.2) + lo + 0.1
        steps = np.zeros((n_clips, num_frames, 2))
        for step in range(num_frames):
            pos = np.clip(pos + wrng.randn(n_clips, 2) * 0.01, lo, hi)
            steps[:, step] = pos
        return steps

    traj = walk()
    video = rng.randint(0, 70, (n_clips, num_frames, fh, fw, 3),
                        np.uint8)
    r = max(2, fh // 12)

    def draw(blob_traj: np.ndarray, brightness) -> None:
        """brightness: scalar or per-frame array [num_frames]."""
        ys = (blob_traj[..., 0] * (fh - 1)).astype(int)
        xs = (blob_traj[..., 1] * (fw - 1)).astype(int)
        for ci in range(n_clips):
            for fi in range(num_frames):
                y0, x0 = ys[ci, fi], xs[ci, fi]
                bval = brightness if np.isscalar(brightness) \
                    else brightness[fi]
                video[ci, fi, max(0, y0 - r):y0 + r,
                      max(0, x0 - r):x0 + r] = bval

    frames_idx = np.arange(num_frames)
    if mode == "bright":
        draw(traj, 255)
    elif mode == "flicker":
        flick = 120 + 60 * np.where(frames_idx % 2 == 0, 1, -1)
        draw(traj, flick)           # target: mean 120, flickering
        draw(walk(key_offset=777), 120)  # distractor: steady 120
    else:  # period
        fast = 120 + 35 * np.where(frames_idx % 2 == 0, 1, -1)
        slow = 120 + 70 * np.where((frames_idx // 2) % 2 == 0, 1, -1)
        draw(walk(key_offset=777), slow)  # distractor first ...
        draw(traj, fast)  # ... so the target overdraws on overlap
        # global jitter AFTER drawing: every pixel, every frame
        jit = rng.randint(-15, 16, (n_clips, num_frames, 1, 1, 1))
        video = np.clip(video.astype(np.int16) + jit, 0, 255) \
            .astype(np.uint8)

    sub = traj[:, FRAME_OFFSET::FRAME_STRIDE][:, :t]
    yy = np.arange(gh).reshape(1, 1, gh, 1)
    xx = np.arange(gw).reshape(1, 1, 1, gw)
    cy = (sub[..., 0] * (gh - 1))[..., None, None]
    cx = (sub[..., 1] * (gw - 1))[..., None, None]
    gaze = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 2.0 ** 2))
    gaze = gaze.astype(np.float32) + 1e-4
    names = [f"synthetic{ci:04d}" for ci in range(n_clips)]
    return RawVideoDataset(video, gaze, names)


# ------------------------------------------------------------- train state

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FusedTrainState:
    gaze_params: dict
    opt_state: object
    c3d_params: dict
    step: jax.Array  # scalar int32


def make_fused_eval_step(gaze_model: GazeModel, *,
                         compute_dtype=jnp.bfloat16) -> Callable:
    """Jitted validation loss on raw-video batches (dropout off, no flip) —
    the fused analog of `train/state.make_eval_step`."""
    from ..models.common import sequence_loss
    from ..ops.normalize import normalize_probability_map

    @jax.jit
    def eval_step(gaze_params, c3d_params, batch):
        logits = pipeline.extract_and_predict(
            c3d_params, gaze_params, gaze_model, batch["video"],
            compute_dtype=compute_dtype, logits=True, train=False)
        gt = batch["gazemaps"]
        if gaze_model.cfg.loss_type in ("xentropy", "kld"):
            gt = normalize_probability_map(gt)
        return {"loss": sequence_loss(logits, gt, gaze_model.cfg.loss_type)}

    return eval_step


def _device_batch(batch: dict, mesh=None) -> dict:
    if mesh is not None:
        from ..parallel import shard_batch

        return shard_batch(batch, mesh)
    return {k: jnp.asarray(v) for k, v in batch.items() if k != "clipnames"}


def fit_fused(gaze_model: GazeModel, state: FusedTrainState, tx,
              train_data: RawVideoDataset, exp: ExperimentConfig, *,
              valid_data: Optional[RawVideoDataset] = None,
              finetune_c3d: bool = False,
              c3d_tx=None,
              compute_dtype=jnp.bfloat16,
              train_dir: Optional[str] = None,
              mesh=None,
              metric_writer: Optional[Callable[[int, dict], None]] = None
              ) -> FusedTrainState:
    """Train the fused raw-video program until `exp.schedule.max_steps`.

    Mirrors `train/loop.fit`'s contract on the fused step: reference
    logging cadences, periodic + final checkpointing with auto-resume
    (both param trees and the optimizer state round-trip, so a resumed
    joint fine-tune continues exactly), SIGTERM checkpoint-and-stop.

    `mesh` (a `jax.sharding.Mesh`) switches the step to
    `parallel.make_sharded_fused_train_step`: the video batch shards over
    the "data" axis (gradients psum over ICI), gaze params follow the
    model-parallel rules, and batch_size must divide by the data axis.
    """
    import signal

    from .state import build_schedule

    sched_cfg = exp.schedule
    batch_size = gaze_model.cfg.batch_size
    rng = jax.random.PRNGKey(exp.seed)
    lr_schedule = build_schedule(exp.optimizer)

    accum = max(int(getattr(exp.optimizer, "accum_steps", 1) or 1), 1)
    if mesh is not None:
        from ..parallel import DATA_AXIS, make_sharded_fused_train_step

        n_data = mesh.shape[DATA_AXIS]
        if batch_size % n_data:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"the data axis ({n_data})")
        if accum > 1 and batch_size % (n_data * accum):
            # each microbatch has batch_size/accum rows; those rows must
            # still split evenly over the data axis or GSPMD reshards the
            # microbatch inside the accumulation scan every step
            raise ValueError(
                f"batch_size {batch_size} not divisible by data axis * "
                f"accum_steps ({n_data} * {accum}); microbatches would be "
                f"unbalanced across data shards")
        train_step = make_sharded_fused_train_step(
            gaze_model, tx, mesh, finetune_c3d=finetune_c3d, c3d_tx=c3d_tx,
            compute_dtype=compute_dtype, accum_steps=accum)
    else:
        train_step = pipeline.make_fused_train_step(
            gaze_model, tx, finetune_c3d=finetune_c3d, c3d_tx=c3d_tx,
            compute_dtype=compute_dtype, accum_steps=accum)
    eval_step = make_fused_eval_step(gaze_model,
                                     compute_dtype=compute_dtype)

    ckpt = None
    if train_dir is not None:
        ckpt = Checkpointer(train_dir)
        ckpt.save_config(exp)
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), state)
        restored = ckpt.restore_latest(abstract)
        if restored is not None:
            state = restored
            log.info(" [Checkpoint] resumed fused run at step %d",
                     int(state.step))

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

    if valid_data is not None and len(valid_data) < batch_size:
        log.warn(
            "validation set has %d clips < batch_size %d: validation will "
            "never run (lower --batch_size or hold out more clips)",
            len(valid_data), batch_size)

    try:
        gaze_params, opt_state, c3d_params = (state.gaze_params,
                                              state.opt_state, state.c3d_params)
        if not finetune_c3d:
            # place the frozen tower ONCE: it is never a jit output, so
            # NumPy-backed leaves (the --c3d_weights *.npz path) would
            # otherwise be re-transferred host->device (~full tower per
            # step) — and on a mesh, re-broadcast through in_shardings
            if mesh is not None:
                from ..parallel import replicate

                c3d_params = replicate(c3d_params, mesh)
            else:
                c3d_params = jax.device_put(c3d_params)
        step = int(state.step)
        n_train = max(len(train_data), 1)
        last_logged_step, t_logged = step, time.time()
        while step < sched_cfg.max_steps and not stop_requested["flag"]:
            batch = _device_batch(train_data.next_batch(batch_size), mesh)
            # key is a pure function of (seed, step) — like
            # `train/state.make_train_step`'s fold_in(rng, state.step) — so a
            # resumed run at step N draws the same flip/dropout randomness the
            # uninterrupted run would have, not a replay of steps 1..N's keys
            k_step = jax.random.fold_in(rng, step)
            gaze_params, opt_state, c3d_params, metrics = train_step(
                gaze_params, opt_state, c3d_params, batch, k_step)
            step += 1

            if step % sched_cfg.steps_per_logprint == 0:
                loss = float(metrics["loss"])  # device sync happens HERE
                t1 = time.time()
                sec_per_batch = (t1 - t_logged) / max(step - last_logged_step, 1)
                last_logged_step, t_logged = step, t1
                lr = float(lr_schedule(step))
                log.info(
                    " [fused epoch %.1f / step %4d] %s loss: %.5f "
                    "(%.3f sec/batch, %.3f instances/sec) (lr=%.3g)",
                    step * batch_size / n_train, step,
                    (exp.train_tag + " |" if exp.train_tag else ""),
                    loss, sec_per_batch,
                    batch_size / max(sec_per_batch, 1e-9), lr)
                if metric_writer:
                    metric_writer(step, {"loss/train": loss,
                                         "learning_rate": lr})

            if ckpt is not None and step % sched_cfg.steps_per_checkpoint == 0:
                state = FusedTrainState(gaze_params, opt_state, c3d_params,
                                        jnp.asarray(step, jnp.int32))
                ckpt.save(state)

            if valid_data is not None and len(valid_data) >= batch_size \
                    and step % sched_cfg.steps_per_validation == 0:
                vbatch = _device_batch(valid_data.next_batch(batch_size),
                                       mesh)
                vloss = float(eval_step(gaze_params, c3d_params,
                                        vbatch)["loss"])
                log.infov(" [val   step %4d] fused loss: %.5f", step, vloss)
                if metric_writer:
                    metric_writer(step, {"loss/val": vloss})

        state = FusedTrainState(gaze_params, opt_state, c3d_params,
                                jnp.asarray(step, jnp.int32))
        if ckpt is not None:
            ckpt.save(state, wait=True)
            ckpt.close()
    finally:
        # restore on every exit path: a leaked handler leaves the
        # process uninterruptible after a failed run
        for sig, handler in prev_handlers.items():
            signal.signal(sig, handler)
    return state
