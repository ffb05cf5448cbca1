"""Temporal (sequence) sharding for long-video inference.

Batch parallelism (`sharding.py`) needs many clips to fill the mesh; a
SINGLE long video leaves devices idle. But the pipeline's FLOPs are almost
entirely in C3D's 3-D convs, which are independent per 16-frame window —
only the tiny ConvGRU recurrence (7x7xU state) is sequential in time. So
for one stream we shard the WINDOW axis over the mesh:

    video [B, F, H, W, 3]   — frame axis F sharded over "data"
      -> clip windows [B*W, 16, H, W, 3]  (window-sharded 3-D convs,
         pinned by `with_sharding_constraint`; ~95% of pipeline FLOPs
         run at F/n_devices per device)
      -> conv5b features [B, T, 1024, 7, 7]  — all-gathered (small:
         ~100 KB/step bf16) to every device
      -> ConvGRU scan + decoder — replicated (sequential recurrence,
         <5% of FLOPs)

This is the SURVEY.md section 5 "long-context" stretch goal ("temporal
sharding where the BxT grid is sharded over mesh axes — noting the
recurrence itself is sequential, so the natural TPU parallel axes are
batch and the spatial/feature dims"): the C3D grid shards over time, the
recurrence stays sequential by construction. The reference's only answer
to long videos is chunking on one GPU (`models/extract_map.py:170-199`).

Composes with `models/streaming.py` for videos too long for one program:
temporally-sharded C3D per chunk + carried state across chunks.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.common import GazeModel
from .mesh import DATA_AXIS, params_shardings


def frame_axis_spec() -> P:
    """Raw video [B, F, H, W, 3]: shard the FRAME axis over "data"."""
    return P(None, DATA_AXIS)


def make_temporal_sharded_fused_predict(
        gaze_model: GazeModel, mesh: Mesh, *,
        compute_dtype=jnp.bfloat16,
        model_parallel: Optional[bool] = None) -> Callable:
    """jitted `fn(c3d_params, gaze_params, video) -> maps [B, T, GH, GW]`
    with the video's frame/window axis sharded over "data".

    Requirements: (F // 16) windows divisible by the "data" axis size, so
    each device owns an equal strip of windows. Output is replicated.
    """
    from ..models.pipeline import extract_and_predict

    n_data = mesh.shape[DATA_AXIS]
    video_sh = NamedSharding(mesh, frame_axis_spec())
    window_sh = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    cache: dict = {}

    def wrapper(c3d_params, gaze_params, video_frames):
        b = video_frames.shape[0]
        n_windows = video_frames.shape[1] // 16
        # the sharded axis is the FOLDED b*n_windows clip axis, so e.g.
        # 2 videos x 4 windows on an 8-device mesh is valid
        if (b * n_windows) % n_data:
            raise ValueError(
                f"temporal sharding needs batch*windows ({b}*{n_windows}) "
                f"divisible by the data axis ({n_data}); pad the video so "
                f"batch*windows is a multiple of {n_data}")
        # in_shardings splits the RAW frame axis F (= windows*16) across
        # "data" before the fold, so F itself must divide too; e.g. b=32,
        # n_windows=1 on a 32-wide data axis passes the folded check but
        # F=16 cannot split 32 ways
        if video_frames.shape[1] % n_data:
            raise ValueError(
                f"temporal sharding splits the frame axis "
                f"({video_frames.shape[1]} frames) over the data axis "
                f"({n_data}); frame count must be a multiple of {n_data} "
                f"(add batch so clips, not frames, carry the parallelism, "
                f"or pad frames to a multiple of 16*{n_data})")
        key = (jax.tree_util.tree_structure(gaze_params),
               video_frames.shape)
        jitted = cache.get(key)
        if jitted is None:
            c3d_sh = params_shardings(c3d_params, mesh, False)
            gaze_sh = params_shardings(gaze_params, mesh, model_parallel)
            jitted = jax.jit(
                lambda cp, gp, v: extract_and_predict(
                    cp, gp, gaze_model, v, compute_dtype=compute_dtype,
                    window_constraint=lambda x:
                        jax.lax.with_sharding_constraint(x, window_sh),
                    stream_constraint=lambda x:
                        jax.lax.with_sharding_constraint(x, repl)),
                in_shardings=(c3d_sh, gaze_sh, video_sh),
                out_shardings=repl,
            )
            cache[key] = jitted
        return jitted(c3d_params, gaze_params, video_frames)

    return wrapper


def make_temporal_sharded_extract(mesh: Mesh, *,
                                  compute_dtype=jnp.bfloat16) -> Callable:
    """jitted `fn(c3d_params, video [B, F, H, W, 3]) -> features
    [B, n_windows, 1024, 7, 7]` with windows sharded over "data" and the
    features left window-sharded — the building block for feeding
    temporally-sharded features into `models/streaming.py` chunk steps
    (each host/device strip can stream its features out independently)."""
    from ..models import c3d as c3d_model

    n_data = mesh.shape[DATA_AXIS]
    video_sh = NamedSharding(mesh, frame_axis_spec())
    window_sh = NamedSharding(mesh, P(DATA_AXIS))
    feats_sh = NamedSharding(mesh, P(None, DATA_AXIS))

    def fn(c3d_params, video_frames):
        b, f = video_frames.shape[:2]
        n_windows = f // 16
        windows = video_frames[:, :n_windows * 16].reshape(
            b, n_windows, 16, *video_frames.shape[2:])
        clips = windows.reshape(b * n_windows, 16, *video_frames.shape[2:])
        clips = jax.lax.with_sharding_constraint(clips, window_sh)
        clips = c3d_model.preprocess_frames(clips)
        feats = c3d_model.apply(c3d_params, clips, feature_layer="conv5b",
                                compute_dtype=compute_dtype)
        feats = c3d_model.conv5b_to_rgp(feats)
        feats = feats.reshape(b, n_windows, 1024, 7, 7)
        return jax.lax.with_sharding_constraint(feats, feats_sh)

    cache: dict = {}

    def wrapper(c3d_params, video_frames):
        n_windows = video_frames.shape[1] // 16
        # unlike the fused predict (which shards the folded b*n_windows
        # axis and replicates the output), the OUTPUT here stays
        # window-sharded per batch element, so n_windows itself must
        # split evenly
        if n_windows % n_data:
            raise ValueError(
                f"temporal extract keeps features window-sharded, so "
                f"windows ({n_windows}) must be divisible by the data "
                f"axis ({n_data}); pad the video to a multiple of "
                f"{16 * n_data} frames")
        # in_shardings also splits the RAW frame axis (same hazard the
        # fused-predict wrapper guards above): F = 16*n_windows + r
        # leftover frames passes the window check but dies inside jit
        # with an opaque non-divisible-sharding error
        if video_frames.shape[1] % n_data:
            raise ValueError(
                f"temporal extract splits the frame axis "
                f"({video_frames.shape[1]} frames) over the data axis "
                f"({n_data}); truncate the leftover partial window so the "
                f"frame count is a multiple of {n_data} (whole 16-frame "
                f"windows already satisfy this)")
        key = video_frames.shape
        jitted = cache.get(key)
        if jitted is None:
            jitted = jax.jit(
                fn,
                in_shardings=(params_shardings(c3d_params, mesh, False),
                              video_sh),
                out_shardings=feats_sh,
            )
            cache[key] = jitted
        return jitted(c3d_params, video_frames)

    return wrapper
