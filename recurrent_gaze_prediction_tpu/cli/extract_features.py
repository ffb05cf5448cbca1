"""C3D feature extraction: video files -> `.c3d` feature artifacts.

CLI rebuild of the reference's offline native pipeline
(`/root/reference/C3D/.../extract_C3D_features.py:801-926` and its batch
driver `extract_C3D_features_script.py:12-21`): decode each video, take
non-overlapping 16-frame windows (`extract_C3D_features.py:866`:
range(0, num_frames, 16)), run the Sports-1M C3D network, and aggregate
the per-window feature blobs into a pickled `{video_id}.c3d` consumed by
`cli/extract_map.py` and the action task. Where the reference shells out
to a CUDA Caffe binary per video (subprocess, GPU 0, batch 50,
`extract_C3D_features.py:689-724`), this runs the same network IN-GRAPH
as one jitted XLA program with device-batched windows.

The `--attention_maps_root` option reproduces the gaze-weighted
"attention" variant (`add_attention`, `extract_C3D_features.py:739-761`):
frames are multiplied by a per-frame gaze map before extraction —
composing with `extract_map.py` output, whose `{clip}.gazemap.npy` files
are accepted directly.

Weights come from the real Sports-1M caffemodel (`--caffemodel`, parsed
by `compat/caffemodel.py`) or an orbax/npz params file (`--params`);
without either the network is randomly initialized (loud warning —
useful only for pipeline testing).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Optional

import jax
import numpy as np

from ..data import codec, video
from ..utils import log, mkdir_p


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--videos", nargs="*", default=None,
                        help="video files to process")
    parser.add_argument("--videos_root", default=None,
                        help="directory scanned for video files "
                             "(.avi/.mp4/.mkv/.mov)")
    parser.add_argument("--out_dir", required=True,
                        help="writes {video_id}.c3d per video")
    parser.add_argument("--frames_dir", default=None,
                        help="optionally dump width-400 frame JPEGs per "
                             "video, like the reference's extract_frames "
                             "(`extract_C3D_features.py:129-178`)")
    from ..models.c3d import FEATURE_LAYERS

    parser.add_argument("--feature_layer", default="conv5b",
                        choices=list(FEATURE_LAYERS),
                        help="network tap to export")
    parser.add_argument("--caffemodel", default=None,
                        help="Sports-1M .caffemodel to load weights from")
    parser.add_argument("--params", default=None,
                        help=".npz of C3D params (flat keys like conv1a_w, "
                             "or conv1a/w)")
    parser.add_argument("--attention_maps_root", default=None,
                        help="directory of {video_id}.gazemap.npy gaze "
                             "maps; frames are gaze-weighted before "
                             "extraction (the reference's add_attention)")
    parser.add_argument("--batch_windows", default=16, type=int,
                        help="16-frame windows per device batch")
    parser.add_argument("--compute_dtype", default="bfloat16",
                        choices=["bfloat16", "float32"],
                        help="conv tower compute dtype (bfloat16 rides "
                             "the MXU; float32 for bit-exactness)")
    parser.add_argument("--bgr", default=None, action="store_true",
                        help="reorder decoded RGB frames to BGR before the "
                             "network (Caffe/OpenCV trained order). Default:"
                             " ON when --caffemodel is given, OFF otherwise")
    parser.add_argument("--no_bgr", dest="bgr", action="store_false")
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--reverse", action="store_true",
                        help="sweep the video list from the end "
                             "(two-worker sharding, extract_map.py:118)")
    return parser


def _load_params(args):
    from ..models import c3d as c3d_model

    if args.caffemodel:
        from ..compat import caffemodel

        log.infov("loading C3D weights from %s", args.caffemodel)
        return caffemodel.c3d_params_from_caffemodel(args.caffemodel)
    if args.params:
        log.infov("loading C3D params from %s", args.params)
        blob = np.load(args.params)
        # the C3D pytree is FLAT ('conv1a_w', 'fc6_b', ...); also accept
        # 'conv1a/w'-style keys by joining
        return {key.replace("/", "_"): np.asarray(blob[key])
                for key in blob.files}
    log.error("no --caffemodel/--params given: using RANDOM weights "
              "(features are only useful for pipeline testing)")
    return c3d_model.init_params(jax.random.PRNGKey(0))


def _blob_layout(features: np.ndarray, feature_layer: str) -> np.ndarray:
    """One window's tap -> the reference blob layout.

    conv taps arrive NDHWC `[D, H, W, C]` (batch removed) and become the
    blob's `[C, D, H, W]` (channel, length, height, width —
    `read_binary_blob`, `extract_C3D_features.py:62-76`); flat fc/prob
    taps become `[C, 1, 1, 1]`.
    """
    if features.ndim == 4:
        return np.transpose(features, (3, 0, 1, 2))
    return features.reshape(-1, 1, 1, 1)


def attention_frame_index(n_frames: int, n_maps: int) -> np.ndarray:
    """Raw-frame -> gaze-map index for attention weighting.

    Gaze maps come one per SUBSAMPLED model frame: map k was produced for
    raw frame 15 + 5k (the `[15::5]` protocol, reference
    `crc_input_data_seq.py:186` / `extract_map.py` outputs), so raw frame
    i takes map round((i-15)/5) clipped into range. A uniform linspace
    stretch would systematically hand early frames a map ~15 frames ahead.
    (The reference's own `add_attention` is broken via np.resize,
    `extract_C3D_features.py:739-761`; this is the corrected alignment.)
    """
    return np.clip(np.round((np.arange(n_frames) - 15) / 5.0).astype(int),
                   0, n_maps - 1)


def extract_video(c3d_params, video_path: str, out_file: str, *,
                  feature_layer: str = "conv5b", batch_windows: int = 16,
                  compute_dtype: str = "bfloat16", bgr: bool = False,
                  frames_dir: Optional[str] = None,
                  attention_maps: Optional[np.ndarray] = None,
                  max_inflight_chunks: int = 4,
                  _jit_cache: Optional[dict] = None) -> int:
    """Decode one video, extract per-window features, write `.c3d`.

    Returns the number of 16-frame windows written.
    """
    import jax.numpy as jnp

    from ..models import c3d as c3d_model

    # frames stay uint8 until the per-chunk device feed — a long video as
    # fp32 would be 4x the decoded footprint before a single window runs
    frames = [np.asarray(f, np.uint8) for f in video.decode_video(video_path)]
    if not frames:
        raise IOError(f"no frames decoded from {video_path}")
    arr = np.stack(frames)
    del frames
    if frames_dir is not None:  # dump from memory; don't decode twice
        from PIL import Image

        video_id = os.path.splitext(os.path.basename(video_path))[0]
        dump_dir = os.path.join(frames_dir, video_id)
        mkdir_p(dump_dir)
        for i in range(len(arr)):
            Image.fromarray(video.resize_to_width(arr[i])).save(
                os.path.join(dump_dir, f"{i:06d}.jpg"))

    att_idx = None
    if attention_maps is not None:
        # gaze maps come one per SUBSAMPLED model frame ([15::5], e.g.
        # extract_map output): map k was predicted for raw frame 15+5k, so
        # raw frame i takes map round((i-15)/5) clipped into range —
        # NOT a uniform linspace stretch, which would hand early frames a
        # map ~15 frames ahead. Max-normalize so softmax probability maps
        # (cells ~1/2401) weight RELATIVELY instead of blacking the frame
        # out.
        attention_maps = np.asarray(attention_maps, np.float32)
        peaks = attention_maps.max(axis=(-2, -1), keepdims=True)
        attention_maps = attention_maps / np.maximum(peaks, 1e-12)
        att_idx = attention_frame_index(len(arr), len(attention_maps))

    # every start in range(0, num_frames, 16) emits a window like the
    # reference (`extract_C3D_features.py:866`); the tail is zero-padded
    # where the reference's VIDEO_DATA layer reads past the end
    starts = c3d_model.clip_windows(len(arr))

    # windows ship as uint8 — 4x fewer wire bytes than fp32 on the
    # host->device transfer; preprocess_frames casts to float ON DEVICE
    def window_at(s: int) -> np.ndarray:
        w = arr[s:s + 16]
        if attention_maps is not None:
            w = video.apply_attention(w, attention_maps[att_idx[s:s + 16]])
        if len(w) < 16:
            w = np.concatenate(
                [w, np.zeros((16 - len(w),) + w.shape[1:], w.dtype)])
        return w

    cache = _jit_cache if _jit_cache is not None else {}
    key = (arr.shape[1:3], feature_layer, compute_dtype, bgr)
    fn = cache.get(key)
    if fn is None:
        cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        fn = jax.jit(lambda p, w: c3d_model.apply(
            p, c3d_model.preprocess_frames(w, bgr=bgr),
            feature_layer=feature_layer, compute_dtype=cdt))
        cache[key] = fn

    # bounded async pipeline: keep a few chunks in flight so the next
    # chunk's host->device transfer overlaps the current chunk's compute,
    # without pinning every chunk's device output for a long video
    pending = []
    blobs = []

    def collect(valid, out):
        feats = np.asarray(out)[:valid]
        blobs.extend(_blob_layout(f, feature_layer) for f in feats)

    for cstart in range(0, len(starts), batch_windows):
        chunk_starts = starts[cstart:cstart + batch_windows]
        chunk = np.stack([window_at(s) for s in chunk_starts])
        valid = len(chunk)
        if valid < batch_windows:  # pad to the jitted batch shape
            pad = np.zeros((batch_windows - valid,) + chunk.shape[1:],
                           chunk.dtype)
            chunk = np.concatenate([chunk, pad])
        pending.append((valid, fn(c3d_params, jnp.asarray(chunk))))
        if len(pending) > max_inflight_chunks:
            collect(*pending.pop(0))
    for item in pending:
        collect(*item)

    codec.write_c3d_file(out_file, blobs)
    return len(blobs)


def main(argv: Optional[list[str]] = None) -> int:
    from ..utils import enable_compile_cache, honor_jax_platforms_env

    honor_jax_platforms_env()
    enable_compile_cache()
    args = build_parser().parse_args(argv)

    videos = list(args.videos or [])
    if args.videos_root:
        videos.extend(
            os.path.join(args.videos_root, f)
            for f in sorted(os.listdir(args.videos_root))
            if f.lower().endswith((".avi", ".mp4", ".mkv", ".mov")))
    if not videos:
        log.error("no videos: pass --videos and/or --videos_root")
        return 1
    if args.reverse:
        videos = videos[::-1]
    mkdir_p(args.out_dir)

    c3d_params = _load_params(args)
    # Caffe/OpenCV-trained weights saw BGR frames (models/c3d.py
    # preprocess_frames doc); decoded frames are RGB, so reorder by
    # default exactly when real caffemodel weights are in play
    bgr = args.bgr if args.bgr is not None else args.caffemodel is not None
    jit_cache: dict = {}
    n_done = n_skipped = n_failed = 0
    for path in videos:
        video_id = os.path.splitext(os.path.basename(path))[0]
        out_file = os.path.join(args.out_dir, video_id + ".c3d")
        if not args.overwrite and os.path.exists(out_file):
            n_skipped += 1
            continue
        attention = None
        if args.attention_maps_root:
            map_file = os.path.join(args.attention_maps_root,
                                    video_id + ".gazemap.npy")
            if not os.path.exists(map_file):
                log.warn("no gaze map for %s (%s): skipping", video_id,
                         map_file)
                n_skipped += 1
                continue
            attention = np.load(map_file).astype(np.float32)
        try:
            n_windows = extract_video(
                c3d_params, path, out_file,
                feature_layer=args.feature_layer,
                batch_windows=args.batch_windows,
                compute_dtype=args.compute_dtype, bgr=bgr,
                frames_dir=args.frames_dir, attention_maps=attention,
                _jit_cache=jit_cache)
        except Exception as e:
            log.error("failed on %s: %s", path, e)
            n_failed += 1
            continue
        log.info("wrote %s (%d windows)", out_file, n_windows)
        n_done += 1
    log.infov("done: %d extracted, %d skipped, %d failed", n_done,
              n_skipped, n_failed)
    return 0 if n_failed == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
