"""Bulk gaze-map export (production inference).

CLI rebuild of `/root/reference/models/extract_map.py`: iterate clip
folders (LSMDC-style `.c3d` + frame JPEGs), zero-pad / clip each clip to a
fixed n_lstm_steps (default 105, `extract_map.py:65`), run batched
inference, and save per-clip `{clip}.gazemap.npy` (49x49 float16) plus the
7x7 average-pooled variant (`extract_map.py:228-238`), skipping clips whose
outputs already exist (idempotent resume, `extract_map.py:159-162`).
`--reverse` sweeps the clip list from the end for two-worker sharding
(`extract_map.py:118-119`).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Optional

import jax
import numpy as np

from ..data import codec
from ..registry import create_model
from ..train import Checkpointer, create_train_state, make_predict_fn
from ..utils import log, mkdir_p


def avg_pool_7x7(maps: np.ndarray) -> np.ndarray:
    """[T, 49, 49] -> [T, 7, 7] mean pooling (`extract_map.py:35-41`)."""
    t = maps.shape[0]
    return maps.reshape(t, 7, 7, 7, 7).mean(axis=(2, 4))


def pad_or_clip(stream: np.ndarray, t: int) -> np.ndarray:
    """Zero-pad short streams / truncate long ones to T
    (`extract_map.py:170-199`)."""
    if len(stream) >= t:
        return stream[:t]
    pad = np.zeros((t - len(stream),) + stream.shape[1:], stream.dtype)
    return np.concatenate([stream, pad], axis=0)


def load_clip_inputs(clip_dir: str, c3d_file: str, t: int,
                     image_hw=(98, 98)) -> Optional[dict]:
    from PIL import Image

    c3d = codec.load_c3d_for_model(c3d_file)

    frame_files = sorted(
        os.path.join(clip_dir, f) for f in os.listdir(clip_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png")))
    frames = []
    for path in frame_files[15::5]:
        img = Image.open(path).convert("RGB").resize(
            (image_hw[1], image_hw[0]), Image.LANCZOS)
        frames.append(np.asarray(img))
    if not frames:
        frames = [np.zeros((*image_hw, 3), np.uint8)]
    frames = np.stack(frames).astype(np.float32) / 255.0

    n_valid = min(len(frames), len(c3d), t)
    return {
        "frames": pad_or_clip(frames, t),
        "c3d": pad_or_clip(c3d, t),
        "n_valid": n_valid,
    }


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--train_dir", required=True)
    parser.add_argument("--clips_root", required=True,
                        help="directory of clip folders with frame JPEGs")
    parser.add_argument("--c3d_root", default=None,
                        help="directory of {clip}.c3d files (defaults to "
                             "clips_root)")
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--n_lstm_steps", default=105, type=int)
    parser.add_argument("--batch_size", default=4, type=int)
    parser.add_argument("--reverse", action="store_true")
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--data_parallel", default=1, type=int,
                        help="shard inference batches over this many "
                             "devices (mesh data axis); replaces the "
                             "reference's two-worker --reverse trick at "
                             "pod scale")
    parser.add_argument("--streaming", action="store_true",
                        help="carried-state chunked inference: export the "
                             "FULL clip length with temporal context across "
                             "chunks, instead of the reference's zero-pad/"
                             "truncate-to-T protocol (gaze_grcn/gaze_lstm)")
    parser.add_argument("--chunk_len", default=42, type=int,
                        help="chunk length for --streaming")
    return parser


def export_streaming(args, exp, model, params, clips, c3d_root) -> int:
    """Carried-state chunked export: no truncation at n_lstm_steps, no
    zero-state restarts at chunk boundaries (models/streaming.py)."""
    from ..models import streaming

    if exp.model.name not in ("gaze_grcn", "gaze_lstm"):
        log.error("--streaming supports gaze_grcn / gaze_lstm (49x49 "
                  "conv decoders); run config has %s", exp.model.name)
        return 1

    lstm_step = (streaming.make_lstm_stream_fn(model.cfg)
                 if exp.model.name == "gaze_lstm" else None)
    n_done = n_skipped = n_missing = 0
    for clip in clips:
        out_file = os.path.join(args.out_dir, f"{clip}.gazemap.npy")
        if not args.overwrite and os.path.exists(out_file):
            n_skipped += 1
            continue
        c3d_file = os.path.join(c3d_root, clip + ".c3d")
        if not os.path.exists(c3d_file):
            log.warn("missing c3d for %s, skipping", clip)
            n_missing += 1
            continue
        feats = codec.load_c3d_for_model(c3d_file)
        if exp.model.name == "gaze_lstm":
            state = streaming.init_lstm_stream_state(1, model.cfg)
            chunks = []
            for start in range(0, len(feats), args.chunk_len):
                chunk = pad_or_clip(feats[start:start + args.chunk_len],
                                    args.chunk_len)
                valid = min(args.chunk_len, len(feats) - start)
                state, maps = lstm_step(
                    params, state, jax.numpy.asarray(chunk)[None])
                chunks.append(np.asarray(maps[0, :valid]))
            maps = np.concatenate(chunks)
        else:
            maps = np.concatenate(list(streaming.stream_video(
                params, feats, model.cfg, chunk_len=args.chunk_len)))
        maps = maps.astype(np.float16)
        np.save(out_file, maps)
        np.save(os.path.join(args.out_dir, f"{clip}.gazemap7x7.npy"),
                avg_pool_7x7(maps.astype(np.float32)).astype(np.float16))
        log.info("saved %s (%d frames, streamed)", clip, len(maps))
        n_done += 1
    log.infov("done: %d exported (streaming), %d skipped, %d missing c3d",
              n_done, n_skipped, n_missing)
    if n_missing:
        log.error("%d clips had no .c3d file and were NOT exported",
                  n_missing)
    return 0


def main(argv: Optional[list[str]] = None) -> int:
    from ..utils import enable_compile_cache, honor_jax_platforms_env

    honor_jax_platforms_env()
    enable_compile_cache()
    args = build_parser().parse_args(argv)
    c3d_root = args.c3d_root or args.clips_root
    mkdir_p(args.out_dir)

    exp = Checkpointer.load_config(args.train_dir)
    model = create_model(exp.model.name, exp.model,
                         n_lstm_steps=args.n_lstm_steps,
                         batch_size=args.batch_size)
    state, _ = create_train_state(model, exp.optimizer, jax.random.PRNGKey(0))
    ckpt = Checkpointer(args.train_dir)
    restored = ckpt.restore_latest(jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), state))
    if restored is None:
        log.error("no checkpoint found under %s", args.train_dir)
        return 1
    state = restored
    if args.data_parallel > 1:
        import jax as _jax

        from ..parallel import make_mesh, make_sharded_predict

        mesh = make_mesh(data_parallel=args.data_parallel, model_parallel=1,
                         devices=_jax.devices()[:args.data_parallel])
        predict = make_sharded_predict(model, mesh)
        if args.batch_size % args.data_parallel:
            log.warn("batch_size %d not divisible by data_parallel %d",
                     args.batch_size, args.data_parallel)
    else:
        predict = make_predict_fn(model)

    clips = sorted(
        c for c in os.listdir(args.clips_root)
        if os.path.isdir(os.path.join(args.clips_root, c)))
    if args.reverse:
        clips = clips[::-1]

    if args.streaming:
        return export_streaming(args, exp, model, state.params, clips,
                                c3d_root)

    pending, names = [], []

    def flush():
        if not pending:
            return
        while len(pending) < args.batch_size:  # pad the last batch
            pending.append(pending[-1])
        frames = np.stack([p["frames"] for p in pending[:args.batch_size]])
        c3d = np.stack([p["c3d"] for p in pending[:args.batch_size]])
        if model.cfg.compute_dtype == "bfloat16":
            # halve host->device wire bytes; the model casts in-graph anyway
            frames = frames.astype(jax.numpy.bfloat16)
            c3d = c3d.astype(jax.numpy.bfloat16)
        maps = np.asarray(predict(state.params, frames, c3d))
        for name, inputs, clip_maps in zip(names, pending, maps):
            valid = clip_maps[:inputs["n_valid"]].astype(np.float16)
            np.save(os.path.join(args.out_dir, f"{name}.gazemap.npy"), valid)
            if valid.shape[1:] == (49, 49):
                np.save(
                    os.path.join(args.out_dir, f"{name}.gazemap7x7.npy"),
                    avg_pool_7x7(valid.astype(np.float32)).astype(np.float16))
            log.info("saved %s (%d frames)", name, inputs["n_valid"])
        pending.clear()
        names.clear()

    n_done = n_skipped = n_missing = 0
    for clip in clips:
        out_file = os.path.join(args.out_dir, f"{clip}.gazemap.npy")
        if not args.overwrite and os.path.exists(out_file):
            n_skipped += 1
            continue
        c3d_file = os.path.join(c3d_root, clip + ".c3d")
        if not os.path.exists(c3d_file):
            log.warn("missing c3d for %s, skipping", clip)
            n_missing += 1
            continue
        inputs = load_clip_inputs(os.path.join(args.clips_root, clip),
                                  c3d_file, args.n_lstm_steps)
        pending.append(inputs)
        names.append(clip)
        n_done += 1
        if len(pending) == args.batch_size:
            flush()
    flush()
    log.infov("done: %d exported, %d skipped (already present), "
              "%d missing c3d", n_done, n_skipped, n_missing)
    if n_missing:
        log.error("%d clips had no .c3d file and were NOT exported",
                  n_missing)
    return 0


if __name__ == "__main__":
    sys.exit(main())
