"""Export a trained run as a standalone serving bundle.

The reference has no deployment story: inference re-runs the training
codebase against a Saver checkpoint (`/root/reference/models/extract_map.py:43-91`).
This CLI turns a train_dir into a `serving/` bundle of ahead-of-time
exported StableHLO programs (jax.export) + weights — loadable with
`serving.load_bundle` on any host with jax, no model source needed.

    python -m recurrent_gaze_prediction_tpu.cli.export_serving \
        --train_dir runs/grcn --out_dir runs/grcn/serving \
        --stream_chunk_len 42 \
        [--caffemodel sports1m.caffemodel --fused_num_frames 160]
"""

from __future__ import annotations

import argparse
from typing import Optional

import jax
import numpy as np

from ..registry import create_model
from ..serving import save_bundle
from ..train import Checkpointer, create_train_state
from ..utils import log, mkdir_p


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--train_dir", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--n_lstm_steps", default=None, type=int,
                        help="T of the exported predict program "
                             "(default: the run's training T)")
    parser.add_argument("--platforms", default="cpu,tpu",
                        help="comma-separated jax.export target platforms")
    parser.add_argument("--caffemodel", default=None,
                        help="Sports-1M .caffemodel; enables the fused "
                             "raw-video program")
    parser.add_argument("--fused_num_frames", default=160, type=int,
                        help="raw-frame clip length of the fused program")
    parser.add_argument("--stream_chunk_len", default=None, type=int,
                        help="export a carried-state streaming chunk step "
                             "(gaze_grcn family only)")
    parser.add_argument("--int8", action="store_true",
                        help="additionally export the fused program with "
                             "an int8-quantized C3D tower (+8%% on v5e; "
                             "requires --caffemodel)")
    parser.add_argument("--calib_videos", default=None,
                        help="directory of videos to calibrate int8 "
                             "activation scales on (recommended; falls "
                             "back to synthetic noise with a warning)")
    parser.add_argument("--calib_windows", default=8, type=int,
                        help="max 16-frame windows used for calibration")
    parser.add_argument("--static_batch", action="store_true",
                        help="export with batch fixed at 1 instead of "
                             "symbolic")
    parser.add_argument("--wire_dtype", default="float32",
                        choices=("float32", "bfloat16"),
                        help="input dtype of the predict/stream programs' "
                             "frame+feature tensors; bfloat16 halves the "
                             "per-request host->device transfer (the "
                             "server casts incoming f32/f16 npz payloads)")
    parser.add_argument("--video_dtype", default="float32",
                        choices=("float32", "uint8"),
                        help="input dtype of the fused programs' raw "
                             "pixels; uint8 is exact for decoded video "
                             "and quarters the request transfer")
    return parser


def _load_calibration_clips(calib_videos: Optional[str], max_windows: int):
    """Decode up to `max_windows` 16-frame windows from a directory of
    videos and preprocess them as C3D network inputs (resize 128x171,
    center-crop 112, mean-subtract). Returns None (-> synthetic fallback
    in `quantize_for_pipeline`, with a warning) when no directory given
    or no frames decode."""
    if not calib_videos:
        return None
    import glob
    import os

    import jax.numpy as jnp

    from ..data import video as video_mod
    from ..models import c3d as c3d_model

    windows = []
    paths = sorted(p for p in glob.glob(os.path.join(calib_videos, "*"))
                   if os.path.isfile(p))
    for path in paths:
        try:
            frames = [np.asarray(f, np.float32)
                      for f in video_mod.decode_video(path)]
        except Exception as e:
            log.warn("calibration: cannot decode %s: %s", path, e)
            continue
        for start in range(0, len(frames) - 15, 16):
            win = np.stack(frames[start:start + 16])
            # normalize to the network's 128x171 ingest size host-side so
            # windows from differently-sized videos stack together
            if win.shape[1:3] != (128, 171):
                win = np.asarray(jax.image.resize(
                    jnp.asarray(win), (16, 128, 171, 3), method="bilinear"))
            windows.append(win)
            if len(windows) >= max_windows:
                break
        if len(windows) >= max_windows:
            break
    if not windows:
        log.warn("calibration: no decodable 16-frame windows under %s",
                 calib_videos)
        return None
    log.infov("int8 calibration on %d real windows from %s",
              len(windows), calib_videos)
    return c3d_model.preprocess_frames(jnp.asarray(np.stack(windows)))


def main(argv: Optional[list[str]] = None) -> int:
    from ..utils import enable_compile_cache, honor_jax_platforms_env

    honor_jax_platforms_env()
    enable_compile_cache()
    args = build_parser().parse_args(argv)

    exp = Checkpointer.load_config(args.train_dir)
    t = args.n_lstm_steps or exp.model.n_lstm_steps
    model = create_model(exp.model.name, exp.model, n_lstm_steps=t)
    state, _ = create_train_state(model, exp.optimizer, jax.random.PRNGKey(0))
    ckpt = Checkpointer(args.train_dir)
    restored = ckpt.restore_latest(jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), state))
    if restored is None:
        log.error("no checkpoint found under %s", args.train_dir)
        return 1

    c3d_params = None
    num_frames = None
    if args.caffemodel:
        from ..compat.caffemodel import c3d_params_from_caffemodel
        from ..models.c3d import fold_bgr_into_params

        # fused serving feeds decoded RGB; fold the Caffe BGR ordering
        # into conv1a once (models/c3d.fold_bgr_into_params) — also
        # BEFORE int8 calibration below, so quantization ranges are
        # measured on the weights the bundle will actually carry
        c3d_params = fold_bgr_into_params(
            c3d_params_from_caffemodel(args.caffemodel))
        num_frames = args.fused_num_frames

    int8_qparams = None
    if args.int8:
        if c3d_params is None:
            log.error("--int8 quantizes the C3D tower; pass --caffemodel")
            return 1
        from ..models.quant import quantize_for_pipeline

        calib = _load_calibration_clips(args.calib_videos,
                                        args.calib_windows)
        int8_qparams = quantize_for_pipeline(c3d_params, calib_clips=calib)

    mkdir_p(args.out_dir)
    save_bundle(args.out_dir, model, restored.params,
                c3d_params=c3d_params, num_frames=num_frames,
                stream_chunk_len=args.stream_chunk_len,
                int8_qparams=int8_qparams,
                platforms=tuple(p.strip()
                                for p in args.platforms.split(",") if p),
                symbolic_batch=not args.static_batch,
                wire_dtype=args.wire_dtype, video_dtype=args.video_dtype)
    log.infov("serving bundle written to %s (T=%d, platforms=%s)",
              args.out_dir, t, args.platforms)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
