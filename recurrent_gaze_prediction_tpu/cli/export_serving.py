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
    parser.add_argument("--static_batch", action="store_true",
                        help="export with batch fixed at 1 instead of "
                             "symbolic")
    return parser


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

        c3d_params = c3d_params_from_caffemodel(args.caffemodel)
        num_frames = args.fused_num_frames

    mkdir_p(args.out_dir)
    save_bundle(args.out_dir, model, restored.params,
                c3d_params=c3d_params, num_frames=num_frames,
                stream_chunk_len=args.stream_chunk_len,
                platforms=tuple(p.strip()
                                for p in args.platforms.split(",") if p),
                symbolic_batch=not args.static_batch)
    log.infov("serving bundle written to %s (T=%d, platforms=%s)",
              args.out_dir, t, args.platforms)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
