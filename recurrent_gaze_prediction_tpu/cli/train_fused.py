"""Train a gaze model end-to-end FROM RAW VIDEO (fused C3D-in-graph path).

Beyond-reference surface: the reference's training chain needs an offline
Caffe feature-extraction stage first (`extract_C3D_features_script.py:12-21`
producing `.c3d` pickles that `models/train_gaze.py` later consumes); here
one command trains straight from `.avi` files + processed gaze `.mat`
records — the C3D tower runs inside the jitted train step
(`models/pipeline.make_fused_train_step`), frozen by default or jointly
fine-tuned with `--finetune_c3d`.

    # hermetic quick-start
    python -m recurrent_gaze_prediction_tpu.cli.train_fused \
        --dataset synthetic --max_steps 50 --train_dir /tmp/fused

    # real corpus (after cli/process_gazemap)
    python -m recurrent_gaze_prediction_tpu.cli.train_fused \
        --videos_root data/videos --gaze_root data/root/gazemap \
        --c3d_weights sports1m.caffemodel --finetune_c3d --c3d_lr 1e-5
"""

from __future__ import annotations

import argparse
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..models import c3d as c3d_model
from ..registry import available_models, create_model
from ..train import fused
from ..train.state import build_optimizer
from ..train.writer import MetricWriter
from ..utils import log


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", default="gaze_grcn",
                        choices=available_models())
    parser.add_argument("--dataset", default="videos",
                        choices=["videos", "synthetic"])
    parser.add_argument("--videos_root", default=None,
                        help="directory of .avi/.mp4 clips")
    parser.add_argument("--gaze_root", default=None,
                        help="directory of processed gaze .mat files "
                             "(cli/process_gazemap output)")
    parser.add_argument("--num_frames", default=80, type=int,
                        help="static clip length; shorter videos are "
                             "zero-padded, longer truncated")
    parser.add_argument("--frame_hw", default=None, type=int,
                        nargs=2, help="host-side resize target (default "
                        "128x171 for --dataset videos, the C3D VIDEO_DATA "
                        "size — skips the in-graph resize; 64x80 for "
                        "--dataset synthetic)")
    parser.add_argument("--max_clips", default=None, type=int)
    parser.add_argument("--synthetic_clips", default=8, type=int)
    parser.add_argument("--valid_clips", default=0, type=int,
                        help="hold out the last N clips for validation")
    parser.add_argument("--batch_size", default=None, type=int)
    parser.add_argument("--learning_rate", default=None, type=float)
    parser.add_argument("--max_steps", default=None, type=int)
    parser.add_argument("--loss_type", default=None,
                        choices=[None, "l2", "xentropy", "kld"])
    parser.add_argument("--train_dir", default=None)
    parser.add_argument("--train_tag", "--tag", default="")
    parser.add_argument("--c3d_weights", default=None,
                        help=".caffemodel / .npz Sports-1M weights for the "
                             "in-graph C3D tower (random init otherwise)")
    parser.add_argument("--finetune_c3d", action="store_true",
                        help="jointly fine-tune the C3D tower (gradients "
                             "flow through the fused graph; tower "
                             "rematerialized)")
    parser.add_argument("--c3d_lr", default=None, type=float,
                        help="separate LR for the C3D tower under "
                             "--finetune_c3d (default: the gaze LR)")
    parser.add_argument("--shallownet_pretrain", default=None,
                        help="params checkpoint to graft into ShallowNet")
    parser.add_argument("--freeze_shallownet", action="store_true",
                        help="freeze the ShallowNet subtree (the "
                             "reference's regime when pretrained; default "
                             "OFF here — raw-pixel training wants the "
                             "image tower to learn)")
    parser.add_argument("--data_parallel", default=0, type=int,
                        help="shard the video batch over an N-wide \"data\" "
                             "mesh axis (multi-chip; batch_size must "
                             "divide)")
    parser.add_argument("--model_parallel", default=1, type=int,
                        help="width of the \"model\" mesh axis (shards the "
                             "wide FC/projection kernels)")
    parser.add_argument("--accum_steps", default=None, type=int,
                        help="gradient-accumulation microbatches per "
                             "optimizer update (batch_size must divide; "
                             "trades step latency for activation memory)")
    parser.add_argument("--compute_dtype", default=None)
    parser.add_argument("--seed", default=0, type=int)
    return parser


def load_c3d_params(path: Optional[str], key: jax.Array) -> dict:
    if path is None:
        log.warn("no --c3d_weights: the in-graph C3D tower starts from "
                 "random init (fine for smoke runs; pass the Sports-1M "
                 "checkpoint for real training)")
        return c3d_model.init_params(key)
    if path.endswith(".npz"):
        # flat-key convention shared with cli/extract_features._load_params;
        # assumed already in this framework's RGB-input convention
        blob = np.load(path)
        return {key.replace("/", "_"): np.asarray(blob[key])
                for key in blob.files}
    from ..compat.caffemodel import c3d_params_from_caffemodel

    # Caffe-trained weights saw BGR frames; the fused pipeline feeds
    # decoded RGB with no per-frame swap, so fold the channel reorder
    # into conv1a once (models/c3d.fold_bgr_into_params)
    return c3d_model.fold_bgr_into_params(c3d_params_from_caffemodel(path))


def main(argv: Optional[list[str]] = None) -> int:
    from ..utils import enable_compile_cache, honor_jax_platforms_env

    honor_jax_platforms_env()
    enable_compile_cache()
    args = build_parser().parse_args(argv)

    if args.dataset == "videos" and not (args.videos_root and
                                         args.gaze_root):
        log.error("--videos_root and --gaze_root are required for "
                  "--dataset videos")
        return 1

    exp = ExperimentConfig()
    exp.dataset = args.dataset
    exp.seed = args.seed
    exp.train_dir = args.train_dir
    exp.train_tag = args.train_tag
    exp.model.name = args.model
    overrides = {}
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    if args.loss_type is not None:
        overrides["loss_type"] = args.loss_type
    if args.compute_dtype is not None:
        overrides["compute_dtype"] = args.compute_dtype
    if args.learning_rate is not None:
        exp.optimizer.initial_learning_rate = args.learning_rate
    if args.max_steps is not None:
        exp.schedule.max_steps = args.max_steps
    if args.accum_steps is not None:
        exp.optimizer.accum_steps = args.accum_steps

    # unroll length follows the clip length through the fused protocol
    t = fused.pipeline.pipeline_timesteps(args.num_frames)
    if t <= 0:
        # pipeline_timesteps(F) = min(F // 16, ceil((F - 15) / 5)) is
        # positive for any F >= 16 (one C3D window, one gaze frame)
        log.error("--num_frames %d yields no timesteps (need >= 16)",
                  args.num_frames)
        return 1
    overrides["n_lstm_steps"] = t
    model = create_model(args.model, **overrides)
    exp.model = model.cfg

    if args.dataset == "synthetic":
        corpus = fused.make_synthetic_fused_corpus(
            args.synthetic_clips, num_frames=args.num_frames,
            frame_hw=(tuple(args.frame_hw) if args.frame_hw is not None
                      else (64, 80)),
            gazemap_hw=(model.cfg.gazemap_height,
                        model.cfg.gazemap_width),
            seed=args.seed)
    else:
        corpus = fused.load_fused_corpus(
            args.videos_root, args.gaze_root,
            num_frames=args.num_frames,
            frame_hw=(tuple(args.frame_hw) if args.frame_hw is not None
                      else (128, 171)),
            gazemap_hw=(model.cfg.gazemap_height,
                        model.cfg.gazemap_width),
            max_clips=args.max_clips)
    corpus.shuffle(seed=args.seed or 3027300)
    train_data, valid_data = corpus.split(args.valid_clips)
    log.info("fused corpus: %d train / %s valid clips, F=%d -> T=%d",
             len(train_data),
             len(valid_data) if valid_data is not None else 0,
             args.num_frames, t)
    if model.cfg.batch_size > len(train_data):
        log.warn("batch_size %d > %d clips; clamping",
                 model.cfg.batch_size, len(train_data))
        model.cfg.batch_size = len(train_data)

    compute_dtype = jnp.bfloat16
    if model.cfg.compute_dtype == "float32":
        compute_dtype = jnp.float32

    key = jax.random.PRNGKey(exp.seed)
    k_c3d, k_gaze = jax.random.split(key)
    c3d_params = load_c3d_params(args.c3d_weights, k_c3d)
    gaze_params = model.init(k_gaze)
    if args.shallownet_pretrain:
        from ..train import restore_shallownet

        gaze_params = restore_shallownet(gaze_params,
                                         args.shallownet_pretrain)

    tx = build_optimizer(exp.optimizer, gaze_params,
                         freeze_shallownet=args.freeze_shallownet)
    c3d_tx = None
    if args.c3d_lr is not None and not args.finetune_c3d:
        log.warn("--c3d_lr %g has no effect without --finetune_c3d "
                 "(the C3D tower stays frozen)", args.c3d_lr)
    if args.finetune_c3d and args.c3d_lr is not None:
        import optax

        c3d_tx = optax.adam(args.c3d_lr)
    opt_state = fused.pipeline.init_fused_opt_state(
        tx, gaze_params, c3d_params, c3d_tx=c3d_tx,
        finetune_c3d=args.finetune_c3d)
    state = fused.FusedTrainState(gaze_params, opt_state, c3d_params,
                                  jnp.zeros((), jnp.int32))

    mesh = None
    if args.data_parallel > 1 or args.model_parallel > 1:
        from ..parallel import make_mesh

        mesh = make_mesh(data_parallel=args.data_parallel or -1,
                         model_parallel=args.model_parallel)
        log.info("mesh: %s over %d devices", dict(mesh.shape),
                 mesh.size)

    writer = MetricWriter(args.train_dir) if args.train_dir else None
    state = fused.fit_fused(
        model, state, tx, train_data, exp, valid_data=valid_data,
        finetune_c3d=args.finetune_c3d, c3d_tx=c3d_tx,
        compute_dtype=compute_dtype, train_dir=args.train_dir,
        mesh=mesh, metric_writer=writer)
    if writer is not None:
        writer.close()
    log.info("fused training done at step %d", int(state.step))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
