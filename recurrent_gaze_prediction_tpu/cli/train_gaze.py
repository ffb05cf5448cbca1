"""Train a gaze-prediction model.

CLI rebuild of `/root/reference/models/train_gaze.py`: model registry
selection, config overrides (CLI wins), dataset loading, optional
pretrained-ShallowNet initialization, fit, and a final evaluation on the
test split.

    python -m recurrent_gaze_prediction_tpu.cli.train_gaze \
        --model gaze_grcn --dataset synthetic --max_steps 200
"""

from __future__ import annotations

import argparse
import sys
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import ExperimentConfig
from ..data import crc as crc_data
from ..data import synthetic
from ..eval import evaluator
from ..registry import available_models, create_model
from ..train import (
    create_train_state,
    fit,
    make_predict_fn,
    restore_shallownet,
)
from ..train.state import TrainState
from ..train.writer import MetricWriter
from ..utils import log


def load_datasets(exp: ExperimentConfig, args) -> "DataSplits":
    gh, gw = exp.model.gazemap_height, exp.model.gazemap_width
    if exp.dataset == "synthetic":
        return synthetic.make_splits(
            n_train=args.synthetic_clips, n_valid=max(args.synthetic_clips // 2, 2),
            n_test=max(args.synthetic_clips // 2, 2),
            t=exp.model.n_lstm_steps, gazemap_hw=(gh, gw), seed=exp.seed)
    layouts = crc_data.layouts_for(exp.dataset, args.data_root)
    # window length follows the model's unroll length (the reference keeps
    # both at 42: SEQ_LEN `crc_input_data_seq.py:486`, n_lstm_steps
    # `models/gaze_rnn.py:50`)
    return crc_data.read_crc_data_sets(
        exp.model.image_height, exp.model.image_width, gh, gw,
        dataset=exp.dataset, layouts=layouts,
        seq_len=exp.model.n_lstm_steps, cache_dir=args.cache_dir,
        max_folders=args.max_folders)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", default="gaze_grcn",
                        choices=available_models())
    parser.add_argument("--dataset", default="synthetic",
                        choices=["crc", "hollywood2", "crcxh2", "synthetic"])
    parser.add_argument("--data_root", default=None)
    parser.add_argument("--cache_dir", default=None)
    parser.add_argument("--max_folders", default=None, type=int)
    parser.add_argument("--synthetic_clips", default=16, type=int)
    parser.add_argument("--batch_size", default=None, type=int)
    parser.add_argument("--learning_rate", default=None, type=float)
    parser.add_argument("--learning_rate_decay", default=None, type=float)
    parser.add_argument("--accum_steps", default=None, type=int,
                        help="gradient-accumulation microbatches per "
                             "optimizer update (memory lever; batch "
                             "size must divide evenly)")
    parser.add_argument("--max_steps", default=None, type=int)
    parser.add_argument("--loss_type", default=None,
                        choices=[None, "l2", "xentropy", "kld"])
    parser.add_argument("--n_lstm_steps", default=None, type=int)
    parser.add_argument("--train_dir", default=None)
    parser.add_argument("--train_tag", "--tag", default="")
    parser.add_argument("--shallownet_pretrain", default=None,
                        help="params checkpoint to graft into ShallowNet")
    parser.add_argument("--compute_dtype", default=None)
    parser.add_argument("--pallas", dest="use_pallas",
                        action="store_true", default=False,
                        help="opt into the fused Pallas recurrence "
                             "kernels (bit-exact on TPU; the XLA scan "
                             "measured faster at flagship shapes since "
                             "round 5, so the default is the scan)")
    parser.add_argument("--no_pallas", dest="use_pallas",
                        action="store_false",
                        help="explicitly disable the Pallas kernels "
                             "(the default; kept for compatibility)")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--no_prefetch", dest="prefetch",
                        action="store_false", default=True,
                        help="disable the background prefetch thread "
                        "(host-side compute-dtype cast + transfer/compute "
                        "overlap); batches are then device_put inline")
    parser.add_argument("--profile_steps", default=0, type=int,
                        help="capture a device trace of N train steps into "
                             "{train_dir}/profile (TensorBoard-viewable)")
    parser.add_argument("--data_parallel", default=1, type=int,
                        help="shard the batch over this many devices "
                             "(data axis of the mesh); the whole fit loop "
                             "— train step, cadences, checkpoint restore — "
                             "runs sharded. -1 = all devices")
    parser.add_argument("--model_parallel", default=1, type=int,
                        help="shard the wide FC / projection weights over "
                             "this many devices (model axis)")
    return parser


def main(argv: Optional[list[str]] = None) -> int:
    from ..utils import enable_compile_cache, honor_jax_platforms_env

    honor_jax_platforms_env()
    enable_compile_cache()
    args = build_parser().parse_args(argv)

    if args.dataset != "synthetic" and not args.data_root:
        log.error("--data_root is required for dataset %s", args.dataset)
        return 1

    exp = ExperimentConfig()
    exp.dataset = args.dataset
    exp.seed = args.seed
    exp.train_dir = args.train_dir
    exp.train_tag = args.train_tag
    exp.model.name = args.model

    if args.dataset != "synthetic":
        # the reference TRAINING ENTRY overrides the model-class defaults
        # (batch 7, lr 0.003) for real-data runs: batch 28 ("CRC likes 28"),
        # lr 1e-4, cadences 100/20/100 (`models/train_gaze.py:74-97`).
        # CLI flags below still win. Synthetic quick-starts keep the small
        # model-class defaults.
        exp.model.batch_size = 28
        exp.optimizer.initial_learning_rate = 1e-4
        exp.schedule.steps_per_evaluation = 100
        exp.schedule.steps_per_validation = 20
        exp.schedule.steps_per_checkpoint = 100

    exp.apply_overrides({
        "model.batch_size": args.batch_size,
        "model.loss_type": args.loss_type,
        "model.n_lstm_steps": args.n_lstm_steps,
        "model.compute_dtype": args.compute_dtype,
        "model.use_pallas": args.use_pallas,
        "optimizer.initial_learning_rate": args.learning_rate,
        "optimizer.learning_rate_decay": args.learning_rate_decay,
        "optimizer.accum_steps": args.accum_steps,
        "schedule.max_steps": args.max_steps,
    })

    model = create_model(args.model, exp.model)
    exp.model = model.cfg  # registry defaults applied

    log.warn("Loading %s input data ...", exp.dataset)
    data = load_datasets(exp, args)
    log.info("%s", data)

    log.warn("Building model %s ...", args.model)
    state, tx = create_train_state(model, exp.optimizer,
                                   jax.random.PRNGKey(exp.seed))

    if args.shallownet_pretrain:
        params = restore_shallownet(state.params, args.shallownet_pretrain)
        state = TrainState(params=params, opt_state=state.opt_state,
                           step=state.step)

    writer = MetricWriter(exp.train_dir) if exp.train_dir else None

    # Mesh-sharded training (reference regime scaled out; the reference's
    # only "parallelism" was gpu_fraction co-tenancy, train_gaze.py:31-35)
    mesh = None
    if args.data_parallel != 1 or args.model_parallel != 1:
        from ..parallel import make_mesh

        mesh = make_mesh(data_parallel=args.data_parallel,
                         model_parallel=args.model_parallel)
        log.infov("mesh: %s", dict(mesh.shape))

    # Prefetch training batches on a worker thread, casting the two big
    # streams (c3d ~236 MB, frames ~135 MB per fp32 batch-28) to the
    # compute dtype HOST-side first — on transfer-bound hosts the wire
    # bytes, not compute, dominate the feature-fed step (BENCHMARKS.md).
    # The models cast inputs to compute_dtype in-graph anyway; gazemaps
    # stay fp32 (loss targets).
    train_iter = None
    if args.prefetch and data.train is not None:
        from ..data.prefetch import prefetch_batches

        cast = None
        if model.cfg.compute_dtype == "bfloat16":
            cast = {"frames": jnp.bfloat16, "c3d": jnp.bfloat16}
        sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding

            from ..parallel import batch_spec

            sharding = NamedSharding(mesh, batch_spec())
        # max_batches is an upper bound; checkpoint resume happens inside
        # fit(), which simply stops consuming at max_steps — the small
        # prefetch queue bounds any over-production
        train_iter = prefetch_batches(data.train, model.cfg.batch_size,
                                      cast=cast, sharding=sharding,
                                      max_batches=exp.schedule.max_steps)

    log.warn("Start fitting ...")
    state = fit(model, state, tx, data, exp, train_dir=exp.train_dir,
                metric_writer=writer, profile_steps=args.profile_steps,
                train_iterator=train_iter, mesh=mesh,
                model_parallel=(args.model_parallel > 1) if mesh else None)

    if data.test is not None and len(data.test) >= model.cfg.batch_size:
        log.warn("Final test-split evaluation ...")
        if mesh is not None:
            from ..parallel import make_sharded_predict

            predict = make_sharded_predict(
                model, mesh, model_parallel=args.model_parallel > 1)
        else:
            predict = make_predict_fn(model)
        _, scores = evaluator.generate_and_evaluate(
            predict, state.params, data.test, model.cfg.batch_size,
            max_instances=None, mesh=mesh,
            input_cast=(jnp.bfloat16 if model.cfg.compute_dtype ==
                        "bfloat16" else None))
        if writer:
            writer.scalars(int(state.step),
                           {f"test/{m}": s for m, s in scores.items()})
    if writer:
        writer.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
