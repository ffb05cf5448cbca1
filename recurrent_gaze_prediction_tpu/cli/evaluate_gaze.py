"""Offline checkpoint evaluation.

CLI rebuild of `/root/reference/models/evaluate_gaze.py`: load a trained
run (config + latest checkpoint), run inference over the validation split,
score every frame with the saliency metrics, dump per-frame scores and
frame/pred/gt images, and write the aggregate `overall.txt`
(`evaluate_gaze.py:116-227`).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Optional

import jax
import numpy as np

from ..data import crc as crc_data
from ..data import synthetic
from ..eval import evaluator
from ..registry import create_model
from ..train import Checkpointer, create_train_state, make_predict_fn
from ..utils import log, mkdir_p


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--train_dir", required=True)
    parser.add_argument("--out_dir", default=None)
    parser.add_argument("--dataset", default=None,
                        help="override the dataset recorded in config.json")
    parser.add_argument("--data_root", default=None)
    parser.add_argument("--num_frames", default=None, type=int,
                        help="cap on evaluated frames (reference --num_frames)")
    parser.add_argument("--dump_images", action="store_true")
    parser.add_argument("--on_device", action="store_true", default=True)
    parser.add_argument("--numpy_protocol", dest="on_device",
                        action="store_false",
                        help="use the per-frame NumPy protocol with "
                             "original-scale resize")
    parser.add_argument("--data_parallel", type=int, default=1,
                        help="shard metric scoring's frame axis over this "
                             "many devices (exact mode scores identically "
                             "sharded or local; on-device path only)")
    parser.add_argument("--sampled_auc", dest="exact", action="store_false",
                        default=True,
                        help="score AUC_Borji/AUC_shuffled with the "
                             "reference's n_rep=100 Monte-Carlo samplers "
                             "instead of their closed-form expectation "
                             "(on-device path only; slower, adds sampling "
                             "noise — for strict replication studies)")
    parser.add_argument("--metrics", nargs="*",
                        default=list(evaluator.AVAILABLE_METRICS))
    return parser


def main(argv: Optional[list[str]] = None) -> int:
    from ..utils import enable_compile_cache, honor_jax_platforms_env

    honor_jax_platforms_env()
    enable_compile_cache()
    args = build_parser().parse_args(argv)

    exp = Checkpointer.load_config(args.train_dir)
    if args.dataset:
        exp.dataset = args.dataset
    model = create_model(exp.model.name, exp.model)

    # dummy-free equivalent of the reference's empty-dataset model build
    state, _ = create_train_state(model, exp.optimizer, jax.random.PRNGKey(0))
    ckpt = Checkpointer(args.train_dir)
    restored = ckpt.restore_latest(jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), state))
    if restored is None:
        log.error("no checkpoint found under %s", args.train_dir)
        return 1
    state = restored

    gh, gw = model.cfg.gazemap_height, model.cfg.gazemap_width
    if exp.dataset == "synthetic":
        dataset = synthetic.make_splits(
            n_train=2, n_valid=8, n_test=2, t=model.cfg.n_lstm_steps,
            gazemap_hw=(gh, gw), seed=exp.seed).valid
    else:
        if not args.data_root:
            log.error("--data_root is required for dataset %s", exp.dataset)
            return 1
        layouts = crc_data.layouts_for(exp.dataset, args.data_root)
        dataset = crc_data.read_crc_data_sets(
            model.cfg.image_height, model.cfg.image_width, gh, gw,
            dataset=exp.dataset, layouts=layouts, split_modes="valid",
            seq_len=model.cfg.n_lstm_steps,
            fixation_original_scale=not args.on_device,
            max_folders=500).valid

    max_instances = None
    if args.num_frames is not None:
        max_instances = args.num_frames // model.cfg.n_lstm_steps + 1

    predict = make_predict_fn(model)
    input_cast = (jax.numpy.bfloat16
                  if model.cfg.compute_dtype == "bfloat16" else None)
    ret = None
    if args.on_device and not args.dump_images:
        # fused path: maps stay on-device; only scores transfer back
        try:
            ret = evaluator.generate_on_device(
                predict, state.params, dataset, model.cfg.batch_size,
                max_instances, input_cast=input_cast)
        except evaluator.RaggedMapsError:  # original-scale maps -> host path
            ret = None
    if ret is None:
        ret = evaluator.generate(predict, state.params, dataset,
                                 model.cfg.batch_size, max_instances,
                                 input_cast=input_cast)
    mesh = None
    if args.data_parallel > 1:
        from ..parallel import make_mesh

        mesh = make_mesh(data_parallel=args.data_parallel, model_parallel=1)

    # The NumPy protocol loads fixation maps at ORIGINAL scale, which the
    # batched on-device metrics (fixed [N,H,W]) cannot consume — score
    # per frame through metrics_np there instead.
    n = len(ret["pred_gazemaps"])
    fix = ret["fixationmaps"]
    ragged = isinstance(fix, np.ndarray) and fix.dtype == np.dtype(object)
    if args.on_device and ragged:
        log.warn("ragged original-scale fixation maps: falling back to "
                 "the per-frame NumPy protocol")

    if args.on_device and not ragged:
        # One metric program produces the per-frame scores
        # (reference scores.txt, evaluate_gaze.py:149-158); overall.txt
        # is their nanmean — no second pass.
        if mesh is not None:
            from ..parallel import make_sharded_evaluate

            per_frame = make_sharded_evaluate(
                mesh, metrics=tuple(args.metrics), exact=args.exact)(
                    jax.numpy.asarray(ret["pred_gazemaps"]),
                    jax.numpy.asarray(ret["gt_gazemaps"]),
                    jax.numpy.asarray(fix),
                    jax.random.PRNGKey(0))
        else:
            per_frame = evaluator.metrics_jax.evaluate_batch(
                jax.numpy.asarray(ret["pred_gazemaps"]),
                jax.numpy.asarray(ret["gt_gazemaps"]),
                jax.numpy.asarray(fix),
                jax.random.PRNGKey(0), metrics=tuple(args.metrics),
                exact=args.exact)
        # materialize each metric's frame vector ONCE: indexing device
        # arrays per (frame, metric) in the scores.txt loop below would
        # pay n_frames x n_metrics gather+D2H round-trips
        per_frame = {m: np.asarray(v) for m, v in per_frame.items()}
        scores = {m: float(np.nanmean(v)) for m, v in per_frame.items()}

        def frame_score(metric, i):
            return float(per_frame[metric][i])
    else:
        # Score each frame exactly once here too: overall.txt is the
        # nanmean of the very same per-frame values written to scores.txt
        # (one RNG stream), not a second full metric pass.
        rng = np.random.RandomState(0)
        per_frame = {
            m: evaluator.metrics_np.saliency_scores(
                m, ret["pred_gazemaps"], ret["gt_gazemaps"],
                ret["fixationmaps"], rng=rng)
            for m in args.metrics
        }
        scores = {m: float(np.nanmean(np.asarray(v, np.float64)))
                  for m, v in per_frame.items()}
        for metric, score in scores.items():
            log.infov("Saliency %s : %f", metric, score)

        def frame_score(metric, i):
            return float(per_frame[metric][i])

    out_dir = args.out_dir or os.path.join(args.train_dir, "evaluation")
    mkdir_p(out_dir)
    evaluator.write_overall(os.path.join(out_dir, "overall.txt"), scores)
    log.infov("wrote %s", os.path.join(out_dir, "overall.txt"))

    with open(os.path.join(out_dir, "scores.txt"), "w") as f:
        f.write("frame\t" + "\t".join(args.metrics) + "\n")
        for i in range(n):
            row = "\t".join(f"{frame_score(m, i):.6f}"
                            for m in args.metrics)
            f.write(f"{i:06d}\t{row}\n")

    if args.dump_images:
        from PIL import Image

        def _save(path, arr):
            arr = np.asarray(arr, np.float32)
            lo, hi = arr.min(), arr.max()
            if hi > lo:
                arr = (arr - lo) / (hi - lo)
            Image.fromarray((arr * 255).astype(np.uint8)).save(path)

        for i in range(min(len(ret["pred_gazemaps"]), 200)):
            _save(os.path.join(out_dir, f"{i:06d}_pred.png"),
                  ret["pred_gazemaps"][i])
            _save(os.path.join(out_dir, f"{i:06d}_gt.png"),
                  ret["gt_gazemaps"][i])
            frame = (np.asarray(ret["images"][i]) * 255).astype(np.uint8)
            Image.fromarray(frame).save(
                os.path.join(out_dir, f"{i:06d}_frame.png"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
