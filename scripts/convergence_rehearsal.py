"""Convergence rehearsal: train a gaze model to real saliency quality on
the learnable synthetic corpus, and (optionally) compare training
dynamics across compute dtypes.

VERDICT r3 items 2-3: component parity ("matches TF at 1e-5") and step
speed do not add up to "the framework trains the paper's model" — this
script supplies that end-to-end evidence. The default trains gaze_grcn
(xentropy, 49x49 — the RGP regime, reference defaults B=28/T=42,
`/root/reference/models/train_gaze.py:74-97`) on the synthetic corpus
(`data/synthetic.py`, gaze follows a visible moving target) and reports
the on-device CC / SIM / AUC_Borji / AUC_shuffled curve on a held-out
split. `--model` rehearses any registered family at its own registry
defaults (gaze_lstm, gaze_rnn, gaze_grcn_cascade, ...). With
`--dtypes bfloat16 float32` it runs BOTH dtypes from the same seed and
prints the curves side by side — the measured cost of the bf16 default
(PARITY.md "intentional divergences").

    python scripts/convergence_rehearsal.py --steps 600
    python scripts/convergence_rehearsal.py --steps 600 --model gaze_lstm
    python scripts/convergence_rehearsal.py --steps 600 \
        --dtypes bfloat16 float32
    # the reference's two-stage workflow (pretrain -> graft -> train):
    python -m recurrent_gaze_prediction_tpu.cli.pretrain_shallownet \
        --dataset synthetic --out /tmp/sn_pre --max_steps 600
    python scripts/convergence_rehearsal.py --model gaze_rnn \
        --steps 300 --shallownet_pretrain /tmp/sn_pre

Emits one JSON line per (dtype, eval point) plus a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recurrent_gaze_prediction_tpu.utils import (  # noqa: E402
    enable_compile_cache,
    honor_jax_platforms_env,
)

honor_jax_platforms_env()  # JAX_PLATFORMS=cpu works like the CLIs

import jax  # noqa: E402

# one unified persistent cache for every device-backend invocation style
# (JAX_PLATFORMS set or unset — enable_compile_cache handles both since
# the advisor-r4 fix; CPU is skipped inside)
enable_compile_cache()

import jax.numpy as jnp
import numpy as np


def run_one(dtype: str, args) -> dict:
    from recurrent_gaze_prediction_tpu import registry
    from recurrent_gaze_prediction_tpu.config import ExperimentConfig
    from recurrent_gaze_prediction_tpu.data import synthetic
    from recurrent_gaze_prediction_tpu.eval import evaluator
    from recurrent_gaze_prediction_tpu.train import (
        create_train_state,
        make_predict_fn,
        make_train_step,
    )

    exp = ExperimentConfig()
    # reference training regime: batch 28, Adam 1e-4, decay 0.8 / 500
    # steps, clip 10, dropout 0.5, flips (models/train_gaze.py:74-97,
    # models/gaze_rnn.py:436-444)
    exp.optimizer.initial_learning_rate = args.learning_rate
    overrides = dict(n_lstm_steps=args.t, batch_size=args.batch,
                     compute_dtype=dtype)
    # only override cell/projection widths when asked — other families
    # (gaze_rnn's 32-proj flat GRU, cascade's two-level cells) keep their
    # registry defaults otherwise
    if args.rnn_state_size is not None:
        overrides["rnn_state_size"] = args.rnn_state_size
    if args.dim_cnn_proj is not None:
        overrides["dim_cnn_proj"] = args.dim_cnn_proj
    model = registry.create_model(args.model, exp.model, **overrides)

    if args.shallownet_pretrain:
        # fail fast with a useful message BEFORE data/model setup: only
        # families with a top-level ShallowNet branch can graft
        # (advisor r4 — the generic restore error surfaced too late)
        probe = jax.eval_shape(model.init, jax.random.PRNGKey(0))
        if "shallownet" not in probe:
            raise SystemExit(
                f"--shallownet_pretrain: model {args.model!r} has no "
                "'shallownet' params subtree; grafting families: "
                "gaze_rnn, gaze_grcn_cascade, gaze_framewise_shallownet")

    data = synthetic.make_splits(
        n_train=args.train_clips, n_valid=args.valid_clips, n_test=2,
        t=args.t, seed=args.seed,
        # corpus at the family's native map resolution (7x7 for the *77
        # and legacy-pupil families, 49x49 otherwise)
        gazemap_hw=(model.cfg.gazemap_height, model.cfg.gazemap_width))
    state, tx = create_train_state(model, exp.optimizer,
                                   jax.random.PRNGKey(args.seed))
    if args.shallownet_pretrain:
        # the reference's two-stage workflow: pretrain ShallowNet
        # (SALICON regime), graft, then train the gaze model with the
        # grafted subtree frozen (`models/gaze_rnn.py:412-433,459`)
        import dataclasses as _dc

        from recurrent_gaze_prediction_tpu.train.checkpoint import (
            restore_shallownet,
        )
        state = _dc.replace(
            state,
            params=restore_shallownet(state.params,
                                      args.shallownet_pretrain))
    step = make_train_step(model, tx, donate=True)
    predict = make_predict_fn(model)
    input_cast = jnp.bfloat16 if dtype == "bfloat16" else None

    rng = jax.random.PRNGKey(args.seed + 1)

    # Training data lives ON DEVICE for the whole run (the corpus is a few
    # hundred MB); per-step batches are device-side gathers. Re-shipping a
    # ~380 MB host batch every step would measure the host wire, not
    # training — and unsynced async dispatch stages dozens of those
    # batches in host RAM (measured: >30 GB RSS before this change).
    dev_train = {}
    keys = ["frames", "c3d", "gazemaps"]
    if getattr(data.train, "pupils", None) is not None and \
            args.model.startswith("gaze_pupil"):
        keys.append("pupils")  # legacy prototypes carry a pupil-size head
    for k in keys:
        arr = np.asarray(getattr(data.train, k), np.float32)
        dev_train[k] = jnp.asarray(arr)
        if k in ("frames", "c3d") and dtype == "bfloat16":
            # same f32->bf16 cast the prefetch pipeline applies host-side
            dev_train[k] = dev_train[k].astype(jnp.bfloat16)
    n_train = dev_train["frames"].shape[0]
    order_rng = np.random.RandomState(args.seed + 2)

    pupil_eval = None
    if args.model.startswith("gaze_pupil"):
        # the pupil head is these prototypes' distinguishing feature
        # (`model_gru_rcn.py:135-141`): report held-out pupil quality,
        # not only the gaze map scores
        from recurrent_gaze_prediction_tpu.models.gaze_legacy import (
            apply_pupil_grcn,
            apply_pupil_gru2,
        )

        gh, gw = model.cfg.gazemap_height, model.cfg.gazemap_width

        @jax.jit
        def _joint(params, frames, c3d):
            if model.kind == "grcn":
                return apply_pupil_grcn(params, frames, c3d, model.cfg)
            b, t = c3d.shape[:2]
            zeros = jnp.zeros((b, t, gh * gw + 1))  # no teacher at eval
            return apply_pupil_gru2(params, frames, c3d, zeros, model.cfg)

        def pupil_eval(params) -> dict:
            preds, gts = [], []
            v = data.valid
            for i in range(0, len(v.c3d), 8):
                joint = _joint(params, jnp.asarray(v.frames[i:i + 8]),
                               jnp.asarray(v.c3d[i:i + 8]))
                preds.append(np.asarray(joint[..., -1], np.float32))
                gts.append(np.asarray(v.pupils[i:i + 8], np.float32))
            p = np.concatenate(preds).ravel()
            g = np.concatenate(gts).ravel()
            return {
                "pupil_corr": round(float(np.corrcoef(p, g)[0, 1]), 4),
                "pupil_rmse": round(float(np.sqrt(np.mean((p - g) ** 2))),
                                    4),
            }

    def eval_now():
        _, scores = evaluator.generate_and_evaluate(
            predict, state.params, data.valid, min(args.batch, 8),
            max_instances=None, input_cast=input_cast)
        out = {k: round(float(v), 4) for k, v in scores.items()}
        if pupil_eval is not None:
            out.update(pupil_eval(state.params))
        return out

    curve = []
    t0 = time.time()
    order = np.zeros(0, np.int64)
    for i in range(args.steps):
        while len(order) < args.batch:
            order = np.concatenate([order, order_rng.permutation(n_train)])
        idx = jnp.asarray(order[:args.batch])
        order = order[args.batch:]
        batch = {k: v[idx] for k, v in dev_train.items()}
        state, metrics = step(state, batch, rng)
        s = i + 1
        if s % 20 == 0:  # keep the async dispatch queue bounded
            float(metrics["loss"])
        if s % args.eval_every == 0 or s == args.steps:
            loss = float(metrics["loss"])
            scores = eval_now()
            point = {"model": args.model, "dtype": dtype, "step": s,
                     "loss": round(loss, 4), **scores}
            if args.shallownet_pretrain:
                point["shallownet"] = "pretrained"
            curve.append(point)
            print(json.dumps(point), flush=True)
    wall = time.time() - t0
    final = dict(curve[-1])
    final["wall_sec"] = round(wall, 1)
    return final


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="gaze_grcn")
    p.add_argument("--shallownet_pretrain", default=None,
                   help="params checkpoint to graft into the (frozen) "
                        "ShallowNet branch before training — the "
                        "reference's pretrain-then-train workflow")
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--batch", type=int, default=28)
    p.add_argument("--t", type=int, default=42)
    p.add_argument("--rnn_state_size", type=int, default=None)
    p.add_argument("--dim_cnn_proj", type=int, default=None)
    p.add_argument("--train_clips", type=int, default=56)
    p.add_argument("--valid_clips", type=int, default=16)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--eval_every", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtypes", nargs="+", default=["bfloat16"])
    args = p.parse_args()

    finals = {}
    for dtype in args.dtypes:
        finals[dtype] = run_one(dtype, args)
    print(json.dumps({"summary": finals}), flush=True)


if __name__ == "__main__":
    main()
