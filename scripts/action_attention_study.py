"""Gaze-attention benefit on the action task (VERDICT r4 weak #5).

The reference's action stack exists to show that gaze attention helps
action classification (`/root/reference/models/action_classification.py:
210-240`: gazemap -> [2401,49] projection -> spatial reweighting of the
C3D map). Round 4 showed both heads *learn* with and without attention;
this study constructs a corpus where the label signal LIVES in the
gaze-marked cell and measures the attention gain directly:

  * each sample hides its 13-bit label pattern in 13 dedicated C3D
    channels at ONE of the 49 spatial cells (the "signal cell", random
    per sample);
  * every other cell carries an equally-strong DISTRACTOR pattern (a
    random pseudo-label) in the same channels — without attention the
    pooled features mix 1 signal cell with 48 conflicting distractors;
  * the gaze map is a Gaussian centered on the signal cell, so the
    learned [2401,49] projection can amplify exactly the right cell.

Train/eval `ActionClassifier` four ways (NN/SVM x with/without
attention) on identical data and report held-out mAP. Runs on CPU in
~1 min.

    python scripts/action_attention_study.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recurrent_gaze_prediction_tpu.utils import (  # noqa: E402
    honor_jax_platforms_env,
)

# force CPU: tiny linear heads gain nothing from the device, and
# `setdefault` would be a no-op on hosts that export JAX_PLATFORMS to a
# relay backend (then the study would grab the single-tenant TPU)
os.environ["JAX_PLATFORMS"] = "cpu"
honor_jax_platforms_env()

import numpy as np  # noqa: E402


def make_attention_corpus(n: int, *, n_classes: int = 13, seed: int = 0,
                          signal: float = 4.0, distract_amp: float = 0.7,
                          noise: float = 0.3) -> dict:
    """Samples where the label signal concentrates at the gazed cell.

    `distract_amp` sets how badly the 48 non-signal cells pollute an
    attention-less spatial pool: the pooled distractor noise has
    std ~ distract_amp * sqrt(48), so at the 0.7 default (~4.8) it
    swamps the pooled signal (4.0) — the no-attention model can only
    weakly decode, while an attention model that learns to amplify the
    gazed cell sees the clean pattern. Two measured failure modes kept
    as negative results: with distract_amp == signal the task is
    IMPOSSIBLE without attention, and then NOTHING bootstraps (the
    random-init [2401,49] projection gives no consistently-signed
    gradient toward alignment when the head is also at chance — all
    four configs stuck at mAP ~ 0.32 = chance); and at the reference's
    lr 0.002 the schedule decays before the projection aligns (gains
    < 0.02). The paper's claim is attention HELPS, not
    attention-enables-from-zero; the defaults here (signal 4.0,
    distract 0.7, lr 0.01) sit in the demonstrable regime."""
    rng = np.random.RandomState(seed)
    c3d = rng.randn(n, 1024, 49).astype(np.float32) * noise
    labels = (rng.rand(n, n_classes) < 0.3).astype(np.float32)
    cells = rng.randint(0, 49, n)

    # distractors: independent pseudo-labels in the SAME 13 channels at
    # every non-signal cell
    distract = (rng.rand(n, n_classes, 49) < 0.3).astype(np.float32)
    c3d[:, :n_classes, :] += distract_amp * (2.0 * distract - 1.0)
    # overwrite the signal cell with the true pattern
    c3d[np.arange(n), :n_classes, cells] = (
        signal * (2.0 * labels - 1.0)
        + rng.randn(n, n_classes).astype(np.float32) * noise)

    # gaze: Gaussian at the signal cell's (row, col) on the 49x49 map
    cy = (cells // 7) * 7 + 3.0
    cx = (cells % 7) * 7 + 3.0
    yy = np.arange(49).reshape(1, 49, 1)
    xx = np.arange(49).reshape(1, 1, 49)
    gaze = np.exp(-((yy - cy[:, None, None]) ** 2
                    + (xx - cx[:, None, None]) ** 2) / (2 * 3.0 ** 2))
    return {
        "c3d": c3d.reshape(n, 1024, 7, 7),
        "gaze_pred": gaze.astype(np.float32),
        "labels": labels,
    }


def run_head(head: str, use_gazemap: bool, train: dict, test: dict,
             *, max_iter: int, batch_size: int, seed: int,
             learning_rate: float = 0.01) -> dict:
    from recurrent_gaze_prediction_tpu.action.classification import (
        ActionClassifier,
        ActionHParams,
        evaluate,
    )

    hp = ActionHParams(head=head, use_gazemap=use_gazemap,
                       max_iter=max_iter, batch_size=batch_size, seed=seed,
                       learning_rate=learning_rate)
    clf = ActionClassifier(hp)
    n = len(train["labels"])
    rng = np.random.RandomState(seed + 1)

    def batches():
        while True:
            idx = rng.randint(0, n, batch_size)
            yield {k: v[idx] for k, v in train.items()}

    clf.fit(batches())
    scores = clf.predict(test)
    thresh = 0.0 if head == "SVM" else 0.5
    out = evaluate(test["labels"], scores, threshold=thresh)
    return {"mAP": round(out["mean_average_precision"], 4),
            "hamming": round(out["hamming_loss"], 4)}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n_train", type=int, default=1500)
    p.add_argument("--n_test", type=int, default=500)
    p.add_argument("--distract_amp", type=float, default=0.7)
    p.add_argument("--signal", type=float, default=4.0)
    p.add_argument("--learning_rate", type=float, default=0.01)
    p.add_argument("--max_iter", type=int, default=1500)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    train = make_attention_corpus(args.n_train, seed=args.seed,
                                  signal=args.signal,
                                  distract_amp=args.distract_amp)
    test = make_attention_corpus(args.n_test, seed=args.seed + 100,
                                 signal=args.signal,
                                 distract_amp=args.distract_amp)

    results = {}
    for head in ("NN", "SVM"):
        for attn in (True, False):
            tag = f"{head}_{'attn' if attn else 'noattn'}"
            results[tag] = run_head(head, attn, train, test,
                                    max_iter=args.max_iter,
                                    batch_size=args.batch_size,
                                    seed=args.seed,
                                    learning_rate=args.learning_rate)
            print(json.dumps({tag: results[tag]}), flush=True)

    summary = {
        "nn_attention_map_gain": round(
            results["NN_attn"]["mAP"] - results["NN_noattn"]["mAP"], 4),
        "svm_attention_map_gain": round(
            results["SVM_attn"]["mAP"] - results["SVM_noattn"]["mAP"], 4),
        **results,
    }
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
