"""Evaluation walkthrough — the runnable `visualize.ipynb` equivalent.

The reference ships an 8-cell notebook that loads a trained run, browses
predictions, and eyeballs grids (`/root/reference/evaluation/
visualize.ipynb`, `visualize_output.py:87-150`). This script walks the
same loop end to end on synthetic data, hermetically:

  1. train a small gaze_grcn77 run (checkpoint + config.json on disk)
  2. resurrect the run from its train_dir (config + latest checkpoint)
  3. dump input / ground-truth / prediction image grids
  4. score with the on-device batched metrics AND the reference's
     original-scale NumPy protocol, print the per-metric comparison
  5. export SALICON-format base64 JSON results

    python examples/eval_walkthrough.py [out_dir]

Runs anywhere (JAX_PLATFORMS=cpu works); ~2 min on CPU.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    from recurrent_gaze_prediction_tpu.utils import honor_jax_platforms_env

    honor_jax_platforms_env()  # make JAX_PLATFORMS=cpu actually stick
    out_root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="rgp_eval_walkthrough_")
    train_dir = os.path.join(out_root, "run")

    # ---- 1. train a small run (synthetic, ~1 min) --------------------
    from recurrent_gaze_prediction_tpu.cli import train_gaze

    rc = train_gaze.main([
        "--model", "gaze_grcn77", "--dataset", "synthetic",
        "--max_steps", "30", "--n_lstm_steps", "6", "--batch_size", "4",
        "--synthetic_clips", "8", "--compute_dtype", "float32",
        "--train_dir", train_dir,
    ])
    assert rc == 0, "training failed"

    # ---- 2+3. resurrect the run and dump visualization grids ---------
    from recurrent_gaze_prediction_tpu.eval import evaluator, visualize

    ret = visualize.visualize_outputs(train_dir, max_instances=8)
    print(f"\ngrids: {train_dir}/visualization/{{frames,gt,pred}}.png")
    print(f"generated {len(ret['pred_gazemaps'])} frames "
          f"({len(set(ret['clipnames']))} clips)")

    # ---- 4. score through both protocols ------------------------------
    metrics = ("cc", "sim", "nss")
    print(f"\n{'metric':8s} {'on-device':>10s} {'numpy-protocol':>15s}")
    on_dev = evaluator.evaluate(ret["pred_gazemaps"], ret["gt_gazemaps"],
                                ret["fixationmaps"], metrics=metrics,
                                on_device=True)
    np_proto = evaluator.evaluate(ret["pred_gazemaps"], ret["gt_gazemaps"],
                                  ret["fixationmaps"], metrics=metrics,
                                  on_device=False)
    for m in metrics:
        print(f"{m:8s} {on_dev[m]:10.4f} {np_proto[m]:15.4f}")

    # ---- 5. SALICON-format export (imagetools.py equivalent) ----------
    json_path = os.path.join(out_root, "salicon_results.json")
    ids = list(range(min(8, len(ret["pred_gazemaps"]))))
    visualize.save_salicon_json(json_path, ids,
                                ret["pred_gazemaps"][:len(ids)])
    back = visualize.decode_salicon_result(
        __import__("json").load(open(json_path))[0])
    assert back.shape == ret["pred_gazemaps"][0].shape
    print(f"\nSALICON JSON: {json_path} ({len(ids)} records, "
          f"round-trip OK)")
    print(f"\nwalkthrough artifacts under {out_root}")


if __name__ == "__main__":
    main()
