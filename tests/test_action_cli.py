"""Action-classification CLI smoke test over record shards."""

import json
import os

import numpy as np

from recurrent_gaze_prediction_tpu.action import write_record_shard
from recurrent_gaze_prediction_tpu.cli import action_classification


def _write_shards(out_dir, n_shards=2, n=24, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(out_dir, exist_ok=True)
    for si in range(n_shards):
        labels = np.zeros((n, 13), np.float32)
        labels[np.arange(n), rng.randint(0, 13, n)] = 1.0
        c3d = rng.rand(n, 1024, 7, 7).astype(np.float32) * 0.1
        for i in range(n):
            c3d[i, int(np.argmax(labels[i]))] += 1.0
        write_record_shard(
            os.path.join(out_dir, f"train-{si:05d}.npz"),
            c3d=c3d,
            frames=rng.rand(n, 98, 98, 3).astype(np.float32),
            gaze_pred=rng.rand(n, 49, 49).astype(np.float32),
            gaze_gt=rng.rand(n, 49, 49).astype(np.float32),
            labels=labels,
        )


def test_action_cli_trains_and_scores(tmp_path):
    records = str(tmp_path / "records")
    _write_shards(records)
    out = str(tmp_path / "scores.json")
    rc = action_classification.main([
        "--records_glob", os.path.join(records, "train-*.npz"),
        "--head", "NN", "--batch_size", "8", "--max_iter", "40",
        "--learning_rate", "0.003", "--out", out,
    ])
    assert rc == 0
    scores = json.load(open(out))
    assert 0.0 <= scores["hamming_loss"] <= 1.0
    assert scores["mean_average_precision"] > 0.2  # learnable records


def test_action_cli_missing_glob(tmp_path):
    rc = action_classification.main([
        "--records_glob", str(tmp_path / "nothing-*.npz")])
    assert rc == 1
