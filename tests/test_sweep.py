"""Checkpoint-sweep driver + multi-host input helper tests."""

import jax
import numpy as np
import pytest

from recurrent_gaze_prediction_tpu.cli import train_gaze
from recurrent_gaze_prediction_tpu.data import synthetic
from recurrent_gaze_prediction_tpu.eval.sweep import sweep_checkpoints
from recurrent_gaze_prediction_tpu.parallel import make_mesh
from recurrent_gaze_prediction_tpu.parallel.mesh import (
    global_batch_from_host_local,
    host_local_slice,
)


def test_sweep_checkpoints(tmp_path):
    train_dir = str(tmp_path / "run")
    rc = train_gaze.main([
        "--model", "gaze_grcn77", "--dataset", "synthetic",
        "--max_steps", "4", "--n_lstm_steps", "4", "--batch_size", "2",
        "--synthetic_clips", "4", "--compute_dtype", "float32",
        "--train_dir", train_dir,
    ])
    assert rc == 0
    dataset = synthetic.make_splits(n_train=2, n_valid=4, n_test=2, t=4,
                                    gazemap_hw=(7, 7)).valid
    results = sweep_checkpoints(train_dir, dataset, metrics=("cc",),
                                max_instances=4)
    assert len(results) >= 1
    for scores in results.values():
        assert np.isfinite(scores["cc"])


def test_host_local_slice_single_process():
    sl = host_local_slice(16)
    assert (sl.start, sl.stop) == (0, 16)  # one process owns everything
    sl2 = host_local_slice(16, process_index=3, process_count=4)
    assert (sl2.start, sl2.stop) == (12, 16)
    with pytest.raises(ValueError):
        host_local_slice(10, process_index=0, process_count=4)


def test_global_batch_from_host_local():
    mesh = make_mesh(data_parallel=8, model_parallel=1)
    data = synthetic.make_clip_windows(8, 2, seed=0)
    batch = data.next_batch(8)
    global_batch = global_batch_from_host_local(batch, mesh)
    assert global_batch["frames"].shape == (8, 2, 98, 98, 3)
    np.testing.assert_allclose(np.asarray(global_batch["frames"]),
                               batch["frames"], rtol=1e-6)
