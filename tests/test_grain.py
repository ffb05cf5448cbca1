"""Grain input-pipeline + preemption-checkpoint tests."""

import os
import signal
import threading

import numpy as np
import pytest

from recurrent_gaze_prediction_tpu.data import synthetic
from recurrent_gaze_prediction_tpu.data.grain_pipeline import (
    iterate_batches,
    make_dataloader,
)


def test_grain_loader_batches_and_shuffles():
    data = synthetic.make_clip_windows(12, 3, seed=0)
    loader = make_dataloader(data, batch_size=4, seed=1, num_epochs=1)
    batches = list(iterate_batches(loader))
    assert len(batches) == 3
    for batch in batches:
        assert batch["frames"].shape == (4, 3, 98, 98, 3)
        assert batch["c3d"].shape == (4, 3, 1024, 7, 7)
    # shuffled: batch order differs from insertion order
    first = batches[0]["pupils"]
    unshuffled = data.pupils[:4]
    assert not np.allclose(first, unshuffled)


def test_grain_loader_sharding():
    data = synthetic.make_clip_windows(8, 2, seed=0)
    shard0 = list(iterate_batches(make_dataloader(
        data, batch_size=2, shuffle=False, num_epochs=1,
        shard_index=0, shard_count=2)))
    shard1 = list(iterate_batches(make_dataloader(
        data, batch_size=2, shuffle=False, num_epochs=1,
        shard_index=1, shard_count=2)))
    assert len(shard0) == len(shard1) == 2
    # disjoint halves
    all0 = np.concatenate([b["pupils"] for b in shard0])
    all1 = np.concatenate([b["pupils"] for b in shard1])
    assert not np.intersect1d(all0.ravel(), all1.ravel()).size == \
        all0.size  # not identical


def test_fit_with_grain_iterator(tmp_path):
    """fit() driven by a grain DataLoader instead of next_batch."""
    import jax

    from recurrent_gaze_prediction_tpu import registry
    from recurrent_gaze_prediction_tpu.config import ExperimentConfig
    from recurrent_gaze_prediction_tpu.train import create_train_state, fit

    exp = ExperimentConfig()
    exp.model.n_lstm_steps = 3
    exp.model.batch_size = 2
    exp.model.compute_dtype = "float32"
    exp.model.dim_cnn_proj = 8
    exp.model.rnn_state_size = 4
    exp.schedule.max_steps = 4
    exp.schedule.steps_per_logprint = 100
    exp.schedule.steps_per_checkpoint = 100
    exp.schedule.steps_per_validation = 100
    exp.schedule.steps_per_evaluation = 100
    model = registry.create_model("gaze_grcn77", exp.model)
    data = synthetic.make_splits(n_train=8, n_valid=0, n_test=0, t=3,
                                 gazemap_hw=(7, 7))
    state, tx = create_train_state(model, exp.optimizer, jax.random.PRNGKey(0))

    loader = make_dataloader(data.train, batch_size=2, num_epochs=2)
    state = fit(model, state, tx, data, exp,
                train_iterator=iterate_batches(loader))
    assert int(state.step) == 4


def test_fit_checkpoints_on_sigterm(tmp_path):
    """A SIGTERM mid-training stops the loop cleanly with a checkpoint."""
    import jax

    from recurrent_gaze_prediction_tpu import registry
    from recurrent_gaze_prediction_tpu.config import ExperimentConfig
    from recurrent_gaze_prediction_tpu.train import create_train_state, fit

    exp = ExperimentConfig()
    exp.model.n_lstm_steps = 3
    exp.model.batch_size = 2
    exp.model.compute_dtype = "float32"
    exp.model.dim_cnn_proj = 8
    exp.model.rnn_state_size = 4
    exp.schedule.max_steps = 100000  # would run forever without the signal
    exp.schedule.steps_per_checkpoint = 1000000
    exp.schedule.steps_per_validation = 1000000
    exp.schedule.steps_per_evaluation = 1000000
    exp.schedule.steps_per_logprint = 1000000
    model = registry.create_model("gaze_grcn77", exp.model)
    data = synthetic.make_splits(n_train=4, n_valid=0, n_test=0, t=3,
                                 gazemap_hw=(7, 7))
    state, tx = create_train_state(model, exp.optimizer, jax.random.PRNGKey(0))

    train_dir = str(tmp_path / "preempt")
    pid = os.getpid()
    timer = threading.Timer(10.0, lambda: os.kill(pid, signal.SIGTERM))
    timer.start()
    try:
        state = fit(model, state, tx, data, exp, train_dir=train_dir)
    finally:
        timer.cancel()
    assert int(state.step) > 0
    assert os.path.isdir(os.path.join(train_dir, "model"))
