"""Quickstart: train, evaluate, stream, and export with the RGP framework.

Runs entirely on synthetic data (hermetic). On a TPU host this uses the
chip; under JAX_PLATFORMS=cpu it runs anywhere.

    python examples/quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from recurrent_gaze_prediction_tpu import registry
from recurrent_gaze_prediction_tpu.config import ExperimentConfig
from recurrent_gaze_prediction_tpu.data import synthetic
from recurrent_gaze_prediction_tpu.eval import evaluator
from recurrent_gaze_prediction_tpu.models import streaming
from recurrent_gaze_prediction_tpu.train import (
    create_train_state,
    make_predict_fn,
    make_train_step,
)


def main() -> None:
    from recurrent_gaze_prediction_tpu.utils import honor_jax_platforms_env

    honor_jax_platforms_env()  # make JAX_PLATFORMS=cpu actually stick
    # 1. config + model (the flagship RGP model, small for the demo)
    exp = ExperimentConfig()
    exp.model.n_lstm_steps = 8
    exp.model.batch_size = 4
    model = registry.create_model("gaze_grcn", exp.model,
                                  rnn_state_size=32, dim_cnn_proj=64)

    # 2. synthetic learnable data in the reference container format
    data = synthetic.make_splits(n_train=16, n_valid=8, n_test=8, t=8)

    # 3. train a few steps (jitted, donated, in-graph flip augmentation)
    state, tx = create_train_state(model, exp.optimizer, jax.random.PRNGKey(0))
    step = make_train_step(model, tx)
    rng = jax.random.PRNGKey(1)
    for i in range(30):
        batch = {k: jnp.asarray(v)
                 for k, v in data.train.next_batch(4).items()
                 if k != "clipnames"}
        state, metrics = step(state, batch, rng)
        if i % 10 == 0:
            print(f"step {int(metrics['step']):3d} "
                  f"loss {float(metrics['loss']):.4f}")

    # 4. on-device evaluation (CC / SIM / AUCs, batched)
    predict = make_predict_fn(model)
    _, scores = evaluator.generate_and_evaluate(
        predict, state.params, data.test, 4, max_instances=8)
    print("test scores:", {k: round(v, 4) for k, v in scores.items()})

    # 5. streaming inference over a long clip with carried state
    feats = np.random.RandomState(0).rand(20, 1024, 7, 7).astype(np.float32)
    chunks = list(streaming.stream_video(state.params, feats, model.cfg,
                                         chunk_len=8))
    print("streamed", sum(len(c) for c in chunks), "frames in",
          len(chunks), "chunks")


if __name__ == "__main__":
    main()
