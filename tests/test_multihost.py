"""True multi-process training: 2 processes x 4 virtual devices = one
8-device mesh with XLA collectives crossing process boundaries (Gloo).

The in-process sharding tests (test_sharding.py) validate SPMD semantics
on one process; this validates the actual MULTI-HOST wiring — distributed
init, host-local input sharding, cross-process gradient psum — and pins
the result to the single-process 8-device run of the same program."""

import os
import re
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

# >60s on the virtual-CPU harness: deselected by default (pyproject addopts
# -m "not slow"); run everything with `pytest -m ""`.
pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(nproc: int, port: int):
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the worker sets its own JAX_PLATFORMS/XLA_FLAGS before importing jax
    procs = [
        subprocess.Popen([sys.executable, _WORKER, str(i), str(nproc),
                          str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env, cwd=_REPO)
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)
    return outs


def _parse_losses(out: str) -> list[float]:
    return [float(m.group(1))
            for m in re.finditer(r"STEP \d+ ([-\d.]+)", out)]


def test_two_process_training_matches_single_process():
    losses = [_parse_losses(o) for o in _run_workers(2, _free_port())]
    assert len(losses[0]) == 3
    # both processes see identical replicated losses
    np.testing.assert_allclose(losses[0], losses[1], rtol=0, atol=0)

    # and they match the same program run single-process on 8 devices
    from recurrent_gaze_prediction_tpu import registry
    from recurrent_gaze_prediction_tpu.config import ExperimentConfig
    from recurrent_gaze_prediction_tpu.data import synthetic
    from recurrent_gaze_prediction_tpu.parallel import (
        make_mesh,
        make_sharded_train_step,
        place_state,
        shard_batch,
    )
    from recurrent_gaze_prediction_tpu.train import create_train_state

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual platform (conftest)")

    exp = ExperimentConfig()
    exp.model.n_lstm_steps = 4
    exp.model.batch_size = 8
    exp.model.compute_dtype = "float32"
    exp.model.dim_cnn_proj = 16
    exp.model.rnn_state_size = 8
    model = registry.create_model("gaze_grcn77", exp.model)

    mesh = make_mesh(data_parallel=8, model_parallel=1)
    state, tx = create_train_state(model, exp.optimizer,
                                   jax.random.PRNGKey(0))
    state = place_state(state, mesh)
    step = make_sharded_train_step(model, tx, mesh, use_flip=False,
                                   donate=False)
    data = synthetic.make_clip_windows(8, 4, seed=0, gazemap_hw=(7, 7))
    batch = shard_batch(data.next_batch(8), mesh)
    rng = jax.random.PRNGKey(1)
    ref = []
    for _ in range(3):
        state, metrics = step(state, batch, rng)
        ref.append(float(jax.device_get(metrics["loss"])))

    np.testing.assert_allclose(losses[0], ref, rtol=1e-6, atol=1e-7)
