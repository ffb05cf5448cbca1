"""Worker for the 2-process multi-host integration test (test_multihost.py).

Each process owns 4 virtual CPU devices; together they form one 8-device
"data" mesh. Both run the SAME SPMD train-step program; each feeds only
its host-local half of the global batch (`host_local_slice` ->
`global_batch_from_host_local`), and XLA's collectives (over Gloo on CPU)
produce identical replicated losses on both processes — the multi-host
input-sharding recipe from SURVEY.md section 7 step 7, actually executed
across process boundaries rather than simulated.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
Prints one line per step: STEP <i> <loss:.8f>
"""

import os
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)

    import numpy as np

    from recurrent_gaze_prediction_tpu import registry
    from recurrent_gaze_prediction_tpu.config import ExperimentConfig
    from recurrent_gaze_prediction_tpu.data import synthetic
    from recurrent_gaze_prediction_tpu.parallel import (
        global_batch_from_host_local,
        host_local_slice,
        make_mesh,
        make_sharded_train_step,
        place_state,
    )
    from recurrent_gaze_prediction_tpu.train import create_train_state

    assert len(jax.devices()) == 4 * nproc, len(jax.devices())
    global_batch, t = 8, 4

    exp = ExperimentConfig()
    exp.model.n_lstm_steps = t
    exp.model.batch_size = global_batch
    exp.model.compute_dtype = "float32"
    exp.model.dim_cnn_proj = 16
    exp.model.rnn_state_size = 8
    model = registry.create_model("gaze_grcn77", exp.model)

    mesh = make_mesh(data_parallel=4 * nproc, model_parallel=1)
    state, tx = create_train_state(model, exp.optimizer,
                                   jax.random.PRNGKey(0))
    state = place_state(state, mesh)
    step = make_sharded_train_step(model, tx, mesh, use_flip=False,
                                   donate=False)

    # deterministic GLOBAL batch; every process materializes it identically
    # and feeds only its own slice
    data = synthetic.make_clip_windows(global_batch, t, seed=0,
                                       gazemap_hw=(7, 7))
    full = data.next_batch(global_batch)
    sl = host_local_slice(global_batch)
    local = {k: np.asarray(v)[sl] for k, v in full.items()
             if k != "clipnames"}
    batch = global_batch_from_host_local(local, mesh)

    rng = jax.random.PRNGKey(1)
    n_steps = int(os.environ.get("RGP_MULTIHOST_STEPS", "3"))
    for i in range(n_steps):
        state, metrics = step(state, batch, rng)
        loss = float(jax.device_get(metrics["loss"]))
        print(f"STEP {i} {loss:.8f}", flush=True)


if __name__ == "__main__":
    main()
