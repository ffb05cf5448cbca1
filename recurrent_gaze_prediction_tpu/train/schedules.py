"""Learning-rate schedules.

The reference uses `tf.train.exponential_decay(lr, global_step,
decay_steps=500, decay_rate=0.80, staircase=True)`
(`/root/reference/models/gaze_rnn.py:436-444`) — and has an acknowledged bug
where a plain-Variable LR is reset to the initial value on checkpoint restore
(`models/base.py:221-231`). Schedules here are pure functions of the step, so
resume is always correct (SURVEY.md section 7).
"""

from __future__ import annotations

import jax.numpy as jnp


def exponential_decay(initial_learning_rate: float, decay_rate: float,
                      decay_steps: int, staircase: bool = True):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        p = step / decay_steps
        if staircase:
            p = jnp.floor(p)
        return initial_learning_rate * jnp.power(decay_rate, p)

    return schedule


def constant(initial_learning_rate: float):
    def schedule(step):
        del step
        return jnp.asarray(initial_learning_rate, jnp.float32)

    return schedule
