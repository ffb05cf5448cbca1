"""Profiling hooks.

The reference has no tracing beyond wall-clock per-step logs (SURVEY.md
section 5). This wires `jax.profiler`:

  * `trace(log_dir)` — context manager capturing a TensorBoard-viewable
    device trace
  * `annotate(name)` — TraceAnnotation for labelling train-loop phases
  * `profile_steps(...)` — capture exactly N train steps inside a trace
"""

from __future__ import annotations

import contextlib
from typing import Callable, Iterator

import jax

from ..utils import log


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    log.info("capturing jax profiler trace into %s", log_dir)
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def profile_steps(step_fn: Callable, inputs, n_steps: int,
                  log_dir: str) -> None:
    """Run `step_fn(*inputs)` n_steps times under a trace (outputs must be
    blocked by the caller's step function or fetched here)."""
    with trace(log_dir):
        out = None
        for i in range(n_steps):
            with annotate(f"step_{i}"):
                out = step_fn(*inputs)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
            else x, out)
