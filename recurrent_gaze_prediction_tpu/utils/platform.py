"""Honor the JAX_PLATFORMS environment variable.

On hosts where a sitecustomize registers an out-of-tree TPU backend at
interpreter start (this container's axon relay), setting
`JAX_PLATFORMS=cpu` in the environment is NOT enough — the registered
backend wins unless `jax.config.update("jax_platforms", ...)` runs
in-process before the first device query (tests/conftest.py documents
the same requirement). Every CLI entry point calls
`honor_jax_platforms_env()` first so the documented
`JAX_PLATFORMS=cpu python -m ...cli.train_gaze` recipe actually runs on
CPU.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """Re-apply JAX_PLATFORMS from the environment via jax.config.

    No-op when the variable is unset or the backend is already
    initialized (jax raises then; the process keeps whatever platform it
    already has).
    """
    platforms = os.environ.get("JAX_PLATFORMS")
    if not platforms:
        return
    import jax

    try:
        jax.config.update("jax_platforms", platforms)
    except RuntimeError:
        pass  # backends already initialized; too late to switch
