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


def enable_compile_cache(min_compile_secs: float = 1.0) -> None:
    """Turn on JAX's persistent compilation cache, scoped PER PLATFORM.

    Cold compiles through this host's remote-compile relay take minutes;
    the cache cuts warm starts to seconds (bench.py measured). Scoping
    the directory by backend platform matters: reusing one cache across
    CPU and TPU emits machine-feature-mismatch errors (see
    __graft_entry__.py, which excludes its CPU dryrun child for the same
    reason). Honors JAX_COMPILATION_CACHE_DIR if the user set one.
    """
    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user already configured it
    try:
        # read the platform from the environment rather than
        # jax.default_backend(): querying the backend would INITIALIZE it
        # at CLI startup (before arg parsing / --help), which is slow on
        # remote-relay hosts and grabs the single-tenant TPU
        platform = (os.environ.get("JAX_PLATFORMS") or
                    "").split(",")[0].strip()
        if not platform:
            return  # unknown without initializing the backend; skip
        if platform == "cpu":
            # XLA:CPU AOT cache entries pin exact machine features and
            # log mismatch errors (risking SIGILL) even on near-identical
            # hosts; CPU compiles are fast — skip the cache there.
            return
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "jax_rgp_" + platform)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:  # cache is an optimization; never block the CLI
        pass
