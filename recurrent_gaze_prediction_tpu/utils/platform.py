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
    """Turn on JAX's persistent compilation cache for device backends.

    Cold compiles through this host's remote-compile relay take minutes;
    the cache cuts warm starts to seconds (bench.py measured). All
    non-CPU platforms (tpu, the axon relay, and the unset default that
    resolves to whatever accelerator backend is registered) share ONE
    directory, `~/.cache/jax_rgp` — they are the same chip reached by
    different invocation styles, and per-platform dirs caused redundant
    cold compiles (advisor r4). CPU is excluded: XLA:CPU AOT cache
    entries pin exact machine features and emit mismatch errors (risking
    SIGILL) even on near-identical hosts, and CPU compiles are fast.
    Honors JAX_COMPILATION_CACHE_DIR if the user set one.
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
        if platform == "cpu":
            return
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "jax_rgp")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:  # cache is an optimization; never block the CLI
        pass


def wait_for_device(max_wait_s: float = 1800.0,
                    probe_timeout_s: float = 90.0) -> bool:
    """Wait out a wedged TPU relay before touching the device.

    Killing a client mid-compile can wedge this host's remote-compile
    relay for 15-45 min (every new RPC hangs or returns
    FAILED_PRECONDITION; it self-heals). A program would otherwise hang
    on its first transfer with no output. Probe with a tiny computation
    in a SUBPROCESS (cleanly killable; an in-process hung RPC thread
    could not be) and retry until the device answers or the wait budget
    is spent — then return anyway, so a healthy backend is never delayed
    and a truly dead one fails exactly as before.

    Returns True if the probe succeeded, False if the budget ran out
    (callers may fall back to CPU on False).
    """
    import subprocess
    import sys
    import time

    probe = ("import jax, jax.numpy as jnp; "
             "print(float(jnp.ones((4, 4)).sum()))")
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, text=True,
                               timeout=probe_timeout_s)
            if r.returncode == 0 and "16.0" in r.stdout:
                if attempt > 1:
                    print(f"# device probe ok after {attempt} attempts",
                          file=sys.stderr)
                return True
            reason = (r.stderr or r.stdout).strip().splitlines()
            reason = reason[-1] if reason else f"rc={r.returncode}"
        except subprocess.TimeoutExpired:
            reason = f"probe hung >{probe_timeout_s:.0f}s"
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            print(f"# device probe never healed ({reason}); proceeding",
                  file=sys.stderr)
            return False
        print(f"# device wedged ({reason}); retrying, "
              f"{remaining:.0f}s of wait budget left", file=sys.stderr)
        time.sleep(min(30.0, max(remaining, 0.0)))
