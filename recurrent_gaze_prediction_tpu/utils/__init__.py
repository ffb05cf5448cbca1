from .logging import log, mkdir_p, override
from .platform import (
    enable_compile_cache,
    honor_jax_platforms_env,
    wait_for_device,
)
from .tree import cast_floating, describe, param_bytes, param_count

__all__ = [
    "log",
    "mkdir_p",
    "override",
    "param_count",
    "param_bytes",
    "cast_floating",
    "describe",
]
