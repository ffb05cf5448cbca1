"""Pytree utilities: parameter counting, dtype casting, flattened summaries."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = Any  # a pytree of arrays


def param_count(params: Params) -> int:
    """Total number of scalar parameters (reference: `models/base.py:300-304`)."""
    leaves = jax.tree_util.tree_leaves(params)
    return int(sum(np.prod(leaf.shape) for leaf in leaves))


def param_bytes(params: Params) -> int:
    leaves = jax.tree_util.tree_leaves(params)
    return int(sum(np.prod(leaf.shape) * leaf.dtype.itemsize for leaf in leaves))


def cast_floating(params: Params, dtype) -> Params:
    """Cast floating-point leaves to `dtype`; leave integer leaves untouched."""

    def _cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, params)


def describe(params: Params, prefix: str = "") -> str:
    """Human-readable listing of every leaf: path, shape, dtype, count."""
    lines = []
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0
    for path, leaf in flat:
        name = prefix + jax.tree_util.keystr(path)
        n = int(np.prod(leaf.shape))
        total += n
        lines.append(f"  {name:60s} {str(leaf.shape):20s} {str(leaf.dtype):10s} {n}")
    lines.append(f"  TOTAL: {total} parameters")
    return "\n".join(lines)
