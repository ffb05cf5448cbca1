"""Device mesh + sharding helpers.

The reference has NO distributed machinery at all — parallelism is joblib
process pools and manually launched shards (SURVEY.md section 2.7). This
module is the TPU-native replacement: a named `jax.sharding.Mesh` with a
"data" axis (batch parallelism over ICI) and an optional "model" axis for
sharding the wide FC / projection weights.

Everything downstream composes through `NamedSharding`: jit partitions the
program, XLA inserts the collectives (psum of grads over "data",
all-gather/reduce-scatter for "model"-sharded matmuls).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ShardingConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data_parallel: int = -1, model_parallel: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh of shape (data, model). data_parallel=-1 uses every device left
    after the model axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model_parallel <= 0:
        model_parallel = 1
    if data_parallel == -1:
        data_parallel = n // model_parallel
    need = data_parallel * model_parallel
    if need > n:
        raise ValueError(
            f"mesh {data_parallel}x{model_parallel} needs {need} devices, "
            f"have {n}")
    grid = np.asarray(devices[:need]).reshape(data_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def mesh_from_config(cfg: ShardingConfig,
                     devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    return make_mesh(cfg.data_parallel, cfg.model_parallel, devices)


def batch_spec() -> P:
    """Batch arrays: sharded on the leading (batch) dim over "data"."""
    return P(DATA_AXIS)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place batch arrays on the mesh, batch-dim sharded over "data".

    Values that are already `jax.Array`s (e.g. produced by a device
    prefetcher that placed them with the target sharding) must NOT take
    the `np.asarray` path — that would block on a device->host gather of
    the whole batch every step and nullify prefetch overlap. They pass
    through untouched when already laid out right, or reshard
    device-to-device otherwise; only host values are staged via NumPy.
    """
    sharding = NamedSharding(mesh, batch_spec())
    out = {}
    for k, v in batch.items():
        if k == "clipnames":
            continue
        if isinstance(v, jax.Array):
            if v.sharding.is_equivalent_to(sharding, v.ndim):
                out[k] = v
            else:  # device-to-device reshard, no host round-trip
                out[k] = jax.device_put(v, sharding)
        else:
            out[k] = jax.device_put(np.asarray(v), sharding)
    return out


# --------------------------------------------------------- param shardings

# Wide matmul weights worth sharding over the model axis: the ShallowNet FC
# stack (3872x4802, 2401x4802 — the largest tensors in the framework,
# SURVEY.md section 5 "distributed communication backend") and the C3D
# 1024->512 projection / cascade FC heads.
_MODEL_SHARDED_LEAVES = ("fc1_w", "fc2_w", "proj_c3d_W", "proj_out_W")


def param_spec(path: tuple, leaf: Any, model_parallel: bool,
               model_axis_size: int = 2) -> P:
    """Sharding rule per parameter leaf: last dim of wide FC kernels over
    "model" when it divides evenly by the ACTUAL model-axis size;
    everything else replicated."""
    if not model_parallel:
        return P()
    name = str(path[-1].key) if hasattr(path[-1], "key") else str(path[-1])
    if name in _MODEL_SHARDED_LEAVES and np.ndim(leaf) >= 2:
        ncols = leaf.shape[-1]
        return P(*([None] * (np.ndim(leaf) - 1)), MODEL_AXIS) \
            if ncols % model_axis_size == 0 else P()
    return P()


def params_shardings(params: Any, mesh: Mesh,
                     model_parallel: Optional[bool] = None) -> Any:
    """NamedSharding pytree matching `params`."""
    if model_parallel is None:
        model_parallel = mesh.shape[MODEL_AXIS] > 1

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shardings = [
        NamedSharding(mesh, param_spec(path, leaf, model_parallel,
                                       mesh.shape[MODEL_AXIS]))
        for path, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, shardings)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_params(params: Any, mesh: Mesh,
                 model_parallel: Optional[bool] = None) -> Any:
    return jax.device_put(params,
                          params_shardings(params, mesh, model_parallel))


def make_hybrid_mesh(dcn_data_parallel: int, ici_data_parallel: int = -1,
                     model_parallel: int = 1) -> Mesh:
    """Multi-slice mesh: data parallelism across slices rides DCN, data/
    model parallelism within a slice rides ICI (the "collectives ride ICI,
    not DCN" layout from the scaling-book recipe).

    The mesh shape is (dcn_data * ici_data, model) with DCN as the
    outermost (slowest-varying) factor of the data axis, so gradient
    all-reduces decompose into intra-slice ICI reductions + one small
    cross-slice DCN reduction. Falls back to a flat mesh when the runtime
    exposes no slice topology (single-slice or CPU)."""
    from jax.experimental import mesh_utils

    devices = jax.devices()
    if ici_data_parallel == -1:
        ici_data_parallel = len(devices) // max(dcn_data_parallel, 1) \
            // max(model_parallel, 1)
    try:
        grid = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(ici_data_parallel, model_parallel),
            dcn_mesh_shape=(dcn_data_parallel, 1),
            devices=devices)
    except Exception:  # single slice / no slice_index attributes
        return make_mesh(dcn_data_parallel * ici_data_parallel,
                         model_parallel, devices)
    grid = grid.reshape(dcn_data_parallel * ici_data_parallel,
                        model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


# ------------------------------------------------------- multi-host input

def host_local_slice(global_batch: int,
                     process_index: Optional[int] = None,
                     process_count: Optional[int] = None) -> slice:
    """The slice of a global batch this host should load (multi-host input
    sharding, SURVEY.md section 7 step 7). Each host feeds its shard;
    `jax.make_array_from_process_local_data` assembles the global array."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if global_batch % pc != 0:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{pc} processes")
    per_host = global_batch // pc
    return slice(pi * per_host, (pi + 1) * per_host)


def global_batch_from_host_local(batch: dict, mesh: Mesh) -> dict:
    """Assemble host-local batch shards into global sharded arrays."""
    sharding = NamedSharding(mesh, batch_spec())
    out = {}
    for key, value in batch.items():
        if key == "clipnames":
            continue
        arr = np.asarray(value)
        global_shape = (arr.shape[0] * jax.process_count(),) + arr.shape[1:]
        out[key] = jax.make_array_from_process_local_data(
            sharding, arr, global_shape)
    return out
