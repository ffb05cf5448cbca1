"""Serving: AOT bundles (jax.export / StableHLO), micro-batching, HTTP server."""

from .batcher import DynamicBatcher
from .server import GazeServer, server_from_bundle
from .export import (
    ServingBundle,
    export_fused_predict,
    export_predict,
    export_stream_step,
    flatten_params,
    load_bundle,
    save_bundle,
    unflatten_params,
)

__all__ = [
    "DynamicBatcher",
    "GazeServer",
    "server_from_bundle",
    "ServingBundle",
    "export_predict",
    "export_fused_predict",
    "export_stream_step",
    "save_bundle",
    "load_bundle",
    "flatten_params",
    "unflatten_params",
]
