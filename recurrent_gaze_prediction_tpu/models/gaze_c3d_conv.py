"""gaze_c3d_conv — non-recurrent ablation: C3D projection straight into the
deconv decoder (no cell, no batch norm).

Rebuild of `GazePredictionConv.create_gazeprediction_network`
(`/root/reference/models/gaze_c3d_conv.py:141-217`): every frame is decoded
independently, so the whole model is one batched pass over B*T frames.
"""

from __future__ import annotations

from typing import Optional

import jax

from ..config import ModelConfig
from .common import (
    GazeModel,
    apply_c3d_projection,
    apply_decoder,
    compute_dtype_of,
    init_c3d_projection,
    init_decoder,
)


def init_params(key: jax.Array, cfg: ModelConfig) -> dict:
    k_proj, k_dec = jax.random.split(key)
    return {
        "c3d_proj": init_c3d_projection(k_proj, cfg.dim_feature,
                                        cfg.dim_cnn_proj),
        # decoder input = dim_cnn_proj (512), no BN (gaze_c3d_conv.py:153-179)
        "decoder": init_decoder(k_dec, cfg.dim_cnn_proj,
                                with_batch_norm=False),
    }


def apply(params: dict, frames: jax.Array, c3d: jax.Array,
          cfg: ModelConfig, *, train: bool = False,
          rng: Optional[jax.Array] = None) -> jax.Array:
    del frames
    cdt = compute_dtype_of(cfg)
    keep = cfg.dropout_keep_prob if train else 1.0
    r_proj, r_out = (jax.random.split(rng) if rng is not None else (None, None))

    b, t = c3d.shape[:2]
    embedded = apply_c3d_projection(params["c3d_proj"], c3d, keep_prob=keep,
                                    rng=r_proj, train=train, compute_dtype=cdt)
    folded = embedded.reshape(b * t, 7, 7, cfg.dim_cnn_proj)
    maps = apply_decoder(params["decoder"], folded, keep_prob=keep,
                         rng=r_out, train=train, compute_dtype=cdt)
    return maps.reshape(b, t, 49, 49)


def build(cfg: ModelConfig) -> GazeModel:
    return GazeModel(
        cfg=cfg,
        init_fn=lambda key: init_params(key, cfg),
        apply_fn=lambda p, f, c, train=False, rng=None: apply(
            p, f, c, cfg, train=train, rng=rng),
    )
