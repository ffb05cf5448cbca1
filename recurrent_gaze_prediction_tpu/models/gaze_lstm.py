"""gaze_lstm — ConvLSTM (peephole) variant of the RGP model.

Rebuild of `GazePredictionLSTM` (`/root/reference/models/gaze_lstm.py`):
identical trunk/decoder to gaze_grcn but the recurrence is the peephole
ConvLSTM with elementwise W_ci/W_cf/W_co weights and (c, h) state
(`gaze_lstm.py:48-148`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.cells import ConvLSTM
from .common import (
    GazeModel,
    apply_c3d_projection,
    apply_decoder,
    compute_dtype_of,
    init_c3d_projection,
    init_decoder,
)


def init_params(key: jax.Array, cfg: ModelConfig) -> dict:
    k_proj, k_cell, k_dec = jax.random.split(key, 3)
    return {
        "c3d_proj": init_c3d_projection(k_proj, cfg.dim_feature,
                                        cfg.dim_cnn_proj),
        "cell": ConvLSTM.init(k_cell, cfg.dim_cnn_proj, cfg.rnn_state_size,
                              spatial=(7, 7)),
        "decoder": init_decoder(k_dec, cfg.rnn_state_size,
                                with_batch_norm=True),
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
    xs = jnp.transpose(embedded, (1, 0, 2, 3, 4))
    carry0 = ConvLSTM.zero_state(b, (7, 7), cfg.rnn_state_size)

    from ..ops import pallas as pallas_ops

    if cfg.use_pallas and not train and pallas_ops.supported():
        _, ys = pallas_ops.convlstm_scan(params["cell"], xs, carry0,
                                         compute_dtype=cdt)
    else:
        _, ys = ConvLSTM.scan(params["cell"], xs, carry0, compute_dtype=cdt,
                              remat=cfg.remat_cells and train)

    folded = jnp.transpose(ys, (1, 0, 2, 3, 4)).reshape(
        b * t, 7, 7, cfg.rnn_state_size)
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
