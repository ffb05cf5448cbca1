"""gaze_grcn_cascade — two-level coarse-to-fine ConvGRU cascade.

Rebuild of `GazePredictionGRCN` in
`/root/reference/models/gaze_grcn_cascade.py:188-481`:

    c3d -> 1024->512 projection
        -> bottom ConvGRU (256 units, 3x3) at 7x7            [lax.scan]
        -> single deconv 11x11 stride 7 SAME -> [49,49,64]   (batched B*T)
        -> top ConvGRU (3 units, 5x5) at 49x49               [lax.scan]
        -> per-frame head: fc 4802 + relu + dropout + maxout
                          -> fc 4802 + relu + maxout -> [49,49]

plus a ShallowNet frame-saliency branch whose output the reference computes
but never feeds forward (the concat is commented out,
`gaze_grcn_cascade.py:370-377`); kept for parameter parity.

NOTE: the reference constructs the top cell with dim_feature =
upsampling_output_channel + 1 = 65 (`gaze_grcn_cascade.py:344-351`) while
actually feeding it the 64-channel upsampled maps — a latent shape bug that
would fail at graph build. We use the intended 64.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import initializers as init
from ..ops.cells import ConvGRU
from ..ops.layers import conv2d_transpose, dropout, linear, maxout2
from . import shallownet
from .common import (
    GazeModel,
    apply_c3d_projection,
    compute_dtype_of,
    init_c3d_projection,
)

BOTTOM_UNITS = 256       # gaze_grcn_cascade.py:229
UP_CHANNELS = 64         # gaze_grcn_cascade.py:318
TOP_UNITS = 3            # gaze_grcn_cascade.py:346
FC_WIDTH = 4802


def init_params(key: jax.Array, cfg: ModelConfig) -> dict:
    ks = jax.random.split(key, 7)
    return {
        "shallownet": shallownet.init_params(ks[0]),
        "c3d_proj": init_c3d_projection(ks[1], cfg.dim_feature,
                                        cfg.dim_cnn_proj),
        "bottom_cell": ConvGRU.init(ks[2], cfg.dim_cnn_proj, BOTTOM_UNITS),
        "up_w": init.xavier_uniform(ks[3], (11, 11, BOTTOM_UNITS,
                                            UP_CHANNELS)),
        "top_cell": ConvGRU.init(ks[4], UP_CHANNELS, TOP_UNITS,
                                 kernel=(5, 5)),
        "fc1_w": init.xavier_uniform(ks[5], (49 * 49 * TOP_UNITS, FC_WIDTH)),
        "fc1_b": init.zeros((FC_WIDTH,)),
        "fc2_w": init.xavier_uniform(ks[6], (FC_WIDTH // 2, FC_WIDTH)),
        "fc2_b": init.zeros((FC_WIDTH,)),
    }


def apply(params: dict, frames: jax.Array, c3d: jax.Array,
          cfg: ModelConfig, *, train: bool = False,
          rng: Optional[jax.Array] = None,
          net: Optional[dict] = None) -> jax.Array:
    cdt = compute_dtype_of(cfg)
    keep = cfg.dropout_keep_prob if train else 1.0
    r_head = rng
    b, t = c3d.shape[:2]

    # ShallowNet branch (visualization-only in the reference)
    if net is not None:
        net["frm_sal"] = shallownet.apply(
            params["shallownet"], frames.reshape(-1, *frames.shape[2:]),
            train=False, compute_dtype=cdt).reshape(b, t, 49, 49)

    embedded = apply_c3d_projection(params["c3d_proj"], c3d, keep_prob=1.0,
                                    rng=None, train=False, compute_dtype=cdt)

    # bottom recurrence at 7x7
    xs = jnp.transpose(embedded, (1, 0, 2, 3, 4))
    h0 = ConvGRU.zero_state(b, (7, 7), BOTTOM_UNITS)
    _, ys = ConvGRU.scan(params["bottom_cell"], xs, h0, compute_dtype=cdt,
                         remat=cfg.remat_cells and train)

    # upsample every step at once: [T*B, 7, 7, 256] -> [T*B, 49, 49, 64]
    folded = ys.reshape(t * b, 7, 7, BOTTOM_UNITS)
    upsampled = conv2d_transpose(folded, params["up_w"], stride=7,
                                 padding="SAME", compute_dtype=cdt)
    up_tb = upsampled.reshape(t, b, 49, 49, UP_CHANNELS)

    # top recurrence at 49x49
    g0 = ConvGRU.zero_state(b, (49, 49), TOP_UNITS)
    # the 49x49-resolution top cell is where remat matters most: its
    # per-step activations are 49x larger than the bottom cell's
    _, gs = ConvGRU.scan(params["top_cell"], up_tb, g0, compute_dtype=cdt,
                         remat=cfg.remat_cells and train)

    # per-frame maxout head, batched over T*B
    flat = gs.reshape(t * b, -1)
    x = jax.nn.relu(linear(flat, params["fc1_w"], params["fc1_b"],
                           compute_dtype=cdt))
    x = dropout(x, keep, r_head, deterministic=not train)
    x = maxout2(x)
    x = jax.nn.relu(linear(x, params["fc2_w"], params["fc2_b"],
                           compute_dtype=cdt))
    x = maxout2(x)
    out = x.reshape(t, b, 49, 49)
    return jnp.transpose(out, (1, 0, 2, 3))


def build(cfg: ModelConfig) -> GazeModel:
    return GazeModel(
        cfg=cfg,
        init_fn=lambda key: init_params(key, cfg),
        apply_fn=lambda p, f, c, train=False, rng=None: apply(
            p, f, c, cfg, train=train, rng=rng),
        has_shallownet=True,
    )
