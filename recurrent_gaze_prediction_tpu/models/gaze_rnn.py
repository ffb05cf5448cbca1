"""gaze_rnn — flat-GRU gaze model (+ its 7x7 variant gaze_rnn77).

Rebuild of `GazePredictionGRU.create_gazeprediction_network`
(`/root/reference/models/gaze_rnn.py:211-360`):

    frames  -> ShallowNet per frame -> [B,T,49,49] saliency branch
               (only feeds image summaries in the reference; the params
               exist and are frozen during gaze training)
    c3d     -> 1024->32 projection -> flatten 7*7*32
            -> flat GRUCell, state 7*7*32 + 7*7 = 1617 (gaze_rnn.py:245-246)
            -> per-step FC state -> GH*GW logits

gaze_rnn77 (`models/gaze_rnn77.py`) is the same network with GH=GW=7,
T=35, l2 loss; the ShallowNet branch is avg-pooled 49->7 in the reference
(`gaze_rnn.py:262-269`) before being (still) unused downstream.

TPU design: ShallowNet runs once over the folded B*T frame batch; the GRU
runs under `lax.scan`; the output projection is one [T*B, S] x [S, GH*GW]
matmul after the scan.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import initializers as init
from ..ops.cells import FlatGRU
from ..ops.layers import linear
from . import shallownet
from .common import (
    GazeModel,
    apply_c3d_projection,
    compute_dtype_of,
    init_c3d_projection,
)

DIM_CNN_PROJ = 32  # gaze_rnn.py:241


def rnn_state_size(cfg: ModelConfig) -> int:
    # 7*7*32 (c3d embedding) + 7*7 (saliency map slot) — gaze_rnn.py:245-246
    return 7 * 7 * DIM_CNN_PROJ + 7 * 7


def init_params(key: jax.Array, cfg: ModelConfig) -> dict:
    k_sal, k_proj, k_cell, k_out = jax.random.split(key, 4)
    state = rnn_state_size(cfg)
    gh, gw = cfg.gazemap_height, cfg.gazemap_width
    return {
        "shallownet": shallownet.init_params(k_sal),
        "c3d_proj": init_c3d_projection(k_proj, cfg.dim_feature, DIM_CNN_PROJ),
        "cell": FlatGRU.init(k_cell, 7 * 7 * DIM_CNN_PROJ, state),
        "proj_out_W": init.uniform_scale(k_out, (state, gh * gw), 0.1),
        "proj_out_b": init.zeros((gh * gw,)),
    }


def apply(params: dict, frames: jax.Array, c3d: jax.Array,
          cfg: ModelConfig, *, train: bool = False,
          rng: Optional[jax.Array] = None,
          net: Optional[dict] = None) -> jax.Array:
    cdt = compute_dtype_of(cfg)
    keep = cfg.dropout_keep_prob if train else 1.0
    r_proj = rng
    gh, gw = cfg.gazemap_height, cfg.gazemap_width
    b, t = frames.shape[:2]

    # ShallowNet frame-saliency branch (kept for parity + visualization;
    # the reference concat into the RNN input is commented out,
    # gaze_rnn.py:330-336).
    frm_sal = shallownet.apply(
        params["shallownet"], frames.reshape(-1, *frames.shape[2:]),
        train=False, compute_dtype=cdt).reshape(b, t, 49, 49)
    if net is not None:
        net["frm_sal"] = frm_sal
        if (gh, gw) == (7, 7):
            # the 77 regime downsamples the saliency branch to 7x7 with a
            # 7x7/stride-7 VALID avg pool (gaze_rnn.py:262-269); kept as
            # an introspection surface (the RNN concat of frm_sal is
            # commented out in the reference, so it feeds nothing)
            net["frm_sal_77"] = frm_sal.reshape(
                b, t, 7, 7, 7, 7).mean(axis=(3, 5))

    embedded = apply_c3d_projection(params["c3d_proj"], c3d, keep_prob=keep,
                                    rng=r_proj, train=train, compute_dtype=cdt)
    xs = embedded.reshape(b, t, -1)               # [B, T, 7*7*32]
    xs = jnp.transpose(xs, (1, 0, 2))             # time-major

    h0 = FlatGRU.zero_state(b, rnn_state_size(cfg))
    _, ys = FlatGRU.scan(params["cell"], xs, h0, compute_dtype=cdt)  # [T,B,S]

    out = linear(ys.reshape(t * b, -1), params["proj_out_W"],
                 params["proj_out_b"], compute_dtype=cdt)
    out = out.reshape(t, b, gh, gw)
    return jnp.transpose(out, (1, 0, 2, 3))


def build(cfg: ModelConfig) -> GazeModel:
    return GazeModel(
        cfg=cfg,
        init_fn=lambda key: init_params(key, cfg),
        apply_fn=lambda p, f, c, train=False, rng=None: apply(
            p, f, c, cfg, train=train, rng=rng),
        has_shallownet=True,
    )
