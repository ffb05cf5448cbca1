"""gaze_grcn — the RGP model: ConvGRU (GRU-RCN) over C3D maps + deconv decoder.

TPU-native rebuild of `GazePredictionGRCN.create_gazeprediction_network`
(`/root/reference/models/gaze_grcn.py:173-376`):

    c3d [B,T,1024,7,7] -> transpose -> 1024->512 projection (+dropout)
      -> ConvGRU(128 units, 3x3, no biases) over T        [lax.scan]
      -> per-frame decoder (frozen BN -> deconv x3 -> 12->1 head)
      -> logits [B, T, 49, 49]

Also provides `gaze_grcn77` (`models/gaze_grcn77.py:100-218`): the same
ConvGRU trunk at 7x7 with a per-cell 128->1 linear head and NO upsampling.

TPU design: the time recurrence is a `lax.scan` with the fused-gate ConvGRU
(3 convs/step instead of 6); the decoder runs once over the folded [B*T]
batch instead of T separate per-step graphs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import initializers as init
from ..ops.cells import ConvGRU
from ..ops.layers import dropout, linear
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
        "cell": ConvGRU.init(k_cell, cfg.dim_cnn_proj, cfg.rnn_state_size),
        "decoder": init_decoder(k_dec, cfg.rnn_state_size,
                                with_batch_norm=True),
    }


def _run_convgru(cell_params: dict, xs: jax.Array, h0: jax.Array,
                 cfg: ModelConfig, cdt, train: bool) -> jax.Array:
    """ConvGRU over time: `lax.scan` by default; the fused Pallas kernel
    on TPU inference when cfg.use_pallas opts in.

    The default flipped round 5 on a re-measure: the round-1 numbers
    (kernel 5.2 ms vs scan 53 ms at T=42/B=16) predate an XLA upgrade in
    this image — today the scan runs the same recurrence in 2.24 ms vs
    the kernel's 4.07 (feature-fed predict 2.81 vs 4.66 ms/call; the
    fused raw-video pipeline is tower-dominated and neutral within
    0.5%). The kernel remains parity-gated bit-exact on hardware
    (ops/pallas/parity.py, bench `pallas_scan_corr`). Training always
    keeps the differentiable scan: the custom-VJP kernels
    (ops/pallas/convgru_vjp2.py) beat the scan 4x in isolation but lose
    inside the full train step, where XLA fuses the scan's backward with
    the surrounding gradients (19.7 vs 23.7 ms/step) — the custom call
    is a fusion barrier.
    """
    from ..ops import pallas as pallas_ops

    if cfg.use_pallas and not train and pallas_ops.supported():
        _, ys = pallas_ops.convgru_scan(cell_params, xs, h0,
                                        compute_dtype=cdt)
        return ys
    _, ys = ConvGRU.scan(cell_params, xs, h0, compute_dtype=cdt,
                         remat=cfg.remat_cells and train)
    return ys


def apply(params: dict, frames: jax.Array, c3d: jax.Array,
          cfg: ModelConfig, *, train: bool = False,
          rng: Optional[jax.Array] = None) -> jax.Array:
    del frames  # gaze_grcn uses only the C3D stream (gaze_grcn.py:269-283)
    cdt = compute_dtype_of(cfg)
    keep = cfg.dropout_keep_prob if train else 1.0
    r_proj, r_out = (jax.random.split(rng) if rng is not None else (None, None))

    b, t = c3d.shape[:2]
    embedded = apply_c3d_projection(params["c3d_proj"], c3d, keep_prob=keep,
                                    rng=r_proj, train=train,
                                    compute_dtype=cdt)  # [B,T,7,7,P]

    xs = jnp.transpose(embedded, (1, 0, 2, 3, 4))  # time-major [T,B,7,7,P]
    h0 = ConvGRU.zero_state(b, (7, 7), cfg.rnn_state_size)
    ys = _run_convgru(params["cell"], xs, h0, cfg, cdt, train)

    folded = jnp.transpose(ys, (1, 0, 2, 3, 4)).reshape(
        b * t, 7, 7, cfg.rnn_state_size)
    maps = apply_decoder(params["decoder"], folded, keep_prob=keep,
                         rng=r_out, train=train, compute_dtype=cdt)
    return maps.reshape(b, t, 49, 49)


# ---------------------------------------------------------------- 77 head

def init_params_77(key: jax.Array, cfg: ModelConfig) -> dict:
    k_proj, k_cell, kw, kb = jax.random.split(key, 4)
    return {
        "c3d_proj": init_c3d_projection(k_proj, cfg.dim_feature,
                                        cfg.dim_cnn_proj),
        "cell": ConvGRU.init(k_cell, cfg.dim_cnn_proj, cfg.rnn_state_size),
        "out_W": init.uniform_scale(kw, (cfg.rnn_state_size, 1), 0.1),
        "out_b": init.uniform_scale(kb, (1,), 0.1),
    }


def apply_77(params: dict, frames: jax.Array, c3d: jax.Array,
             cfg: ModelConfig, *, train: bool = False,
             rng: Optional[jax.Array] = None) -> jax.Array:
    """7x7 logits via per-cell FC head (`gaze_grcn77.py:183-212`)."""
    del frames
    cdt = compute_dtype_of(cfg)
    keep = cfg.dropout_keep_prob if train else 1.0
    r_proj, r_out = (jax.random.split(rng) if rng is not None else (None, None))

    b, t = c3d.shape[:2]
    embedded = apply_c3d_projection(params["c3d_proj"], c3d, keep_prob=keep,
                                    rng=r_proj, train=train, compute_dtype=cdt)
    xs = jnp.transpose(embedded, (1, 0, 2, 3, 4))
    h0 = ConvGRU.zero_state(b, (7, 7), cfg.rnn_state_size)
    ys = _run_convgru(params["cell"], xs, h0, cfg, cdt, train)

    folded = jnp.transpose(ys, (1, 0, 2, 3, 4)).reshape(-1, cfg.rnn_state_size)
    out = linear(folded, params["out_W"], params["out_b"], compute_dtype=cdt)
    out = dropout(out, keep, r_out, deterministic=not train)
    return out.reshape(b, t, 7, 7)


def build(cfg: ModelConfig) -> GazeModel:
    if (cfg.gazemap_height, cfg.gazemap_width) == (7, 7):
        return GazeModel(
            cfg=cfg,
            init_fn=lambda key: init_params_77(key, cfg),
            apply_fn=lambda p, f, c, train=False, rng=None: apply_77(
                p, f, c, cfg, train=train, rng=rng),
        )
    return GazeModel(
        cfg=cfg,
        init_fn=lambda key: init_params(key, cfg),
        apply_fn=lambda p, f, c, train=False, rng=None: apply(
            p, f, c, cfg, train=train, rng=rng),
    )
