"""Streaming (chunked) inference with carried recurrent state.

The reference processes long videos as independent SEQ_LEN=42 windows,
restarting the recurrence from zero for every chunk
(`/root/reference/crc_input_data_seq.py:383-420`, zero_state at
`models/gaze_grcn.py:262`) — temporal context is lost at chunk boundaries.
This module adds the capability SURVEY.md section 5 calls out as the
natural TPU extension: carry the ConvGRU state across chunks, so videos of
unbounded length stream through a fixed-shape jitted step with full
temporal context and O(chunk) memory.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.cells import ConvGRU
from .common import apply_c3d_projection, apply_decoder, compute_dtype_of


def init_stream_state(batch: int, cfg: ModelConfig) -> jax.Array:
    return ConvGRU.zero_state(batch, (7, 7), cfg.rnn_state_size)


def grcn_stream_step(params: dict, state: jax.Array, c3d_chunk: jax.Array,
                     cfg: ModelConfig) -> tuple[jax.Array, jax.Array]:
    """One chunk: ([B,7,7,U] state, [B,Tc,1024,7,7]) ->
    (new state, [B,Tc,49,49] maps). Jit with static chunk length."""
    from ..ops import pallas as pallas_ops

    cdt = compute_dtype_of(cfg)
    b, tc = c3d_chunk.shape[:2]
    embedded = apply_c3d_projection(params["c3d_proj"], c3d_chunk,
                                    keep_prob=1.0, rng=None, train=False,
                                    compute_dtype=cdt)
    xs = jnp.transpose(embedded, (1, 0, 2, 3, 4))
    if cfg.use_pallas and pallas_ops.supported():
        final_h, ys = pallas_ops.convgru_scan(params["cell"], xs, state,
                                              compute_dtype=cdt)
    else:
        final_h, ys = ConvGRU.scan(params["cell"], xs, state,
                                   compute_dtype=cdt)

    folded = jnp.transpose(ys, (1, 0, 2, 3, 4)).reshape(
        b * tc, 7, 7, cfg.rnn_state_size)
    maps = apply_decoder(params["decoder"], folded, keep_prob=1.0, rng=None,
                         train=False, compute_dtype=cdt)
    return final_h, maps.reshape(b, tc, 49, 49)


# step functions memoized on the cfg fields they actually read, so
# repeated make_*_fn calls (e.g. cli/extract_map's per-clip loop via
# stream_video) reuse one jitted function and its compile cache instead
# of tracing+compiling a fresh program per clip. Keep the key in sync
# with the fields grcn_stream_step / lstm_stream_step consume.
_STREAM_FN_CACHE: dict = {}


def make_stream_fn(cfg: ModelConfig):
    """Returns jitted `step(params, state, c3d_chunk) -> (state, maps)`."""
    key = ("grcn", cfg.rnn_state_size, cfg.use_pallas, compute_dtype_of(cfg))
    fn = _STREAM_FN_CACHE.get(key)
    if fn is None:
        fn = jax.jit(lambda p, s, c: grcn_stream_step(p, s, c, cfg))
        _STREAM_FN_CACHE[key] = fn
    return fn


def make_lstm_stream_fn(cfg: ModelConfig):
    """Returns jitted `step(params, (c, h), c3d_chunk) -> (state, maps)`."""
    key = ("lstm", cfg.rnn_state_size, compute_dtype_of(cfg))
    fn = _STREAM_FN_CACHE.get(key)
    if fn is None:
        fn = jax.jit(lambda p, s, c: lstm_stream_step(p, s, c, cfg))
        _STREAM_FN_CACHE[key] = fn
    return fn


# ------------------------------------------------------------ ConvLSTM

def init_lstm_stream_state(batch: int, cfg: ModelConfig):
    from ..ops.cells import ConvLSTM

    return ConvLSTM.zero_state(batch, (7, 7), cfg.rnn_state_size)


def lstm_stream_step(params: dict, state, c3d_chunk: jax.Array,
                     cfg: ModelConfig):
    """gaze_lstm chunked step with carried (c, h) cell state."""
    from ..ops.cells import ConvLSTM

    cdt = compute_dtype_of(cfg)
    b, tc = c3d_chunk.shape[:2]
    embedded = apply_c3d_projection(params["c3d_proj"], c3d_chunk,
                                    keep_prob=1.0, rng=None, train=False,
                                    compute_dtype=cdt)
    xs = jnp.transpose(embedded, (1, 0, 2, 3, 4))
    carry, ys = ConvLSTM.scan(params["cell"], xs, state, compute_dtype=cdt)

    folded = jnp.transpose(ys, (1, 0, 2, 3, 4)).reshape(
        b * tc, 7, 7, cfg.rnn_state_size)
    maps = apply_decoder(params["decoder"], folded, keep_prob=1.0, rng=None,
                         train=False, compute_dtype=cdt)
    return carry, maps.reshape(b, tc, 49, 49)


def stream_video(params: dict, c3d_features, cfg: ModelConfig,
                 chunk_len: int = 42,
                 state: Optional[jax.Array] = None) -> Iterator:
    """Iterate (state-carrying) over a long feature stream [T, 1024, 7, 7];
    yields [Tc, 49, 49] map chunks. The tail chunk is zero-padded to keep
    the jitted shape static, and trimmed before yielding."""
    import numpy as np

    step = make_stream_fn(cfg)
    if state is None:
        state = init_stream_state(1, cfg)
    t_total = len(c3d_features)
    for start in range(0, t_total, chunk_len):
        chunk = np.asarray(c3d_features[start:start + chunk_len])
        valid = len(chunk)
        if valid < chunk_len:
            pad = np.zeros((chunk_len - valid,) + chunk.shape[1:],
                           chunk.dtype)
            chunk = np.concatenate([chunk, pad])
        state, maps = step(params, state, chunk[None])
        yield np.asarray(maps[0, :valid])
