"""Fused ConvLSTM sequence kernel (Pallas / Mosaic TPU).

Same architecture as the ConvGRU kernel (`convgru.py`): the TPU grid
iterates T sequentially, the (c, h) cell state lives in VMEM scratch
buffers across steps, and the input-side gate block gx[t] =
conv(x_t, [W_xi|W_xf|W_xc|W_xo]) is precomputed batched and streamed from
HBM. Gate equations follow `ops.cells.ConvLSTM` (reference
`/root/reference/models/gaze_lstm.py:103-133`, old-c output peephole).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .convgru import _conv3x3_same


def _convlstm_seq_kernel(gx_ref, wh_ref, wci_ref, wcf_ref, wco_ref,
                         c0_ref, h0_ref, out_ref, c_scratch, h_scratch,
                         *, units: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        c_scratch[...] = c0_ref[...]
        h_scratch[...] = h0_ref[...]

    c = c_scratch[...]
    h = h_scratch[...]
    gx = gx_ref[0]  # [B, H, W, 4U]

    gh = _conv3x3_same(h, wh_ref[...])
    g = gx.astype(jnp.float32) + gh
    gi = g[..., :units]
    gf = g[..., units:2 * units]
    gc = g[..., 2 * units:3 * units]
    go = g[..., 3 * units:]

    i = jax.nn.sigmoid(gi + wci_ref[...] * c)
    f = jax.nn.sigmoid(gf + wcf_ref[...] * c)
    new_c = f * c + i * jnp.tanh(gc)
    o = jax.nn.sigmoid(go + wco_ref[...] * c)  # old c, like the reference
    new_h = jnp.tanh(new_c) * o

    c_scratch[...] = new_c
    h_scratch[...] = new_h
    out_ref[0] = new_h


@functools.partial(jax.jit, static_argnames=("interpret",))
def convlstm_scan_pallas(params: dict, gx_tb: jax.Array, c0: jax.Array,
                         h0: jax.Array, interpret: bool = False) -> jax.Array:
    """[T, B, H, W, 4U] precomputed input gates -> [T, B, H, W, U] outputs."""
    t, b, h, w, four_u = gx_tb.shape
    units = four_u // 4
    wh = jnp.concatenate([params["W_hi"], params["W_hf"], params["W_hc"],
                          params["W_ho"]], axis=-1)

    kernel = functools.partial(_convlstm_seq_kernel, units=units)
    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, h, w, four_u), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # Wh
            pl.BlockSpec(memory_space=pltpu.VMEM),   # W_ci
            pl.BlockSpec(memory_space=pltpu.VMEM),   # W_cf
            pl.BlockSpec(memory_space=pltpu.VMEM),   # W_co
            pl.BlockSpec(memory_space=pltpu.VMEM),   # c0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # h0
        ],
        out_specs=pl.BlockSpec((1, b, h, w, units),
                               lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, b, h, w, units), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, h, w, units), jnp.float32),
                        pltpu.VMEM((b, h, w, units), jnp.float32)],
        interpret=interpret,
    )(gx_tb, wh.astype(gx_tb.dtype),
      params["W_ci"].astype(jnp.float32),
      params["W_cf"].astype(jnp.float32),
      params["W_co"].astype(jnp.float32),
      c0.astype(jnp.float32), h0.astype(jnp.float32))


def convlstm_scan(params: dict, x_tbhwc: jax.Array,
                  carry0: tuple[jax.Array, jax.Array],
                  compute_dtype=jnp.bfloat16,
                  interpret: bool = False):
    """Drop-in for `ConvLSTM.scan`: batched input-side conv + fused kernel.
    Returns ((final_c_is_not_tracked, final_h), ys) — the final cell state
    is internal to the kernel; use the streaming API if you need it."""
    from ..cells import ConvLSTM
    from ..layers import conv2d

    fused = ConvLSTM.fuse(params)
    t, b = x_tbhwc.shape[:2]
    gx_all = conv2d(x_tbhwc.reshape(t * b, *x_tbhwc.shape[2:]), fused["Wx"],
                    compute_dtype=compute_dtype, out_dtype=compute_dtype)
    gx_all = gx_all.reshape(t, b, *gx_all.shape[1:])
    c0, h0 = carry0
    ys = convlstm_scan_pallas(params, gx_all, c0, h0, interpret=interpret)
    return (None, ys[-1]), ys
