"""Fused ConvGRU sequence kernel (Pallas / Mosaic TPU).

Runs the ENTIRE recurrence in one kernel: the TPU grid iterates over T
sequentially (grid steps execute in order on TPU), the hidden state lives
in a VMEM scratch buffer across steps, and each step consumes a
pre-computed input-side gate block Wx[t] streamed from HBM. This removes
the per-step HBM round-trip of the hidden state and the XLA while-loop
overhead that `jax.lax.scan` pays.

The 3x3 SAME convolution on the 7x7 grid is expressed as 9 shifted
matmuls ([B*49, U] @ [U, out]) so the MXU does all the work — there is no
native conv primitive inside Pallas kernels.

Numerics match `ops.cells.ConvGRU` (same gate equations,
`/root/reference/models/gaze_grcn.py:108-129`); parity is tested in
tests/test_pallas.py via interpret mode on CPU and compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_same(x: jax.Array, kernel: jax.Array,
                  acc_dtype=jnp.float32) -> jax.Array:
    """[B, H, W, Cin] (x) [3, 3, Cin, Cout] -> [B, H, W, Cout] via 9 shifted
    matmuls; zero padding at the borders."""
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((b * h * w, cout), acc_dtype)
    for dy in range(3):
        for dx in range(3):
            patch = padded[:, dy:dy + h, dx:dx + w, :].reshape(b * h * w, cin)
            out = out + jnp.dot(patch, kernel[dy, dx],
                                preferred_element_type=acc_dtype)
    return out.reshape(b, h, w, cout)


def _convgru_seq_kernel(wx_ref, uzr_ref, uc_ref, h0_ref, out_ref, h_scratch,
                        *, units: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scratch[...] = h0_ref[...]

    h = h_scratch[...]
    wx = wx_ref[0]  # [B, H, W, 3U] block for this step

    uh = _conv3x3_same(h, uzr_ref[...])                 # [B, H, W, 2U]
    wz = wx[..., :units].astype(jnp.float32)
    wr = wx[..., units:2 * units].astype(jnp.float32)
    wc = wx[..., 2 * units:].astype(jnp.float32)
    u = jax.nn.sigmoid(wz + uh[..., :units])
    r = jax.nn.sigmoid(wr + uh[..., units:])
    c = jnp.tanh(wc + _conv3x3_same((r * h).astype(h.dtype), uc_ref[...]))
    new_h = u * h + (1.0 - u) * c

    h_scratch[...] = new_h
    out_ref[0] = new_h


@functools.partial(jax.jit, static_argnames=("interpret",))
def convgru_scan_pallas(params: dict, wx_tb: jax.Array, h0: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """Fused recurrence over precomputed input-side gates.

    Args:
      params: ConvGRU params (per-gate kernels; only U_z/U_r/U are used).
      wx_tb: [T, B, H, W, 3U] precomputed `conv(x, W_zrc)` blocks.
      h0: [B, H, W, U] initial state.
    Returns [T, B, H, W, U] hidden states.
    """
    t, b, h, w, three_u = wx_tb.shape
    units = three_u // 3
    uzr = jnp.concatenate([params["U_z"], params["U_r"]], axis=-1)
    uc = params["U"]

    kernel = functools.partial(_convgru_seq_kernel, units=units)
    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, h, w, three_u), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # U_zr
            pl.BlockSpec(memory_space=pltpu.VMEM),   # U_c
            pl.BlockSpec(memory_space=pltpu.VMEM),   # h0
        ],
        out_specs=pl.BlockSpec((1, b, h, w, units),
                               lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, b, h, w, units), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, h, w, units), jnp.float32)],
        interpret=interpret,
        # h0 cast here: the scratch is f32 and a bf16->f32 ref store is
        # rejected at Pallas lowering (callers previously had to pre-cast)
    )(wx_tb, uzr.astype(wx_tb.dtype), uc.astype(wx_tb.dtype),
      h0.astype(jnp.float32))


def convgru_scan(params: dict, x_tbhwc: jax.Array, h0: jax.Array,
                 compute_dtype=jnp.bfloat16,
                 interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """Drop-in replacement for `ConvGRU.scan` using the fused kernel:
    the input-side conv is computed batched (XLA), the recurrence runs in
    Pallas. Returns (final_h, ys) like the reference scan."""
    from ..cells import ConvGRU
    from ..layers import conv2d

    fused = ConvGRU.fuse(params)
    t, b = x_tbhwc.shape[:2]
    wx_all = conv2d(x_tbhwc.reshape(t * b, *x_tbhwc.shape[2:]),
                    fused["Wx_zrc"], compute_dtype=compute_dtype,
                    out_dtype=compute_dtype)
    wx_all = wx_all.reshape(t, b, *wx_all.shape[1:])
    ys = convgru_scan_pallas(params, wx_all, h0.astype(jnp.float32),
                             interpret=interpret)
    return ys[-1], ys
