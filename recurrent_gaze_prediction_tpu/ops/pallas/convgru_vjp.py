"""Custom VJP for the fused ConvGRU sequence: Pallas forward AND backward.

NOTE: superseded by `convgru_vjp2.py`. This monolithic backward kernel is
numerically correct but Mosaic compiles it for tens of minutes at
production sizes (B=16, U=128) because the whole gate recompute + two
transposed convs + two weight-grad contractions live in one kernel body.
v2 keeps only the sequential dh recursion in Pallas; prefer it.

Forward: `convgru.convgru_scan_pallas` (state in VMEM across the T grid).
Backward: a second Pallas kernel walking the grid in REVERSE time order,
carrying the hidden-state cotangent in VMEM and accumulating the U-kernel
gradients in VMEM scratch across all steps. Gate activations are
recomputed per step from the stored hidden states (checkpoint-free, like
the scan VJP would) — each backward step costs ~2 forward convs + 2
transposed convs, all expressed as shifted MXU matmuls.

Gradient equations (forward: u=sig(wz+Uz*h), r=sig(wr+Ur*h),
c=tanh(wc+U*(r.h)), h'=u.h+(1-u).c):

    dc      = dh' . (1-u)
    du_pre  = dh' . (h - c) . u . (1-u)
    da      = dc . (1 - c^2)
    drh     = conv_T(da, U)             dU  += patches(r.h)^T da
    dr_pre  = drh . h . r . (1-r)
    dwx     = [du_pre | dr_pre | da]
    dh      = dh'.u + drh.r + conv_T([du_pre|dr_pre], [Uz|Ur])
    dUzr    += patches(h)^T [du_pre|dr_pre]

Parity is tested against `jax.grad` of the lax.scan implementation
(tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .convgru import _conv3x3_same, convgru_scan_pallas


def _conv3x3_transpose(g: jax.Array, kernel: jax.Array,
                       acc_dtype=jnp.float32) -> jax.Array:
    """Gradient wrt the input of `_conv3x3_same`: correlate `g`
    [B,H,W,Cout] with `kernel` [3,3,Cin,Cout] -> [B,H,W,Cin].
    Equals a SAME conv with the spatially-flipped, in/out-swapped kernel;
    implemented as 9 shifted matmuls against kernel[dy,dx]^T."""
    b, h, w, cout = g.shape
    cin = kernel.shape[2]
    padded = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((b * h * w, cin), acc_dtype)
    for dy in range(3):
        for dx in range(3):
            # output position p receives kernel[dy,dx] contributions from
            # g at p + (1-dy, 1-dx)  == flipped shift
            patch = padded[:, 2 - dy:2 - dy + h, 2 - dx:2 - dx + w, :]
            patch = patch.reshape(b * h * w, cout)
            out = out + jnp.dot(patch, kernel[dy, dx].T,
                                preferred_element_type=acc_dtype)
    return out.reshape(b, h, w, cin)


def _conv3x3_kernel_grad(x: jax.Array, g: jax.Array,
                         acc_dtype=jnp.float32) -> jax.Array:
    """Gradient wrt the kernel of `_conv3x3_same`: [B,H,W,Cin] x
    [B,H,W,Cout] -> [3,3,Cin,Cout] via 9 patch contractions."""
    b, h, w, cin = x.shape
    cout = g.shape[-1]
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    gf = g.reshape(b * h * w, cout)
    rows = []
    for dy in range(3):
        cols = []
        for dx in range(3):
            patch = padded[:, dy:dy + h, dx:dx + w, :].reshape(b * h * w, cin)
            cols.append(jnp.dot(patch.T, gf,
                                preferred_element_type=acc_dtype))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)  # [3, 3, Cin, Cout]


def _convgru_bwd_kernel(wx_ref, hprev_ref, uzr_ref, uc_ref, g_ref,
                        dwx_ref, dh0_ref, duzr_ref, duc_ref,
                        dh_scratch, *, units: int, t_total: int):
    step = pl.program_id(0)          # 0 .. T-1, walking time backwards
    # block index maps already deliver the reversed-time slices

    @pl.when(step == 0)
    def _():
        dh_scratch[...] = jnp.zeros_like(dh_scratch)
        duzr_ref[...] = jnp.zeros_like(duzr_ref)
        duc_ref[...] = jnp.zeros_like(duc_ref)

    h_prev = hprev_ref[0]            # h_{t-1}
    wx = wx_ref[0].astype(jnp.float32)
    dh_new = g_ref[0].astype(jnp.float32) + dh_scratch[...]

    # recompute gates (checkpoint-free, exact)
    uh = _conv3x3_same(h_prev, uzr_ref[...])
    u = jax.nn.sigmoid(wx[..., :units] + uh[..., :units])
    r = jax.nn.sigmoid(wx[..., units:2 * units] + uh[..., units:])
    rh = r * h_prev
    c = jnp.tanh(wx[..., 2 * units:] + _conv3x3_same(rh, uc_ref[...]))

    dc = dh_new * (1.0 - u)
    du_pre = dh_new * (h_prev - c) * u * (1.0 - u)
    da = dc * (1.0 - c * c)

    drh = _conv3x3_transpose(da, uc_ref[...])
    duc_ref[...] += _conv3x3_kernel_grad(rh, da)

    dr_pre = drh * h_prev * r * (1.0 - r)
    dzr = jnp.concatenate([du_pre, dr_pre], axis=-1)
    duzr_ref[...] += _conv3x3_kernel_grad(h_prev, dzr)

    dh_prev = (dh_new * u + drh * r
               + _conv3x3_transpose(dzr, uzr_ref[...]))

    dwx_ref[0] = jnp.concatenate([du_pre, dr_pre, da], axis=-1)
    dh_scratch[...] = dh_prev

    @pl.when(step == t_total - 1)
    def _():
        dh0_ref[...] = dh_prev


@functools.partial(jax.jit, static_argnames=("interpret",))
def _convgru_bwd_pallas(uzr, uc, wx_tb, ys, h0, g, interpret: bool = False):
    t, b, h, w, three_u = wx_tb.shape
    units = three_u // 3
    # h_{t-1} stream: [h0, ys[:-1]]
    hprev = jnp.concatenate([h0[None], ys[:-1]], axis=0)

    rev = lambda i: (t - 1 - i, 0, 0, 0, 0)  # noqa: E731
    kernel = functools.partial(_convgru_bwd_kernel, units=units, t_total=t)
    dwx, dh0, duzr, duc = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, h, w, three_u), rev,
                         memory_space=pltpu.VMEM),          # wx
            pl.BlockSpec((1, b, h, w, units), rev,
                         memory_space=pltpu.VMEM),          # h_{t-1}
            pl.BlockSpec(memory_space=pltpu.VMEM),          # U_zr
            pl.BlockSpec(memory_space=pltpu.VMEM),          # U_c
            pl.BlockSpec((1, b, h, w, units), rev,
                         memory_space=pltpu.VMEM),          # g (dL/dys)
        ],
        out_specs=(
            pl.BlockSpec((1, b, h, w, three_u), rev,
                         memory_space=pltpu.VMEM),          # dwx
            pl.BlockSpec(memory_space=pltpu.VMEM),          # dh0
            pl.BlockSpec(memory_space=pltpu.VMEM),          # dU_zr
            pl.BlockSpec(memory_space=pltpu.VMEM),          # dU_c
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, b, h, w, three_u), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w, units), jnp.float32),
            jax.ShapeDtypeStruct((3, 3, units, 2 * units), jnp.float32),
            jax.ShapeDtypeStruct((3, 3, units, units), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((b, h, w, units), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # the backward body carries ~8 [B,7,7,U..3U] fp32 temporaries
            # plus double-buffered step blocks; the default 16M scoped vmem
            # is too small at B=16, U=128
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(wx_tb, hprev, uzr.astype(jnp.float32), uc.astype(jnp.float32),
      g)
    return dwx, dh0, duzr, duc


# ------------------------------------------------------------ custom vjp

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def convgru_scan_fused(uzr, uc, wx_tb, interpret, h0):
    """Differentiable fused recurrence. Args: fused state kernels
    U_zr [3,3,U,2U], U_c [3,3,U,U], precomputed wx [T,B,H,W,3U] and
    h0 [B,H,W,U]. Returns ys [T,B,H,W,U]."""
    params = {"U_z": uzr[..., :uc.shape[-1]],
              "U_r": uzr[..., uc.shape[-1]:], "U": uc}
    return convgru_scan_pallas(params, wx_tb, h0, interpret=interpret)


def _fwd(uzr, uc, wx_tb, interpret, h0):
    ys = convgru_scan_fused(uzr, uc, wx_tb, interpret, h0)
    return ys, (uzr, uc, wx_tb, h0, ys)


def _bwd(interpret, residuals, g):
    uzr, uc, wx_tb, h0, ys = residuals
    dwx, dh0, duzr, duc = _convgru_bwd_pallas(
        uzr, uc, wx_tb, ys, h0, g.astype(jnp.float32), interpret=interpret)
    return (duzr.astype(uzr.dtype), duc.astype(uc.dtype),
            dwx.astype(wx_tb.dtype), dh0.astype(h0.dtype))


convgru_scan_fused.defvjp(_fwd, _bwd)


def convgru_scan_trainable(params: dict, x_tbhwc: jax.Array, h0: jax.Array,
                           compute_dtype=jnp.bfloat16,
                           interpret: bool = False):
    """Drop-in for ConvGRU.scan with fused Pallas forward AND backward.
    The input-side conv stays in XLA (its VJP is native)."""
    from ..cells import ConvGRU
    from ..layers import conv2d

    fused = ConvGRU.fuse(params)
    t, b = x_tbhwc.shape[:2]
    wx_all = conv2d(x_tbhwc.reshape(t * b, *x_tbhwc.shape[2:]),
                    fused["Wx_zrc"], compute_dtype=compute_dtype,
                    out_dtype=compute_dtype)
    wx_all = wx_all.reshape(t, b, *wx_all.shape[1:])
    ys = convgru_scan_fused(fused["Uh_zr"], fused["U_c"], wx_all, interpret,
                            h0.astype(jnp.float32))
    return ys[-1], ys
