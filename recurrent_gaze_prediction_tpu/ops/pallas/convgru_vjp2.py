"""Custom VJP for the fused ConvGRU, v2 — decomposed backward.

The v1 backward (`convgru_vjp.py`) put everything in one kernel (gate
recompute + 2 transposed convs + 2 weight-grad contractions per step);
Mosaic compiles it for tens of minutes at production sizes. v2 keeps ONLY
the inherently sequential piece in Pallas and gives XLA the rest:

  stage 1 (XLA, batched over T): recompute u_t, r_t, c_t from the stored
      hidden states — two big [T*B] convs, embarrassingly parallel.
  stage 2 (Pallas, reverse-time grid): propagate the state cotangent
      dh_{t-1} = dh_t.u + (drh).r + conv_T(dzr, U_zr), emitting per-step
      gate cotangents dzr=[du|dr] and da. Two transposed 3x3 convs per
      step, nothing else.
  stage 3 (XLA, batched over T): weight gradients as single contractions
      over all steps: dU_zr = sum_t patches(h_{t-1})^T dzr_t,
      dU = sum_t patches(r.h)^T da_t, and dwx = [du|dr|da].

Gradient parity with jax.grad of the scan is tested in
tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..layers import conv2d
from .convgru import convgru_scan_pallas
from .convgru_vjp import _conv3x3_transpose


def _patches(x: jax.Array) -> jax.Array:
    """[N, H, W, C] -> [N, H, W, 9, C] of 3x3 SAME neighborhoods."""
    n, h, w, c = x.shape
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [padded[:, dy:dy + h, dx:dx + w, :]
            for dy in range(3) for dx in range(3)]
    return jnp.stack(cols, axis=3)


def _kernel_grad(x_tb: jax.Array, g_tb: jax.Array) -> jax.Array:
    """sum_t patches(x_t)^T g_t -> [3, 3, Cin, Cout], one einsum."""
    t, b, h, w, cin = x_tb.shape
    cout = g_tb.shape[-1]
    p = _patches(x_tb.reshape(t * b, h, w, cin))      # [N,H,W,9,Cin]
    p = p.reshape(t * b * h * w, 9 * cin)
    g = g_tb.reshape(t * b * h * w, cout)
    grad = jnp.dot(p.T, g, preferred_element_type=jnp.float32)
    return grad.reshape(3, 3, cin, cout)


def _dh_bwd_kernel(u_ref, r_ref, c_ref, hprev_ref, g_ref, uzr_ref, uc_ref,
                   dzr_ref, da_ref, dh0_ref, dh_scratch, *, units: int,
                   t_total: int):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        dh_scratch[...] = jnp.zeros_like(dh_scratch)

    u = u_ref[0]
    r = r_ref[0]
    c = c_ref[0]
    h_prev = hprev_ref[0]
    dh_new = g_ref[0] + dh_scratch[...]

    dc = dh_new * (1.0 - u)
    du_pre = dh_new * (h_prev - c) * u * (1.0 - u)
    da = dc * (1.0 - c * c)

    drh = _conv3x3_transpose(da, uc_ref[...])
    dr_pre = drh * h_prev * r * (1.0 - r)
    dzr = jnp.concatenate([du_pre, dr_pre], axis=-1)

    dh_prev = (dh_new * u + drh * r
               + _conv3x3_transpose(dzr, uzr_ref[...]))

    dzr_ref[0] = dzr
    da_ref[0] = da
    dh_scratch[...] = dh_prev

    @pl.when(step == t_total - 1)
    def _():
        dh0_ref[...] = dh_prev


@functools.partial(jax.jit, static_argnames=("interpret",))
def _dh_bwd_pallas(u_tb, r_tb, c_tb, hprev, g, uzr, uc,
                   interpret: bool = False):
    t, b, h, w, units = u_tb.shape
    rev = lambda i: (t - 1 - i, 0, 0, 0, 0)  # noqa: E731
    kernel = functools.partial(_dh_bwd_kernel, units=units, t_total=t)
    block = lambda c: pl.BlockSpec((1, b, h, w, c), rev,  # noqa: E731
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            block(units), block(units), block(units), block(units),
            block(units),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # U_zr
            pl.BlockSpec(memory_space=pltpu.VMEM),   # U_c
        ],
        out_specs=(
            block(2 * units),                        # dzr
            block(units),                            # da
            pl.BlockSpec(memory_space=pltpu.VMEM),   # dh0
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, b, h, w, 2 * units), jnp.float32),
            jax.ShapeDtypeStruct((t, b, h, w, units), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w, units), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((b, h, w, units), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(u_tb, r_tb, c_tb, hprev, g, uzr.astype(jnp.float32),
      uc.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def convgru_fused(uzr, uc, wx_tb, interpret, h0):
    params = {"U_z": uzr[..., :uc.shape[-1]],
              "U_r": uzr[..., uc.shape[-1]:], "U": uc}
    return convgru_scan_pallas(params, wx_tb, h0, interpret=interpret)


def _fwd(uzr, uc, wx_tb, interpret, h0):
    ys = convgru_fused(uzr, uc, wx_tb, interpret, h0)
    return ys, (uzr, uc, wx_tb, h0, ys)


def _bwd(interpret, residuals, g):
    uzr, uc, wx_tb, h0, ys = residuals
    units = uc.shape[-1]
    t, b = wx_tb.shape[:2]
    hprev = jnp.concatenate([h0[None].astype(jnp.float32), ys[:-1]], axis=0)
    wx = wx_tb.astype(jnp.float32)

    # stage 1: batched gate recompute (XLA)
    uh = conv2d(hprev.reshape(t * b, *hprev.shape[2:]), uzr)
    uh = uh.reshape(t, b, *hprev.shape[2:-1], 2 * units)
    u = jax.nn.sigmoid(wx[..., :units] + uh[..., :units])
    r = jax.nn.sigmoid(wx[..., units:2 * units] + uh[..., units:])
    rh = r * hprev
    a = wx[..., 2 * units:] + conv2d(
        rh.reshape(t * b, *rh.shape[2:]), uc).reshape(u.shape)
    c = jnp.tanh(a)

    # stage 2: sequential cotangent propagation (Pallas)
    dzr, da, dh0 = _dh_bwd_pallas(u, r, c, hprev, g.astype(jnp.float32),
                                  uzr, uc, interpret=interpret)

    # stage 3: batched weight/input grads (XLA)
    duzr = _kernel_grad(hprev, dzr)
    duc = _kernel_grad(rh, da)
    dwx = jnp.concatenate([dzr, da], axis=-1)
    return (duzr.astype(uzr.dtype), duc.astype(uc.dtype),
            dwx.astype(wx_tb.dtype), dh0.astype(h0.dtype))


convgru_fused.defvjp(_fwd, _bwd)


def convgru_scan_trainable_v2(params: dict, x_tbhwc: jax.Array,
                              h0: jax.Array, compute_dtype=jnp.bfloat16,
                              interpret: bool = False):
    """Drop-in for ConvGRU.scan: Pallas forward + decomposed backward."""
    from ..cells import ConvGRU

    fused = ConvGRU.fuse(params)
    t, b = x_tbhwc.shape[:2]
    wx_all = conv2d(x_tbhwc.reshape(t * b, *x_tbhwc.shape[2:]),
                    fused["Wx_zrc"], compute_dtype=compute_dtype,
                    out_dtype=compute_dtype)
    wx_all = wx_all.reshape(t, b, *wx_all.shape[1:])
    ys = convgru_fused(fused["Uh_zr"], fused["U_c"], wx_all, interpret,
                       h0.astype(jnp.float32))
    return ys[-1], ys
