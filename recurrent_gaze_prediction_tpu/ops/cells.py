"""Recurrent cells: ConvGRU (GRU-RCN), ConvLSTM (peephole), flat GRU.

TPU-native redesign of the reference cells:
  * `GRU_RCN_Cell` (Ballas et al., arXiv:1511.06432) — 6 separate 3x3 convs,
    no biases (`/root/reference/models/gaze_grcn.py:48-146`). Here the six
    convs are fused into THREE (input-side z|r|candidate in one conv,
    state-side z|r in one conv, candidate state-side after the reset gate),
    which keeps the MXU busy with larger contractions. Parameters remain
    stored per-gate (W_z, U_z, ...) for checkpoint parity; `fuse()` builds the
    concatenated kernels ONCE outside `lax.scan` so the concat is not redone
    per timestep.
  * `LSTM_RCN_Cell` — ConvLSTM with elementwise peephole weights W_ci/W_cf/
    W_co of shape [H, W, units] (`models/gaze_lstm.py:48-148`). NOTE: the
    reference has a latent bug — its candidate path convolves h with W_hi
    instead of W_hc (`models/gaze_lstm.py:123-126`) leaving W_hc unused. We
    implement the *intended* ConvLSTM (candidate uses W_hc). Like the
    reference, the output gate peeps at the OLD cell state
    (`models/gaze_lstm.py:127-130`), a deviation from Shi et al. kept for
    behavioral parity.
  * Flat `GRUCell` with TF semantics: gate bias init 1.0, orthogonal kernels
    (`models/gaze_rnn.py:314-343`), state size 7*7*32 + 7*7 = 1617.

Every cell exposes:
  init(key, ...) -> params          (per-gate named leaves)
  fuse(params)   -> fused params    (concatenated kernels; call outside scan)
  step(fused, carry, x) -> (carry, y)
and a `scan` helper running the step over time-major inputs with
`jax.lax.scan` (replacing the reference's unrolled Python loop over T,
`models/gaze_grcn.py:269-288`).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from . import initializers as init
from .layers import conv2d, linear


# --------------------------------------------------------------------------
# ConvGRU (GRU-RCN)
# --------------------------------------------------------------------------

class ConvGRU:
    """Functional ConvGRU. Gate equations (reference `gaze_grcn.py:108-129`):

        u = sigmoid(conv(x, W_z) + conv(h, U_z))
        r = sigmoid(conv(x, W_r) + conv(h, U_r))
        c = tanh(conv(x, W) + conv(r * h, U))
        h' = u * h + (1 - u) * c
    """

    @staticmethod
    def init(key: jax.Array, dim_feature: int, num_units: int,
             kernel: tuple[int, int] = (3, 3), stddev: float = 1e-4) -> dict:
        kh, kw = kernel
        keys = jax.random.split(key, 6)
        shape_w = (kh, kw, dim_feature, num_units)
        shape_u = (kh, kw, num_units, num_units)
        return {
            "W_z": init.truncated_normal(keys[0], shape_w, stddev),
            "U_z": init.truncated_normal(keys[1], shape_u, stddev),
            "W_r": init.truncated_normal(keys[2], shape_w, stddev),
            "U_r": init.truncated_normal(keys[3], shape_u, stddev),
            "W": init.truncated_normal(keys[4], shape_w, stddev),
            "U": init.truncated_normal(keys[5], shape_u, stddev),
        }

    @staticmethod
    def fuse(params: dict) -> dict:
        """Concatenate per-gate kernels along the output-channel axis.
        Call once outside `lax.scan` so weights stay loop-invariant."""
        return {
            "Wx_zrc": jnp.concatenate(
                [params["W_z"], params["W_r"], params["W"]], axis=-1),
            "Uh_zr": jnp.concatenate([params["U_z"], params["U_r"]], axis=-1),
            "U_c": params["U"],
        }

    @staticmethod
    def step_precomputed(fused: dict, h: jax.Array, wx: jax.Array,
                         compute_dtype=None) -> tuple[jax.Array, jax.Array]:
        """One step given the precomputed input-side conv `wx` (3U channels).
        Only the two state-dependent convs remain on the sequential path."""
        units = fused["U_c"].shape[-1]
        uh = conv2d(h, fused["Uh_zr"], compute_dtype=compute_dtype)
        wz, wr, wc = jnp.split(wx, [units, 2 * units], axis=-1)
        uz, ur = jnp.split(uh, [units], axis=-1)
        u = jax.nn.sigmoid(wz + uz)
        r = jax.nn.sigmoid(wr + ur)
        c = jnp.tanh(wc + conv2d(r * h, fused["U_c"],
                                 compute_dtype=compute_dtype))
        new_h = u * h + (1.0 - u) * c
        return new_h, new_h

    @staticmethod
    def step(fused: dict, h: jax.Array, x: jax.Array,
             compute_dtype=None) -> tuple[jax.Array, jax.Array]:
        wx = conv2d(x, fused["Wx_zrc"], compute_dtype=compute_dtype)
        return ConvGRU.step_precomputed(fused, h, wx,
                                        compute_dtype=compute_dtype)

    @staticmethod
    def zero_state(batch: int, spatial: tuple[int, int], num_units: int,
                   dtype=jnp.float32) -> jax.Array:
        return jnp.zeros((batch, spatial[0], spatial[1], num_units), dtype)

    @staticmethod
    def scan(params: dict, x_tbhwc: jax.Array, h0: jax.Array,
             compute_dtype=None, remat: bool = False
             ) -> tuple[jax.Array, jax.Array]:
        """Run over time-major inputs [T, B, H, W, C] -> outputs [T, B, H, W, U].

        The input-side conv (the expensive one — dim_feature up to 512
        channels) is hoisted out of the scan and computed for all T frames
        as ONE batched conv; only the state convs stay sequential.

        `remat=True` rematerializes each step in the backward pass
        (jax.checkpoint), trading ~1 extra step-forward of FLOPs for not
        storing per-step gate activations — the memory lever for long T.
        """
        fused = ConvGRU.fuse(params)
        t, b = x_tbhwc.shape[:2]
        wx_all = conv2d(x_tbhwc.reshape(t * b, *x_tbhwc.shape[2:]),
                        fused["Wx_zrc"], compute_dtype=compute_dtype,
                        out_dtype=compute_dtype)
        wx_all = wx_all.reshape(t, b, *wx_all.shape[1:])

        def body(h, wx):
            return ConvGRU.step_precomputed(fused, h, wx,
                                            compute_dtype=compute_dtype)

        if remat:
            body = jax.checkpoint(body)
        final_h, ys = jax.lax.scan(body, h0, wx_all)
        return final_h, ys


# --------------------------------------------------------------------------
# ConvLSTM (peephole)
# --------------------------------------------------------------------------

class ConvLSTM:
    """Functional peephole ConvLSTM (reference `gaze_lstm.py:103-133`):

        i  = sigmoid(conv(x, W_xi) + conv(h, W_hi) + W_ci * c)
        f  = sigmoid(conv(x, W_xf) + conv(h, W_hf) + W_cf * c)
        c' = f * c + i * tanh(conv(x, W_xc) + conv(h, W_hc))
        o  = sigmoid(conv(x, W_xo) + conv(h, W_ho) + W_co * c)   # OLD c
        h' = tanh(c') * o
    """

    GATES = ("i", "f", "c", "o")

    @staticmethod
    def init(key: jax.Array, dim_feature: int, num_units: int,
             spatial: tuple[int, int] = (7, 7),
             kernel: tuple[int, int] = (3, 3), stddev: float = 1e-4) -> dict:
        kh, kw = kernel
        keys = jax.random.split(key, 11)
        shape_x = (kh, kw, dim_feature, num_units)
        shape_h = (kh, kw, num_units, num_units)
        shape_peep = (spatial[0], spatial[1], num_units)
        return {
            "W_xi": init.truncated_normal(keys[0], shape_x, stddev),
            "W_hi": init.truncated_normal(keys[1], shape_h, stddev),
            "W_ci": init.truncated_normal(keys[2], shape_peep, stddev),
            "W_xf": init.truncated_normal(keys[3], shape_x, stddev),
            "W_hf": init.truncated_normal(keys[4], shape_h, stddev),
            "W_cf": init.truncated_normal(keys[5], shape_peep, stddev),
            "W_xc": init.truncated_normal(keys[6], shape_x, stddev),
            "W_hc": init.truncated_normal(keys[7], shape_h, stddev),
            "W_xo": init.truncated_normal(keys[8], shape_x, stddev),
            "W_ho": init.truncated_normal(keys[9], shape_h, stddev),
            "W_co": init.truncated_normal(keys[10], shape_peep, stddev),
        }

    @staticmethod
    def fuse(params: dict) -> dict:
        return {
            "Wx": jnp.concatenate(
                [params[f"W_x{g}"] for g in ConvLSTM.GATES], axis=-1),
            "Wh": jnp.concatenate(
                [params[f"W_h{g}"] for g in ConvLSTM.GATES], axis=-1),
            "W_ci": params["W_ci"],
            "W_cf": params["W_cf"],
            "W_co": params["W_co"],
        }

    @staticmethod
    def step_precomputed(fused: dict, carry: tuple[jax.Array, jax.Array],
                         gx: jax.Array, compute_dtype=None
                         ) -> tuple[tuple[jax.Array, jax.Array], jax.Array]:
        c, h = carry
        units = fused["W_ci"].shape[-1]
        gh = conv2d(h, fused["Wh"], compute_dtype=compute_dtype)
        g = gx + gh
        gi, gf, gc, go = jnp.split(g, [units, 2 * units, 3 * units], axis=-1)
        i = jax.nn.sigmoid(gi + fused["W_ci"] * c)
        f = jax.nn.sigmoid(gf + fused["W_cf"] * c)
        new_c = f * c + i * jnp.tanh(gc)
        o = jax.nn.sigmoid(go + fused["W_co"] * c)  # old c, like the reference
        new_h = jnp.tanh(new_c) * o
        return (new_c, new_h), new_h

    @staticmethod
    def step(fused: dict, carry: tuple[jax.Array, jax.Array], x: jax.Array,
             compute_dtype=None) -> tuple[tuple[jax.Array, jax.Array], jax.Array]:
        gx = conv2d(x, fused["Wx"], compute_dtype=compute_dtype)
        return ConvLSTM.step_precomputed(fused, carry, gx,
                                         compute_dtype=compute_dtype)

    @staticmethod
    def zero_state(batch: int, spatial: tuple[int, int], num_units: int,
                   dtype=jnp.float32) -> tuple[jax.Array, jax.Array]:
        z = jnp.zeros((batch, spatial[0], spatial[1], num_units), dtype)
        return (z, z)

    @staticmethod
    def scan(params: dict, x_tbhwc: jax.Array,
             carry0: tuple[jax.Array, jax.Array],
             compute_dtype=None, remat: bool = False
             ) -> tuple[tuple[jax.Array, jax.Array], jax.Array]:
        """Input-side gate convs hoisted out of the scan (see ConvGRU.scan).
        `remat=True` rematerializes each step in the backward pass."""
        fused = ConvLSTM.fuse(params)
        t, b = x_tbhwc.shape[:2]
        gx_all = conv2d(x_tbhwc.reshape(t * b, *x_tbhwc.shape[2:]),
                        fused["Wx"], compute_dtype=compute_dtype,
                        out_dtype=compute_dtype)
        gx_all = gx_all.reshape(t, b, *gx_all.shape[1:])

        def body(carry, gx):
            return ConvLSTM.step_precomputed(fused, carry, gx,
                                             compute_dtype=compute_dtype)

        if remat:
            body = jax.checkpoint(body)
        return jax.lax.scan(body, carry0, gx_all)


# --------------------------------------------------------------------------
# Flat GRU (TF GRUCell semantics)
# --------------------------------------------------------------------------

class FlatGRU:
    """TF `tf.nn.rnn_cell.GRUCell` semantics (reference `gaze_rnn.py:315`):

        [r, u] = sigmoid([x, h] @ W_gates + b_gates)   # b_gates init 1.0
        c      = tanh([x, r * h] @ W_cand + b_cand)
        h'     = u * h + (1 - u) * c
    """

    @staticmethod
    def init(key: jax.Array, dim_input: int, num_units: int) -> dict:
        k1, k2 = jax.random.split(key)
        return {
            "gates_kernel": init.orthogonal(
                k1, (dim_input + num_units, 2 * num_units)),
            "gates_bias": init.constant(1.0, (2 * num_units,)),
            "candidate_kernel": init.orthogonal(
                k2, (dim_input + num_units, num_units)),
            "candidate_bias": init.zeros((num_units,)),
        }

    @staticmethod
    def fuse(params: dict) -> dict:
        return params

    @staticmethod
    def step(params: dict, h: jax.Array, x: jax.Array,
             compute_dtype=None) -> tuple[jax.Array, jax.Array]:
        units = h.shape[-1]
        xh = jnp.concatenate([x, h], axis=-1)
        gates = jax.nn.sigmoid(
            linear(xh, params["gates_kernel"], params["gates_bias"],
                   compute_dtype=compute_dtype))
        r, u = jnp.split(gates, [units], axis=-1)
        xrh = jnp.concatenate([x, r * h], axis=-1)
        c = jnp.tanh(linear(xrh, params["candidate_kernel"],
                            params["candidate_bias"],
                            compute_dtype=compute_dtype))
        new_h = u * h + (1.0 - u) * c
        return new_h, new_h

    @staticmethod
    def zero_state(batch: int, num_units: int, dtype=jnp.float32) -> jax.Array:
        return jnp.zeros((batch, num_units), dtype)

    @staticmethod
    def scan(params: dict, x_tbc: jax.Array, h0: jax.Array,
             compute_dtype=None) -> tuple[jax.Array, jax.Array]:
        """Input-side matmuls hoisted: the gate/candidate kernels split into
        input rows (x @ W[:D]) computed for all T at once, and state rows
        (h @ W[D:]) on the sequential path."""
        t, b, d = x_tbc.shape
        units = h0.shape[-1]
        gk_x, gk_h = params["gates_kernel"][:d], params["gates_kernel"][d:]
        ck_x, ck_h = (params["candidate_kernel"][:d],
                      params["candidate_kernel"][d:])

        flat_x = x_tbc.reshape(t * b, d)
        gx_all = linear(flat_x, gk_x, params["gates_bias"],
                        compute_dtype=compute_dtype).reshape(t, b, 2 * units)
        cx_all = linear(flat_x, ck_x, params["candidate_bias"],
                        compute_dtype=compute_dtype).reshape(t, b, units)

        def body(h, inputs):
            gx, cx = inputs
            gates = jax.nn.sigmoid(
                gx + linear(h, gk_h, compute_dtype=compute_dtype))
            r, u = jnp.split(gates, [units], axis=-1)
            c = jnp.tanh(cx + linear(r * h, ck_h,
                                     compute_dtype=compute_dtype))
            new_h = u * h + (1.0 - u) * c
            return new_h, new_h

        return jax.lax.scan(body, h0, (gx_all, cx_all))
