"""Shared building blocks for the gaze model zoo.

Covers everything the reference repeats across `models/gaze_*.py`:
  * C3D input handling: [B,T,1024,7,7] -> [B,T,7,7,1024] transpose + linear
    projection with uniform(-0.1,0.1) init + dropout
    (`/root/reference/models/gaze_grcn.py:223-254`)
  * the 3-deconv upsampling decoder 7->23->49->49 with a 12->1 output head
    (`models/gaze_grcn.py:292-366`)
  * sequence losses summed over T and divided by B*T
    (`models/gaze_rnn.py:363-408`)
  * the `GazeModel` harness: a functional bundle (init/apply/loss/predict)
    that replaces the reference's `ModelBase`-derived classes.

TPU design notes: anything framewise (projection, decoder, ShallowNet) is
computed with T folded into the batch axis — one big MXU-friendly
contraction instead of the reference's 42 unrolled per-step graphs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import ModelConfig
from ..ops import initializers as init
from ..ops.layers import (conv2d_transpose, dropout, frozen_batch_norm,
                          linear)
from ..ops.normalize import (
    kl_divergence_2d,
    normalize_probability_map,
    softmax_2d,
    softmax_cross_entropy_2d,
)

Params = Any


def compute_dtype_of(cfg: ModelConfig):
    return jnp.dtype(cfg.compute_dtype)


# ------------------------------------------------------------------ C3D in

def c3d_to_nhwc(c3d: jax.Array) -> jax.Array:
    """[B, T, 1024, 7, 7] -> [B, T, 7, 7, 1024] (`gaze_grcn.py:225-231`)."""
    return jnp.transpose(c3d, (0, 1, 3, 4, 2))


def init_c3d_projection(key: jax.Array, dim_feature: int,
                        dim_proj: int) -> dict:
    kw, kb = jax.random.split(key)
    return {
        "proj_c3d_W": init.uniform_scale(kw, (dim_feature, dim_proj), 0.1),
        "proj_c3d_b": init.uniform_scale(kb, (dim_proj,), 0.1),
    }


def apply_c3d_projection(params: dict, c3d: jax.Array, *,
                         keep_prob: float, rng: Optional[jax.Array],
                         train: bool, compute_dtype=None) -> jax.Array:
    """[B,T,1024,7,7] -> [B,T,7,7,dim_proj] with dropout
    (`gaze_grcn.py:239-254`). One [B*T*49, 1024] x [1024, proj] matmul.

    TPU layout note: the NCHW->NHWC move is done by casting to the compute
    dtype FIRST, then swapping the (C, HW) axes, then the matmul — fp32
    relayouts with a 49-wide minor dim are ~1000x slower than bf16 on TPU,
    and the naive 5-D transpose of the raw [B,T,1024,7,7] block is worse.
    """
    b, t, c = c3d.shape[:3]
    xb = c3d.reshape(b * t, c, 49)
    if compute_dtype is not None:
        xb = xb.astype(compute_dtype)
    flat = jnp.swapaxes(xb, 1, 2).reshape(-1, c)  # [B*T*49, C]
    proj = linear(flat, params["proj_c3d_W"], params["proj_c3d_b"],
                  compute_dtype=compute_dtype, out_dtype=compute_dtype)
    proj = dropout(proj, keep_prob, rng, deterministic=not train)
    return proj.reshape(b, t, 7, 7, -1)


# ----------------------------------------------------------------- decoder

def init_decoder(key: jax.Array, in_channels: int,
                 with_batch_norm: bool = True) -> dict:
    """3-deconv upsampling decoder params (`gaze_grcn.py:292-314`)."""
    ks = jax.random.split(key, 5)
    params = {
        "up1_w": init.xavier_uniform(ks[0], (5, 5, in_channels, 64)),
        "up2_w": init.xavier_uniform(ks[1], (5, 5, 64, 32)),
        "up3_w": init.xavier_uniform(ks[2], (7, 7, 32, 12)),
        "out_W": init.uniform_scale(ks[3], (12, 1), 0.1),
        "out_b": init.uniform_scale(ks[4], (1,), 0.1),
    }
    if with_batch_norm:
        params["bn_scale"] = jnp.ones((in_channels,))
        params["bn_offset"] = jnp.zeros((in_channels,))
    return params


def apply_decoder_stagewise(params: dict, x: jax.Array, *, keep_prob: float,
                            rng: Optional[jax.Array], train: bool,
                            compute_dtype=None) -> jax.Array:
    """The decoder as the reference literally wrote it: deconv 5x5/s3
    VALID -> 23, deconv 5x5/s2 VALID -> 49, deconv 7x7/s1 SAME, 12->1
    head (`gaze_grcn.py:318-366`). Kept as the numerical anchor for
    `apply_decoder` (the linearized form below); the up3/out_W fold is
    retained (round-2 win, bit-compatible)."""
    if "bn_scale" in params:
        x = frozen_batch_norm(x, params["bn_scale"], params["bn_offset"])
    x = conv2d_transpose(x, params["up1_w"], stride=3, padding="VALID",
                         compute_dtype=compute_dtype,
                         out_dtype=compute_dtype)
    x = conv2d_transpose(x, params["up2_w"], stride=2, padding="VALID",
                         compute_dtype=compute_dtype,
                         out_dtype=compute_dtype)
    w_eff = jnp.einsum("hwio,oj->hwij", params["up3_w"], params["out_W"])
    x = conv2d_transpose(x, w_eff, stride=1, padding="SAME",
                         compute_dtype=compute_dtype)
    n = x.shape[0]
    out = x.reshape(-1, 1) + params["out_b"].astype(x.dtype)
    out = dropout(out, keep_prob, rng, deterministic=not train)
    return out.reshape(n, 49, 49)


def _decoder_matrix(params: dict):
    """Compose the WHOLE decoder into one [7*7*C, 49*49] matrix + a
    [49*49] bias map, differentiably, per call.

    The reference decoder has NO nonlinearity anywhere
    (`gaze_grcn.py:318-366`): frozen BN -> deconv(5,s3) -> deconv(5,s2)
    -> deconv(7,s1,SAME) -> 12->1 head is one linear map from [7,7,C] to
    [49,49]. Stage-wise it runs three channel-starved deconvs (64/32/1
    output lanes on a 128-lane MXU; f+b measured 10-14% MFU, the train
    step's floor — BENCHMARKS.md round 3); composed, it is a single
    dense [N,6272]x[6272,2401] matmul. Kernel composition costs ~4 GFLOP
    of small convs per call and autodiff carries gradients back to the
    ORIGINAL up1/up2/up3/out_W parameters, so checkpoints, init, and
    training dynamics are unchanged (exact up to float reassociation;
    pinned against `apply_decoder_stagewise` in tests/test_models.py).

    Index algebra (1-D; 2-D is the product): with lax.conv_transpose's
    scatter-flipped-kernel semantics, deconv(K, s) is
    y[o] = sum_i x[i] * Kf[o - s*i], Kf = flip(K). Composing two:
    z[p] = sum_i x[i] * E[p - 6*i],
      E[J] = sum_{j} K1f[j] * K2f[J - 2*j]          (J in [0, 13))
    and the SAME-pad k7 head on top:
    out[q] = sum_i x[i] * G[q - 6*i + 3],
      G[g] = sum_v E[g + v - 6] * w_eff[v]          (g in [0, 19))
    """
    c_in = params["up1_w"].shape[2]
    w_eff = jnp.einsum("hwio,oj->hwij", params["up3_w"], params["out_W"])

    # E = composed 5/s3 o 5/s2 kernel [13, 13, C, 32]:
    # zero-upsample flip(up1) by 2, then full-conv with flip(up2) — done
    # as a correlation with the UNFLIPPED up2 and k-1 padding
    k1f = params["up1_w"][::-1, ::-1]                  # [5, 5, C, 64]
    up = jnp.zeros((9, 9) + k1f.shape[2:], k1f.dtype)
    up = up.at[::2, ::2].set(k1f)                      # [9, 9, C, 64]
    # treat C as batch: [C, 9, 9, 64] conv up2 [5,5,64,32] pad 4 -> 13
    e = lax.conv_general_dilated(
        jnp.transpose(up, (2, 0, 1, 3)), params["up2_w"],
        window_strides=(1, 1), padding=[(4, 4), (4, 4)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)            # [C, 13, 13, 32]

    # G[g] = sum_v E[g + v - 6] * w_eff[v]: correlation with pad 6 -> 19
    g = lax.conv_general_dilated(
        e, w_eff, window_strides=(1, 1), padding=[(6, 6), (6, 6)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)            # [C, 19, 19, 1]
    g = jnp.transpose(g[..., 0], (1, 2, 0))            # [19, 19, C]

    # place G into M[(i, ci), q]: M[i, q] = G[q - 6*i + 3] (0 outside).
    # Placement is pure data movement, so build it as pad + 49 static
    # slices instead of dense 0/1-tensordots (saves ~3.5 GFLOP + a large
    # intermediate per call; bit-identical): with P[j] = G[j - 33]
    # zero-padded, M[i, q] = P[q + 36 - 6*i], i.e. per (i_r, i_c) the
    # [49, 49] block is one shifted window of the padded G.
    p = jnp.pad(g, ((33, 33), (33, 33), (0, 0)))       # [85, 85, C]
    blocks = jnp.stack([
        jnp.stack([p[36 - 6 * ir:85 - 6 * ir, 36 - 6 * ic:85 - 6 * ic, :]
                   for ic in range(7)])
        for ir in range(7)])                           # [7, 7, 49, 49, C]
    m = jnp.transpose(blocks, (0, 1, 4, 2, 3))         # [i_r,i_c,C,q_r,q_c]

    # fold the frozen BN affine (y = x*scale*rsqrt(1+eps) + offset,
    # ops/layers.frozen_batch_norm) into the map
    bias = params["out_b"].astype(jnp.float32)[0]
    if "bn_scale" in params:
        offset_map = jnp.tensordot(
            params["bn_offset"].astype(m.dtype),
            m.sum(axis=(0, 1)), axes=([0], [0]))       # [49, 49]
        scale = (params["bn_scale"].astype(m.dtype)
                 * lax.rsqrt(jnp.asarray(1.0 + 1e-3, m.dtype)))
        m = m * scale[None, None, :, None, None]
        bias = bias + offset_map.reshape(-1)
    return m.reshape(7 * 7 * c_in, 49 * 49), bias


# Below this many folded frames the per-call kernel composition in
# `_decoder_matrix` exceeds the useful decoder work, so small-N callers
# (streaming chunk steps at B=1, single-clip predicts) take the stagewise
# deconvs instead. Measured on TPU v5e (bf16, fwd / fwd+bwd, ms/call —
# BENCHMARKS.md "Decoder small-N dispatch"):
#   N=8: comp 1.35/1.11 vs stage 0.94/0.96   (stagewise wins)
#   N=42: comp 1.06/1.06 vs stage 1.09/1.18  (crossover)
#   N=672: comp 1.23/1.22 vs stage 2.54/3.48
#   N=2352: comp 1.63/1.55 vs stage 6.61/9.04
_COMPOSE_MIN_N = 32


def apply_decoder(params: dict, x: jax.Array, *, keep_prob: float,
                  rng: Optional[jax.Array], train: bool,
                  compute_dtype=None) -> jax.Array:
    """[N, 7, 7, C] -> [N, 49, 49]: the reference's 3-deconv + head
    decoder (`gaze_grcn.py:318-366`). N is B*T folded.

    Dispatches on the (trace-time static) N: large N runs as ONE composed
    matmul (`apply_decoder_composed`); for small N the per-call kernel
    composition cost dominates, so the stagewise form is used. The two
    are equal up to float reassociation (pinned in tests/test_models.py).

    Under `jax.export` with a symbolic batch, N is a symbolic dimension
    and `N < 32` is undecidable — symbolic shapes always take the
    composed path (the export targets are batch servers, i.e. large-N).
    """
    if isinstance(x.shape[0], int) and x.shape[0] < _COMPOSE_MIN_N:
        return apply_decoder_stagewise(params, x, keep_prob=keep_prob,
                                       rng=rng, train=train,
                                       compute_dtype=compute_dtype)
    return apply_decoder_composed(params, x, keep_prob=keep_prob, rng=rng,
                                  train=train, compute_dtype=compute_dtype)


def apply_decoder_composed(params: dict, x: jax.Array, *, keep_prob: float,
                           rng: Optional[jax.Array], train: bool,
                           compute_dtype=None) -> jax.Array:
    """The decoder as ONE dense [N,6272]x[6272,2401] matmul (see
    `_decoder_matrix`); autodiff carries gradients back to the original
    up1/up2/up3/out_W kernels, so checkpoints and training dynamics are
    unchanged."""
    m, bias = _decoder_matrix(params)
    if compute_dtype is not None:
        m = m.astype(compute_dtype)
        x = x.astype(compute_dtype)
    n = x.shape[0]
    out = jnp.dot(x.reshape(n, -1), m,
                  preferred_element_type=jnp.float32)
    out = out + bias
    out = dropout(out.reshape(-1, 1), keep_prob, rng,
                  deterministic=not train)
    return out.reshape(n, 49, 49)


# ------------------------------------------------------------------ losses

def sequence_loss(logits: jax.Array, gt_gazemap: jax.Array,
                  loss_type: str,
                  frame_mask: Optional[jax.Array] = None) -> jax.Array:
    """Per-frame loss summed over time, averaged by B*T
    (`models/gaze_rnn.py:363-408`).

    l2:       tf.nn.l2_loss == 0.5 * sum of squares
    xentropy: softmax cross-entropy over the flattened H*W grid
    kld:      KL(gt || softmax(pred)) — the reference's KLD branch is broken
              (`gaze_rnn.py:395-399`); this implements the intended loss.

    `frame_mask` [B, T] (1 = real frame, 0 = padding) excludes padded
    frames from the loss and normalizes by the VALID frame count. The
    reference silently trains/scores padded frames (SURVEY.md section 7
    "variable-length clips"); omit the mask for that compat behavior.
    """
    b, t = logits.shape[:2]
    if frame_mask is None:
        denom = float(b * t)
        weight = None
    else:
        weight = frame_mask.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(weight), 1.0)

    if loss_type == "l2":
        sq = 0.5 * jnp.sum(jnp.square(logits - gt_gazemap), axis=(-2, -1))
        per_frame = sq  # [B, T]
    elif loss_type == "xentropy":
        per_frame = softmax_cross_entropy_2d(logits, gt_gazemap)  # [B, T]
    elif loss_type == "kld":
        per_frame = kl_divergence_2d(softmax_2d(logits), gt_gazemap)
    else:
        raise NotImplementedError(loss_type)
    if weight is not None:
        per_frame = per_frame * weight
    return jnp.sum(per_frame) / denom


# ----------------------------------------------------------------- harness

@dataclasses.dataclass
class GazeModel:
    """Functional model bundle. `apply` returns raw per-frame logits
    [B, T, GH, GW]; `predict` post-processes to probability maps when the
    loss is xentropy/kld (mirrors `gaze_rnn.py:149-159`)."""

    cfg: ModelConfig
    init_fn: Callable[[jax.Array], Params]
    apply_fn: Callable[..., jax.Array]
    # True if the model contains a ShallowNet subtree (frozen by default
    # during gaze training, `gaze_rnn.py:447-478`).
    has_shallownet: bool = False

    def init(self, key: jax.Array) -> Params:
        params = self.init_fn(key)
        if self.cfg.param_dtype != "float32":
            from ..utils import cast_floating

            params = cast_floating(params, jnp.dtype(self.cfg.param_dtype))
        return params

    def apply(self, params: Params, frames: jax.Array, c3d: jax.Array, *,
              train: bool = False, rng: Optional[jax.Array] = None
              ) -> jax.Array:
        return self.apply_fn(params, frames, c3d, train=train, rng=rng)

    def loss(self, params: Params, batch: dict, *, train: bool = True,
             rng: Optional[jax.Array] = None) -> tuple[jax.Array, dict]:
        logits = self.apply(params, batch["frames"], batch["c3d"],
                            train=train, rng=rng)
        gt = batch["gazemaps"]
        if self.cfg.loss_type in ("xentropy", "kld"):
            gt = normalize_probability_map(gt)  # gaze_rnn.py:499-500
        loss = sequence_loss(logits, gt, self.cfg.loss_type,
                             frame_mask=batch.get("frame_mask"))
        return loss, {"logits": logits}

    def predict(self, params: Params, frames: jax.Array,
                c3d: jax.Array) -> jax.Array:
        logits = self.apply(params, frames, c3d, train=False)
        if self.cfg.loss_type in ("xentropy", "kld"):
            return softmax_2d(logits)
        return logits
