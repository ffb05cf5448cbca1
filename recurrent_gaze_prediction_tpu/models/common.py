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

from ..config import ModelConfig
from ..ops import initializers as init
from ..ops.layers import conv2d_transpose, dropout, frozen_batch_norm, linear
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


def apply_decoder(params: dict, x: jax.Array, *, keep_prob: float,
                  rng: Optional[jax.Array], train: bool,
                  compute_dtype=None) -> jax.Array:
    """[N, 7, 7, C] -> [N, 49, 49] via deconv 5x5/s3 VALID -> 23,
    deconv 5x5/s2 VALID -> 49, deconv 7x7/s1 SAME, 12->1 linear head with
    output dropout (`gaze_grcn.py:318-366`). N is B*T folded."""
    if "bn_scale" in params:
        x = frozen_batch_norm(x, params["bn_scale"], params["bn_offset"])
    x = conv2d_transpose(x, params["up1_w"], stride=3, padding="VALID",
                         compute_dtype=compute_dtype,
                         out_dtype=compute_dtype)
    x = conv2d_transpose(x, params["up2_w"], stride=2, padding="VALID",
                         compute_dtype=compute_dtype,
                         out_dtype=compute_dtype)
    # up3 (7x7, 32->12, stride 1) and the 12->1 linear head are a LINEAR
    # composition (no nonlinearity between them in the reference either,
    # `gaze_grcn.py:353-362`) — fold the 12-channel intermediate into the
    # kernel once per call: 12x fewer FLOPs on the largest decoder conv
    # (49x49 spatial), measured 14.1 -> 9.5 ms decoder fwd+bwd at B*T=672
    # (BENCHMARKS.md round 2). Gradients flow through the einsum, so
    # up3_w / out_W training and checkpoints are unchanged.
    w_eff = jnp.einsum("hwio,oj->hwij", params["up3_w"], params["out_W"])
    # out_dtype left at fp32: the logits head always emitted fp32
    x = conv2d_transpose(x, w_eff, stride=1, padding="SAME",
                         compute_dtype=compute_dtype)
    n = x.shape[0]
    out = x.reshape(-1, 1) + params["out_b"].astype(x.dtype)
    out = dropout(out, keep_prob, rng, deterministic=not train)
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
