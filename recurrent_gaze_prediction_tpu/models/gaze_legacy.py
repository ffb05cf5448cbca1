"""Legacy prototype capabilities: pupil-size heads + teacher-forced
previous-gazemap feedback.

Rebuilds the two pre-refactor prototypes kept in the reference repo root,
faithfully to their own (pre-`models/`-refactor) semantics:

  * `model_gru_rcn.py`: GRU-RCN trunk; ONE joint output projection
    `[7*7*units, 49+1]` producing the 7x7 gaze logits and the pupil
    scalar together (`model_gru_rcn.py:95-96`); loss = sum_t [ l2(gaze)
    + 0.01 * l2(pupil) ] / B, where l2 is TF's `l2_loss` = 0.5*sum(sq)
    and the division is by batch size ONLY, not B*T
    (`model_gru_rcn.py:135-144`). Gaze targets enter the L2 raw (the
    prototype's normalization is commented out, `model_gru_rcn.py:132`).
  * `model_2layer_gru.py`: flat GRU whose input at step t concatenates the
    C3D embedding with an embedding of the PREVIOUS step's ground-truth
    joint [gaze|pupil] vector — teacher forcing through the TIED inverse
    projection `inv_proj_out = transpose(proj_out_W)`
    (`model_2layer_gru.py:50,80-82`); joint [49 gaze logits | 1 pupil]
    output; loss = sum_t [ softmax-xent(gaze) + 0.5 * l2(pupil) ] / B
    (`model_2layer_gru.py:90-98`).

Intentional divergences (documented in PARITY.md): dropout on the output
logits (0.5 in the prototypes, applied unconditionally —
`model_gru_rcn.py:129`, `model_2layer_gru.py:90`) is gated on `train`
here; xent targets for gru2 are normalized to a probability map per this
framework's convention (the prototypes feed raw one-hot sums).

Both are registered as `gaze_pupil_grcn` and `gaze_pupil_gru2`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import initializers as init
from ..ops.cells import ConvGRU, FlatGRU
from ..ops.layers import dropout, linear
from ..ops.normalize import normalize_probability_map, softmax_cross_entropy_2d
from .common import GazeModel, apply_c3d_projection, compute_dtype_of, \
    init_c3d_projection

DIM_PROJ = 32
PUPIL_WEIGHT_GRCN = 0.01   # model_gru_rcn.py:141
PUPIL_WEIGHT_GRU2 = 0.5    # model_2layer_gru.py:95


# ---------------------------------------------------------- pupil GRU-RCN

def init_pupil_grcn(key: jax.Array, cfg: ModelConfig) -> dict:
    k_proj, k_cell, k_out = jax.random.split(key, 3)
    gh, gw = cfg.gazemap_height, cfg.gazemap_width
    out_dim = gh * gw + 1  # joint gaze + pupil (model_gru_rcn.py:86)
    return {
        "c3d_proj": init_c3d_projection(k_proj, cfg.dim_feature, DIM_PROJ),
        "cell": ConvGRU.init(k_cell, DIM_PROJ, cfg.rnn_state_size),
        # one joint projection [7*7*units, 50] (model_gru_rcn.py:95-96)
        "proj_out_W": init.uniform_scale(
            k_out, (7 * 7 * cfg.rnn_state_size, out_dim), 0.1),
        "proj_out_b": init.zeros((out_dim,)),
    }


def apply_pupil_grcn(params: dict, frames, c3d, cfg: ModelConfig, *,
                     train: bool = False, rng=None) -> jax.Array:
    """Returns joint logits [B, T, GH*GW + 1] (gaze flat | pupil)."""
    del frames
    cdt = compute_dtype_of(cfg)
    keep = cfg.dropout_keep_prob if train else 1.0
    b, t = c3d.shape[:2]

    k_proj = k_out = None
    if rng is not None:
        k_proj, k_out = jax.random.split(rng)
    embedded = apply_c3d_projection(params["c3d_proj"], c3d, keep_prob=keep,
                                    rng=k_proj, train=train,
                                    compute_dtype=cdt)
    xs = jnp.transpose(embedded, (1, 0, 2, 3, 4))
    h0 = ConvGRU.zero_state(b, (7, 7), cfg.rnn_state_size)
    _, ys = ConvGRU.scan(params["cell"], xs, h0, compute_dtype=cdt)

    flat = jnp.transpose(ys, (1, 0, 2, 3, 4)).reshape(b * t, -1)
    joint = linear(flat, params["proj_out_W"], params["proj_out_b"],
                   compute_dtype=cdt)
    # dropout ON the output logits (model_gru_rcn.py:129), train-gated
    if train and keep < 1.0 and k_out is not None:
        joint = dropout(joint, keep, k_out, deterministic=False)
    return joint.reshape(b, t, -1)


# -------------------------------------------- teacher-forced 2-layer GRU

def init_pupil_gru2(key: jax.Array, cfg: ModelConfig) -> dict:
    k_proj, k_cell, k_out = jax.random.split(key, 3)
    gh, gw = cfg.gazemap_height, cfg.gazemap_width
    out_dim = gh * gw + 1  # joint gaze + pupil (model_2layer_gru.py:37)
    state = cfg.rnn_state_size
    return {
        "c3d_proj": init_c3d_projection(k_proj, cfg.dim_feature, DIM_PROJ),
        "cell": FlatGRU.init(k_cell, 7 * 7 * DIM_PROJ + state, state),
        "proj_out_W": init.uniform_scale(k_out, (state, out_dim), 0.1),
        "proj_out_b": init.zeros((out_dim,)),
        # the inverse projection is TIED: transpose(proj_out_W)
        # (model_2layer_gru.py:50) — no free parameter here
    }


def apply_pupil_gru2(params: dict, frames, c3d, targets: jax.Array,
                     cfg: ModelConfig, *, train: bool = False, rng=None
                     ) -> jax.Array:
    """targets [B, T, GH*GW + 1] (gaze map flat + pupil); returns joint
    logits [B, T, GH*GW + 1]. Step t sees targets[t-1] (teacher forcing,
    model_2layer_gru.py:77-82)."""
    del frames
    cdt = compute_dtype_of(cfg)
    keep = cfg.dropout_keep_prob if train else 1.0
    b, t = c3d.shape[:2]
    state = cfg.rnn_state_size

    k_proj = k_out = None
    if rng is not None:
        k_proj, k_out = jax.random.split(rng)
    embedded = apply_c3d_projection(params["c3d_proj"], c3d, keep_prob=keep,
                                    rng=k_proj, train=train,
                                    compute_dtype=cdt)
    xs = embedded.reshape(b, t, -1)
    xs = jnp.transpose(xs, (1, 0, 2))  # [T, B, D]

    # previous-step targets, embedded through the tied inverse projection:
    # e_t = (y_{t-1} - b_out) @ proj_out_W^T (model_2layer_gru.py:80-82)
    prev = jnp.concatenate(
        [jnp.zeros((1, b, targets.shape[-1])),
         jnp.transpose(targets, (1, 0, 2))[:-1]], axis=0)
    embeds = linear((prev - params["proj_out_b"]).reshape(t * b, -1),
                    jnp.transpose(params["proj_out_W"]), compute_dtype=cdt)
    embeds = embeds.reshape(t, b, state)
    embeds = embeds.at[0].set(0.0)  # step 0 uses a zero embedding (:77-78)

    inputs = jnp.concatenate([xs, embeds], axis=-1)
    h0 = FlatGRU.zero_state(b, state)
    _, ys = FlatGRU.scan(params["cell"], inputs, h0, compute_dtype=cdt)

    logits = linear(ys.reshape(t * b, -1), params["proj_out_W"],
                    params["proj_out_b"], compute_dtype=cdt)
    if train and keep < 1.0 and k_out is not None:
        # model_2layer_gru.py:90
        logits = dropout(logits, keep, k_out, deterministic=False)
    return jnp.transpose(logits.reshape(t, b, -1), (1, 0, 2))


# ------------------------------------------------------------- model wrap

@dataclasses.dataclass
class PupilGazeModel(GazeModel):
    """GazeModel with the joint gaze+pupil losses of the prototypes."""

    pupil_weight: float = PUPIL_WEIGHT_GRCN
    kind: str = "grcn"  # grcn | gru2

    def loss(self, params, batch: dict, *, train: bool = True, rng=None):
        gh, gw = self.cfg.gazemap_height, self.cfg.gazemap_width
        pupils = batch["pupils"]
        b, t = batch["gazemaps"].shape[:2]

        if self.kind == "grcn":
            # raw (unnormalized) L2 targets — model_gru_rcn.py:132-136
            gaze_gt = batch["gazemaps"].reshape(b, t, gh * gw)
            joint = apply_pupil_grcn(params, batch["frames"], batch["c3d"],
                                     self.cfg, train=train, rng=rng)
            gaze, pupil = joint[..., :gh * gw], joint[..., -1]
            # tf.nn.l2_loss = 0.5 * sum(sq); total / B (NOT B*T) —
            # model_gru_rcn.py:135-144
            gaze_loss = 0.5 * jnp.sum(jnp.square(gaze - gaze_gt))
            pupil_loss = 0.5 * jnp.sum(jnp.square(pupil - pupils))
            loss = (gaze_loss + self.pupil_weight * pupil_loss) / b
            return loss, {"logits": gaze.reshape(b, t, gh, gw),
                          "pupil": pupil}

        gaze_gt = normalize_probability_map(batch["gazemaps"])
        targets = jnp.concatenate(
            [gaze_gt.reshape(b, t, gh * gw), pupils[..., None]], axis=-1)
        logits = apply_pupil_gru2(params, batch["frames"], batch["c3d"],
                                  targets, self.cfg, train=train, rng=rng)
        gaze_logits = logits[..., :gh * gw].reshape(b, t, gh, gw)
        gaze_loss = jnp.sum(softmax_cross_entropy_2d(gaze_logits, gaze_gt))
        pupil_loss = 0.5 * jnp.sum(jnp.square(logits[..., -1] - pupils))
        # model_2layer_gru.py:98 divides by B only
        loss = (gaze_loss + self.pupil_weight * pupil_loss) / b
        return loss, {"logits": gaze_logits, "pupil": logits[..., -1]}


def build_grcn(cfg: ModelConfig) -> PupilGazeModel:
    def apply_fn(p, f, c, train=False, rng=None):
        gh, gw = cfg.gazemap_height, cfg.gazemap_width
        joint = apply_pupil_grcn(p, f, c, cfg, train=train, rng=rng)
        b, t = joint.shape[:2]
        return joint[..., :gh * gw].reshape(b, t, gh, gw)

    return PupilGazeModel(
        cfg=cfg,
        init_fn=lambda key: init_pupil_grcn(key, cfg),
        apply_fn=apply_fn,
        pupil_weight=PUPIL_WEIGHT_GRCN, kind="grcn")


def build_gru2(cfg: ModelConfig) -> PupilGazeModel:
    def apply_fn(p, f, c, train=False, rng=None):
        b, t = c.shape[:2]
        gh, gw = cfg.gazemap_height, cfg.gazemap_width
        # inference runs with zero feedback (no ground truth available)
        targets = jnp.zeros((b, t, gh * gw + 1))
        logits = apply_pupil_gru2(p, f, c, targets, cfg, train=train, rng=rng)
        return logits[..., :gh * gw].reshape(b, t, gh, gw)

    return PupilGazeModel(
        cfg=cfg,
        init_fn=lambda key: init_pupil_gru2(key, cfg),
        apply_fn=apply_fn,
        pupil_weight=PUPIL_WEIGHT_GRU2, kind="gru2")
