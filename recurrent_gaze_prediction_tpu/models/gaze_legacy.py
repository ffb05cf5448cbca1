"""Legacy prototype capabilities: pupil-size heads + teacher-forced
previous-gazemap feedback.

Rebuilds the two pre-refactor prototypes kept in the reference repo root:

  * `model_gru_rcn.py`: GRU-RCN trunk with an auxiliary pupil-size scalar
    head; loss = gaze loss + 0.01 * pupil L2 (`model_gru_rcn.py:135-141`)
  * `model_2layer_gru.py`: flat GRU whose input at step t concatenates the
    C3D embedding with an embedding of the PREVIOUS step's ground-truth
    gaze+pupil vector (teacher forcing through an inverse projection,
    `model_2layer_gru.py:75-98`); joint [49 gaze logits | 1 pupil] output;
    loss = softmax-xent(gaze) + 0.5 * l2(pupil), divided by B
    (`model_2layer_gru.py:90-98`)

Both are registered as `gaze_pupil_grcn` and `gaze_pupil_gru2`. The scan
carries (hidden state, previous joint target) so the teacher-forced
feedback stays inside one `lax.scan`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import initializers as init
from ..ops.cells import ConvGRU, FlatGRU
from ..ops.layers import linear
from ..ops.normalize import normalize_probability_map, softmax_cross_entropy_2d
from .common import GazeModel, apply_c3d_projection, compute_dtype_of, \
    init_c3d_projection

DIM_PROJ = 32
PUPIL_WEIGHT_GRCN = 0.01   # model_gru_rcn.py:135-141
PUPIL_WEIGHT_GRU2 = 0.5    # model_2layer_gru.py:94-95


# ---------------------------------------------------------- pupil GRU-RCN

def init_pupil_grcn(key: jax.Array, cfg: ModelConfig) -> dict:
    k_proj, k_cell, k_out, k_pupil = jax.random.split(key, 4)
    gh, gw = cfg.gazemap_height, cfg.gazemap_width
    return {
        "c3d_proj": init_c3d_projection(k_proj, cfg.dim_feature, DIM_PROJ),
        "cell": ConvGRU.init(k_cell, DIM_PROJ, cfg.rnn_state_size),
        "out_W": init.uniform_scale(
            k_out, (7 * 7 * cfg.rnn_state_size, gh * gw), 0.1),
        "out_b": init.zeros((gh * gw,)),
        "pupil_W": init.uniform_scale(
            k_pupil, (7 * 7 * cfg.rnn_state_size, 1), 0.1),
        "pupil_b": init.zeros((1,)),
    }


def apply_pupil_grcn(params: dict, frames, c3d, cfg: ModelConfig, *,
                     train: bool = False, rng=None
                     ) -> tuple[jax.Array, jax.Array]:
    """Returns (gaze logits [B,T,GH,GW], pupil predictions [B,T])."""
    del frames
    cdt = compute_dtype_of(cfg)
    keep = cfg.dropout_keep_prob if train else 1.0
    b, t = c3d.shape[:2]
    gh, gw = cfg.gazemap_height, cfg.gazemap_width

    embedded = apply_c3d_projection(params["c3d_proj"], c3d, keep_prob=keep,
                                    rng=rng, train=train, compute_dtype=cdt)
    xs = jnp.transpose(embedded, (1, 0, 2, 3, 4))
    h0 = ConvGRU.zero_state(b, (7, 7), cfg.rnn_state_size)
    _, ys = ConvGRU.scan(params["cell"], xs, h0, compute_dtype=cdt)

    flat = jnp.transpose(ys, (1, 0, 2, 3, 4)).reshape(b * t, -1)
    gaze = linear(flat, params["out_W"], params["out_b"],
                  compute_dtype=cdt).reshape(b, t, gh, gw)
    pupil = linear(flat, params["pupil_W"], params["pupil_b"],
                   compute_dtype=cdt).reshape(b, t)
    return gaze, pupil


# -------------------------------------------- teacher-forced 2-layer GRU

def init_pupil_gru2(key: jax.Array, cfg: ModelConfig) -> dict:
    k_proj, k_cell, k_out, k_inv = jax.random.split(key, 4)
    gh, gw = cfg.gazemap_height, cfg.gazemap_width
    out_dim = gh * gw + 1  # joint gaze + pupil (model_2layer_gru.py:60)
    state = cfg.rnn_state_size
    return {
        "c3d_proj": init_c3d_projection(k_proj, cfg.dim_feature, DIM_PROJ),
        "cell": FlatGRU.init(k_cell, 7 * 7 * DIM_PROJ + state, state),
        "proj_out_W": init.uniform_scale(k_out, (state, out_dim), 0.1),
        "proj_out_b": init.zeros((out_dim,)),
        # inverse projection embedding the previous target back to state
        # size (model_2layer_gru.py:80-81 `inv_proj_out`)
        "inv_proj_out": init.uniform_scale(k_inv, (out_dim, state), 0.1),
    }


def apply_pupil_gru2(params: dict, frames, c3d, targets: jax.Array,
                     cfg: ModelConfig, *, train: bool = False, rng=None
                     ) -> jax.Array:
    """targets [B, T, GH*GW + 1] (gaze map flat + pupil); returns joint
    logits [B, T, GH*GW + 1]. Step t sees targets[t-1] (teacher forcing)."""
    del frames
    cdt = compute_dtype_of(cfg)
    keep = cfg.dropout_keep_prob if train else 1.0
    b, t = c3d.shape[:2]
    state = cfg.rnn_state_size

    embedded = apply_c3d_projection(params["c3d_proj"], c3d, keep_prob=keep,
                                    rng=rng, train=train, compute_dtype=cdt)
    xs = embedded.reshape(b, t, -1)
    xs = jnp.transpose(xs, (1, 0, 2))  # [T, B, D]

    # previous-step targets, embedded: e_t = (y_{t-1} - b_out) @ inv_proj
    prev = jnp.concatenate(
        [jnp.zeros((1, b, targets.shape[-1])),
         jnp.transpose(targets, (1, 0, 2))[:-1]], axis=0)
    embeds = linear((prev - params["proj_out_b"]).reshape(t * b, -1),
                    params["inv_proj_out"], compute_dtype=cdt)
    embeds = embeds.reshape(t, b, state)
    embeds = embeds.at[0].set(0.0)  # step 0 uses a zero embedding

    inputs = jnp.concatenate([xs, embeds], axis=-1)
    h0 = FlatGRU.zero_state(b, state)
    _, ys = FlatGRU.scan(params["cell"], inputs, h0, compute_dtype=cdt)

    logits = linear(ys.reshape(t * b, -1), params["proj_out_W"],
                    params["proj_out_b"], compute_dtype=cdt)
    return jnp.transpose(logits.reshape(t, b, -1), (1, 0, 2))


# ------------------------------------------------------------- model wrap

@dataclasses.dataclass
class PupilGazeModel(GazeModel):
    """GazeModel with the joint gaze+pupil losses of the prototypes."""

    pupil_weight: float = PUPIL_WEIGHT_GRCN
    kind: str = "grcn"  # grcn | gru2

    def loss(self, params, batch: dict, *, train: bool = True, rng=None):
        gh, gw = self.cfg.gazemap_height, self.cfg.gazemap_width
        gaze_gt = normalize_probability_map(batch["gazemaps"])
        pupils = batch["pupils"]
        b, t = gaze_gt.shape[:2]

        if self.kind == "grcn":
            gaze, pupil = apply_pupil_grcn(params, batch["frames"],
                                           batch["c3d"], self.cfg,
                                           train=train, rng=rng)
            gaze_loss = jnp.sum(softmax_cross_entropy_2d(gaze, gaze_gt))
            pupil_loss = 0.5 * jnp.sum(jnp.square(pupil - pupils))
            loss = (gaze_loss + self.pupil_weight * pupil_loss) / (b * t)
            return loss, {"logits": gaze, "pupil": pupil}

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
    return PupilGazeModel(
        cfg=cfg,
        init_fn=lambda key: init_pupil_grcn(key, cfg),
        apply_fn=lambda p, f, c, train=False, rng=None: apply_pupil_grcn(
            p, f, c, cfg, train=train, rng=rng)[0],
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
