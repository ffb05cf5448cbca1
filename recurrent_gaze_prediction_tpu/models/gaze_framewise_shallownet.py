"""gaze_framewise_shallownet — baseline: ShallowNet applied per frame.

Rebuild of `FramewiseShallowNet`
(`/root/reference/models/gaze_framewise_shallownet.py:75-90`): frames are
folded into one batch, run through ShallowNet, reshaped back to
[B, T, 49, 49]. Defaults in the reference: T=35, batch 5, l2 loss
(`gaze_framewise_shallownet.py:43-58`). Unlike the recurrent models, the
ShallowNet here IS trained (single train op over all variables,
`gaze_framewise_shallownet.py:94-111`).
"""

from __future__ import annotations

from typing import Optional

import jax

from ..config import ModelConfig
from . import shallownet
from .common import GazeModel, compute_dtype_of


def init_params(key: jax.Array, cfg: ModelConfig) -> dict:
    return {"shallownet": shallownet.init_params(key)}


def apply(params: dict, frames: jax.Array, c3d: jax.Array,
          cfg: ModelConfig, *, train: bool = False,
          rng: Optional[jax.Array] = None) -> jax.Array:
    del c3d
    cdt = compute_dtype_of(cfg)
    b, t = frames.shape[:2]
    maps = shallownet.apply(
        params["shallownet"], frames.reshape(-1, *frames.shape[2:]),
        train=False,  # dropout=False inside gaze models
        compute_dtype=cdt)
    return maps.reshape(b, t, 49, 49)


def build(cfg: ModelConfig) -> GazeModel:
    return GazeModel(
        cfg=cfg,
        init_fn=lambda key: init_params(key, cfg),
        apply_fn=lambda p, f, c, train=False, rng=None: apply(
            p, f, c, cfg, train=train, rng=rng),
        # trained end-to-end in this baseline; not frozen
        has_shallownet=False,
    )
