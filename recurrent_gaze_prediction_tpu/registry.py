"""Model registry: string name -> model builder + per-model config defaults.

Mirrors the registry in `/root/reference/models/train_gaze.py:41-69`
(including per-model CONSTANTS/GRUModelConfig defaults). The reference's two
dead entries (`gaze_shallownet_rnn`, `gaze_deeprnn` — modules missing from
the repo, `train_gaze.py:59-67`) are intentionally not reproduced.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

from .config import ExperimentConfig, ModelConfig

_REGISTRY: dict[str, tuple[Callable, dict]] = {}


def register(name: str, defaults: dict):
    def wrap(builder: Callable):
        _REGISTRY[name] = (builder, defaults)
        return builder
    return wrap


def available_models() -> list[str]:
    return sorted(_REGISTRY)


def model_defaults(name: str) -> dict:
    if name not in _REGISTRY:
        raise KeyError(
            f"Unknown model '{name}'. Available: {available_models()}")
    return dict(_REGISTRY[name][1])


def create_model(name: str, cfg: ModelConfig | None = None, **overrides):
    """Build a GazeModel. Precedence: explicit kwargs > cfg fields the user
    assigned after construction (tracked by `ModelConfig.explicit_fields`,
    so setting a field to its dataclass default on purpose still wins) >
    cfg fields that differ from the dataclass default > per-model defaults.
    """
    if name not in _REGISTRY:
        raise KeyError(
            f"Unknown model '{name}'. Available: {available_models()}")
    builder, defaults = _REGISTRY[name]

    base = cfg if cfg is not None else ModelConfig()
    explicit = base.explicit_fields() if hasattr(
        base, "explicit_fields") else set()
    merged = dataclasses.replace(base)
    field_defaults = ModelConfig()
    for key, value in defaults.items():
        # only apply the model default when the user hasn't customized it
        if key in explicit:
            continue
        if getattr(merged, key) == getattr(field_defaults, key):
            setattr(merged, key, value)
    for key, value in overrides.items():
        setattr(merged, key, value)
    merged.name = name
    return builder(merged)


def create_model_from_experiment(exp: ExperimentConfig):
    return create_model(exp.model.name, exp.model)


# --------------------------------------------------------------- bindings

def _register_all() -> None:
    from .models import (
        gaze_c3d_conv,
        gaze_framewise_shallownet,
        gaze_grcn,
        gaze_grcn_cascade,
        gaze_lstm,
        gaze_rnn,
    )

    register("gaze_rnn", dict(
        gazemap_height=49, gazemap_width=49, n_lstm_steps=42, batch_size=7,
        dim_cnn_proj=32, loss_type="xentropy"))(gaze_rnn.build)
    register("gaze_rnn77", dict(
        gazemap_height=7, gazemap_width=7, n_lstm_steps=35, batch_size=7,
        dim_cnn_proj=32, loss_type="l2"))(gaze_rnn.build)
    register("gaze_grcn", dict(
        gazemap_height=49, gazemap_width=49, n_lstm_steps=42, batch_size=7,
        dim_cnn_proj=512, rnn_state_size=128,
        loss_type="xentropy"))(gaze_grcn.build)
    register("gaze_grcn77", dict(
        gazemap_height=7, gazemap_width=7, n_lstm_steps=35, batch_size=7,
        dim_cnn_proj=512, rnn_state_size=128,
        loss_type="xentropy"))(gaze_grcn.build)
    register("gaze_lstm", dict(
        gazemap_height=49, gazemap_width=49, n_lstm_steps=42, batch_size=7,
        dim_cnn_proj=512, rnn_state_size=128,
        loss_type="xentropy"))(gaze_lstm.build)
    register("gaze_grcn_cascade", dict(
        gazemap_height=49, gazemap_width=49, n_lstm_steps=42, batch_size=7,
        dim_cnn_proj=512, loss_type="l2"))(gaze_grcn_cascade.build)
    register("gaze_c3d_conv", dict(
        gazemap_height=49, gazemap_width=49, n_lstm_steps=42, batch_size=7,
        dim_cnn_proj=512, loss_type="xentropy"))(gaze_c3d_conv.build)
    register("gaze_framewise_shallownet", dict(
        gazemap_height=49, gazemap_width=49, n_lstm_steps=35, batch_size=5,
        loss_type="l2"))(gaze_framewise_shallownet.build)

    # legacy prototypes with pupil heads (reference repo root,
    # model_gru_rcn.py / model_2layer_gru.py)
    from .models import gaze_legacy

    register("gaze_pupil_grcn", dict(
        gazemap_height=7, gazemap_width=7, n_lstm_steps=35, batch_size=7,
        dim_cnn_proj=32, rnn_state_size=64,
        # the prototype's gaze loss is l2 on the raw joint logits
        # (model_gru_rcn.py:135-136), so predictions are the raw maps
        loss_type="l2"))(gaze_legacy.build_grcn)
    register("gaze_pupil_gru2", dict(
        gazemap_height=7, gazemap_width=7, n_lstm_steps=35, batch_size=7,
        dim_cnn_proj=32, rnn_state_size=128,
        loss_type="xentropy"))(gaze_legacy.build_gru2)


_register_all()
