"""Orbax-based checkpointing of the TrainState.

Replaces `tf.train.Saver` full-graph checkpoints + config.json resurrection
(`/root/reference/models/base.py:188-253`, `:118-127`). Differences by
design (SURVEY.md section 5 checkpoint/resume):

  * the checkpoint stores {params, opt_state, step} explicitly — resume is
    exact, including the LR schedule position (the reference resets a
    Variable LR to the initial value on restore, `base.py:221-231`)
  * `restore_shallownet` grafts a pretrained ShallowNet subtree into a gaze
    model's params, the equivalent of the reference's per-variable assign
    surgery skipping Adam/is_training vars (`models/gaze_rnn.py:412-433`)
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config import ExperimentConfig
from ..utils import log
from .state import TrainState


class Checkpointer:
    """Save/restore TrainState under `{train_dir}/model/<step>` with
    retention, plus config.json beside it (reference layout: checkpoints in
    `{train_dir}/model/`, `models/base.py:240-253`)."""

    def __init__(self, train_dir: str, max_to_keep: int = 3):
        self.train_dir = os.path.abspath(train_dir)
        self.model_dir = os.path.join(self.train_dir, "model")
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                               create=True)
        self.manager = ocp.CheckpointManager(self.model_dir, options=options)

    def save(self, state: TrainState, wait: bool = False) -> None:
        step = int(state.step)
        self.manager.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self.manager.wait_until_finished()
        log.info(" [Checkpoint] saved step %d -> %s", step, self.model_dir)

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore_latest(self, abstract_state: TrainState
                       ) -> Optional[TrainState]:
        step = self.manager.latest_step()
        if step is None:
            return None
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore(abstract_state))
        log.info(" [Checkpoint] restored step %d from %s", step,
                 self.model_dir)
        return restored

    def restore_step(self, step: int, abstract_state: TrainState) -> TrainState:
        return self.manager.restore(
            step, args=ocp.args.StandardRestore(abstract_state))

    def save_config(self, cfg: ExperimentConfig) -> None:
        config_file = os.path.join(self.train_dir, "config.json")
        if os.path.exists(config_file):
            log.warn("config_file %s already exists (skipped)", config_file)
            return
        cfg.dump(config_file)

    @staticmethod
    def load_config(train_dir: str) -> ExperimentConfig:
        return ExperimentConfig.load(os.path.join(train_dir, "config.json"))

    def close(self) -> None:
        self.manager.wait_until_finished()
        self.manager.close()


def save_params(path: str, params: Any) -> None:
    """Standalone params-only checkpoint (e.g. pretrained ShallowNet)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params)
    ckptr.wait_until_finished()
    ckptr.close()


def load_params(path: str, abstract_params: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore(os.path.abspath(path), abstract_params)
    ckptr.close()
    return out


def restore_shallownet(params: dict, checkpoint_path: str) -> dict:
    """Graft a pretrained ShallowNet subtree into gaze-model params.

    Equivalent of `initialize_pretrained_shallownet`
    (`models/gaze_rnn.py:412-433`): only the ShallowNet weights are taken
    from the checkpoint; optimizer state is never touched because params
    and opt_state are separate pytrees here.
    """
    if "shallownet" not in params:
        raise ValueError("model params have no 'shallownet' subtree")
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype),
        params["shallownet"])
    loaded = load_params(checkpoint_path, abstract)
    out = dict(params)
    out["shallownet"] = loaded
    log.info("Loaded pretrained ShallowNet from %s", checkpoint_path)
    return out
