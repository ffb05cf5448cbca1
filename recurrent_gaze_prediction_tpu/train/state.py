"""Train state + jitted train/eval steps.

Replaces the reference's `ModelBase.build_train_op`/`single_step`
(`/root/reference/models/base.py:262-327`, `models/gaze_rnn.py:447-565`) with
an explicit immutable `TrainState` pytree and a single donated, jitted step:

  * optimizer factory: adam | rmsprop(momentum .9) | sgd(momentum .9)
    with global-norm clipping at max_grad_norm (`models/base.py:268-292`)
  * two parameter groups: the ShallowNet subtree trains at lr=0 — i.e. is
    frozen — during gaze training (`models/gaze_rnn.py:459-476`); here via
    `optax.multi_transform` masking
  * exp-decay LR schedule by step, so checkpoint resume restores the correct
    LR (fixing the reference bug at `models/base.py:221-231`)
  * flip augmentation runs IN-GRAPH: a random half of the batch is mirrored
    horizontally, including the C3D maps (`models/gaze_rnn.py:502-510`),
    so the augmentation never leaves the TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import OptimizerConfig
from ..models.common import GazeModel
from . import schedules

Params = Any


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Params
    opt_state: Any
    step: jax.Array  # scalar int32


def build_schedule(opt_cfg: OptimizerConfig) -> Callable:
    if opt_cfg.use_decay_schedule:
        return schedules.exponential_decay(
            opt_cfg.initial_learning_rate, opt_cfg.learning_rate_decay,
            opt_cfg.decay_steps, opt_cfg.staircase)
    return schedules.constant(opt_cfg.initial_learning_rate)


def _base_optimizer(opt_cfg: OptimizerConfig,
                    schedule: Callable) -> optax.GradientTransformation:
    if opt_cfg.method == "adam":
        opt = optax.adam(schedule)
    elif opt_cfg.method == "rmsprop":
        opt = optax.rmsprop(schedule, momentum=0.9)
    elif opt_cfg.method == "sgd":
        opt = optax.sgd(schedule, momentum=0.9)
    else:
        raise ValueError(f"Invalid optimization method: {opt_cfg.method}")
    chain = []
    if opt_cfg.max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(opt_cfg.max_grad_norm))
    chain.append(opt)
    return optax.chain(*chain)


def build_optimizer(opt_cfg: OptimizerConfig, params: Params,
                    freeze_shallownet: Optional[bool] = None
                    ) -> optax.GradientTransformation:
    """Optimizer with the reference's two-group scheme: if the params pytree
    has a top-level 'shallownet' subtree and freezing is enabled, that group
    gets zero updates (`gaze_rnn.py:459`)."""
    schedule = build_schedule(opt_cfg)
    base = _base_optimizer(opt_cfg, schedule)
    freeze = (opt_cfg.freeze_shallownet
              if freeze_shallownet is None else freeze_shallownet)
    has_subtree = isinstance(params, dict) and "shallownet" in params
    if not (freeze and has_subtree):
        return base

    def label_fn(p):
        return {k: ("frozen" if k == "shallownet" else "train") for k in p}

    return optax.multi_transform(
        {"train": base, "frozen": optax.set_to_zero()}, label_fn)


def create_train_state(model: GazeModel, opt_cfg: OptimizerConfig,
                       key: jax.Array,
                       freeze_shallownet: Optional[bool] = None
                       ) -> tuple[TrainState, optax.GradientTransformation]:
    params = model.init(key)
    freeze = freeze_shallownet
    if freeze is None:
        freeze = opt_cfg.freeze_shallownet and model.has_shallownet
    tx = build_optimizer(opt_cfg, params, freeze_shallownet=freeze)
    opt_state = tx.init(params)
    return TrainState(params=params, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32)), tx


# ------------------------------------------------------------ augmentation

def random_half_flip(batch: dict, key: jax.Array, axes: dict) -> dict:
    """Mirror a random half of the batch along per-key axes, in-graph.

    `axes` maps batch key -> flip axis; keys absent from the batch are
    skipped. Exactly floor(B/2) samples flip, like the reference
    (`gaze_rnn.py:502-510`). Shared by the feature-fed train step, the
    raw-video fused step, and the ShallowNet pretrain step.
    """
    b = next(iter(batch.values())).shape[0]
    perm = jax.random.permutation(key, b)
    ranks = jnp.argsort(perm)
    flip = (ranks < b // 2)

    def _maybe_flip(x, axis):
        flipped = jnp.flip(x, axis=axis)
        mask = flip.reshape((b,) + (1,) * (x.ndim - 1))
        return jnp.where(mask, flipped, x)

    out = dict(batch)
    for key_name, axis in axes.items():
        if key_name in batch:
            out[key_name] = _maybe_flip(batch[key_name], axis)
    return out


def flip_half_batch(batch: dict, key: jax.Array) -> dict:
    """Mirror a random half of the batch horizontally, in-graph.

    Mirrors frames [B,T,H,W,3] on W, gazemaps/fixationmaps [B,T,GH,GW] on W,
    and c3d [B,T,1024,7,7] on its last axis (`gaze_rnn.py:502-510`).
    """
    return random_half_flip(batch, key, {"frames": 3, "gazemaps": 3,
                                         "c3d": 4, "fixationmaps": 3})


# ------------------------------------------------------------------ steps

def make_train_step(model: GazeModel, tx: optax.GradientTransformation,
                    use_flip: Optional[bool] = None,
                    donate: bool = True,
                    accum_steps: int = 1) -> Callable:
    """Returns jitted `step(state, batch, rng) -> (state, metrics)`.

    `accum_steps > 1` enables gradient accumulation: the batch's leading
    axis is split into that many microbatches, gradients are averaged over
    a `lax.scan` of microbatch passes, and ONE optimizer update applies —
    numerically the same mean-over-batch loss gradient (the per-frame loss
    already divides by B*T, `gaze_rnn.py:407`), at 1/accum_steps the
    activation memory. Batch size must divide evenly.
    """
    flip = model.cfg.use_flip_batch if use_flip is None else use_flip

    def grads_of(params, batch, k_drop):
        def loss_fn(p):
            loss, aux = model.loss(p, batch, train=True, rng=k_drop)
            return loss, aux

        (loss, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        return loss, grads

    def step_fn(state: TrainState, batch: dict, rng: jax.Array):
        rng_step = jax.random.fold_in(rng, state.step)
        k_flip, k_drop = jax.random.split(rng_step)
        if flip:
            batch = flip_half_batch(batch, k_flip)

        if accum_steps == 1:
            loss, grads = grads_of(state.params, batch, k_drop)
        else:
            b = jax.tree_util.tree_leaves(batch)[0].shape[0]
            if b % accum_steps:
                raise ValueError(
                    f"batch size {b} not divisible by accum_steps "
                    f"{accum_steps}")
            micro = {k: v.reshape(accum_steps, b // accum_steps,
                                  *v.shape[1:])
                     for k, v in batch.items()}
            drop_keys = jax.random.split(k_drop, accum_steps)

            def body(carry, mb_and_key):
                acc_loss, acc_grads = carry
                mb, key = mb_and_key
                loss, grads = grads_of(state.params, mb, key)
                return (acc_loss + loss,
                        jax.tree_util.tree_map(jnp.add, acc_grads, grads)
                        ), None

            zero_grads = jax.tree_util.tree_map(
                lambda x: jnp.zeros(x.shape, jnp.float32), state.params)
            (loss_sum, grad_sum), _ = jax.lax.scan(
                body, (jnp.float32(0.0), zero_grads), (micro, drop_keys))
            loss = loss_sum / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps,
                                           grad_sum)

        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, opt_state=new_opt_state,
                               step=state.step + 1)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "step": state.step + 1,
        }
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums)


def make_eval_step(model: GazeModel) -> Callable:
    """Returns jitted `eval_step(params, batch) -> metrics` (val loss)."""

    def eval_fn(params, batch):
        loss, _ = model.loss(params, batch, train=False)
        return {"loss": loss}

    return jax.jit(eval_fn)


def make_predict_fn(model: GazeModel) -> Callable:
    """Returns jitted `predict(params, frames, c3d) -> prob/logit maps`."""

    def predict(params, frames, c3d):
        return model.predict(params, frames, c3d)

    return jax.jit(predict)
