"""Standalone ShallowNet (saliency) training — the SALICON pretraining stage.

Rebuild of `SaliencyModel` training (`/root/reference/models/
saliency_shallownet.py:219-366`): L2 target loss normalized by 49*49 and
batch, 1e-7 weight-decay regularizer over model vars, horizontal-flip
augmentation of half the batch, dropout keep 0.4. The resulting params-only
checkpoint grafts into the gaze models via `restore_shallownet`.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import OptimizerConfig
from ..models import shallownet
from ..utils import log
from .state import build_schedule


def saliency_loss(params: dict, images: jax.Array, gt_maps: jax.Array, *,
                  rng: Optional[jax.Array] = None, train: bool = False,
                  dropout_keep_prob: float = 0.4,
                  compute_dtype=None) -> tuple[jax.Array, dict]:
    """reg + 2*l2_loss(pred - gt)/(49*49)/B (`saliency_shallownet.py:247-250`)."""
    pred = shallownet.apply(params, images,
                            dropout_keep_prob=dropout_keep_prob, rng=rng,
                            train=train, compute_dtype=compute_dtype)
    b = images.shape[0]
    target = jnp.sum(jnp.square(pred - gt_maps)) / (49.0 * 49.0) / b
    reg = shallownet.l2_regularizer(params)
    return reg + target, {"target_loss": target, "reg_loss": reg,
                          "pred": pred}


def make_saliency_train_step(opt_cfg: OptimizerConfig,
                             compute_dtype=None,
                             use_flip: bool = True) -> tuple[Callable, optax.GradientTransformation]:
    schedule = build_schedule(opt_cfg)
    # max_grad_norm <= 0 disables clipping, matching state._base_optimizer
    # (clip_by_global_norm(0) would silently ZERO every gradient)
    clip = (optax.clip_by_global_norm(opt_cfg.max_grad_norm)
            if opt_cfg.max_grad_norm > 0 else optax.identity())
    tx = optax.chain(clip, optax.adam(schedule))

    def step(params, opt_state, step_idx, images, gt_maps, rng):
        rng_step = jax.random.fold_in(rng, step_idx)
        k_flip, k_drop = jax.random.split(rng_step)
        if use_flip:
            from .state import random_half_flip

            flipped = random_half_flip(
                {"images": images, "gt_maps": gt_maps}, k_flip,
                {"images": 2, "gt_maps": 2})
            images, gt_maps = flipped["images"], flipped["gt_maps"]

        def loss_fn(p):
            loss, aux = saliency_loss(p, images, gt_maps, rng=k_drop,
                                      train=True,
                                      compute_dtype=compute_dtype)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss,
                                   "target_loss": aux["target_loss"],
                                   "reg_loss": aux["reg_loss"]}

    return jax.jit(step, donate_argnums=(0, 1)), tx


def fit_shallownet(dataset, *, opt_cfg: Optional[OptimizerConfig] = None,
                   max_steps: int = 1000, batch_size: int = 128,
                   seed: int = 0, compute_dtype=None,
                   log_every: int = 50) -> dict:
    """Train ShallowNet on a SALICON-style dataset (`next_batch` ->
    (images, maps, fixations)); returns the trained params."""
    opt_cfg = opt_cfg or OptimizerConfig(initial_learning_rate=3e-5,
                                         use_decay_schedule=False)
    params = shallownet.init_params(jax.random.PRNGKey(seed))
    step_fn, tx = make_saliency_train_step(opt_cfg,
                                           compute_dtype=compute_dtype)
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(seed + 1)
    for i in range(max_steps):
        images, maps = dataset.next_batch(batch_size)[:2]
        params, opt_state, metrics = step_fn(
            params, opt_state, i, jnp.asarray(images), jnp.asarray(maps), rng)
        if i % log_every == 0:
            log.info(" [shallownet step %4d] loss: %.5f (target %.5f)", i,
                     float(metrics["loss"]), float(metrics["target_loss"]))
    return params
