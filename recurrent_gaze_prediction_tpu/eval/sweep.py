"""Checkpoint-sweep evaluation driver.

Rebuild of the reference's checkpoint-sweep wrappers
(`/root/reference/models/action_evaluation.py`,
`models/action_classification_evaluation.py` — the latter has a syntax bug
at line 22 and never ran; and `models/evaluate_gaze.py:268-279`'s --embed
IPython sweep loop). Evaluates every retained checkpoint of a run and
reports per-step scores.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

from ..data.datasets import ClipDataset
from ..registry import create_model
from ..train import Checkpointer, create_train_state, make_predict_fn
from ..utils import log
from . import evaluator


def sweep_checkpoints(train_dir: str, dataset: ClipDataset,
                      metrics: Sequence[str] = evaluator.AVAILABLE_METRICS,
                      max_instances: Optional[int] = 50) -> dict[int, dict]:
    """Evaluate every checkpoint step under `train_dir`; returns
    {step: {metric: score}} plus logs a ranking by the first metric."""
    exp = Checkpointer.load_config(train_dir)
    model = create_model(exp.model.name, exp.model)
    state, _ = create_train_state(model, exp.optimizer, jax.random.PRNGKey(0))
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), state)
    ckpt = Checkpointer(train_dir)
    predict = make_predict_fn(model)

    results: dict[int, dict] = {}
    for step in sorted(ckpt.manager.all_steps()):
        # same data window for every checkpoint: iter_batches advances the
        # dataset's persistent cursor, which would otherwise make the
        # per-checkpoint scores incomparable
        dataset.reset()
        restored = ckpt.restore_step(step, abstract)
        _, scores = evaluator.generate_and_evaluate(
            predict, restored.params, dataset, model.cfg.batch_size,
            max_instances=max_instances, metrics=metrics)
        results[step] = scores
        log.infov("checkpoint %d: %s", step,
                  {m: round(s, 4) for m, s in scores.items()})

    if results:
        primary = list(metrics)[0]
        best = max(results, key=lambda s: results[s][primary])
        log.infov("best checkpoint by %s: step %d (%.4f)", primary, best,
                  results[best][primary])
    return results
