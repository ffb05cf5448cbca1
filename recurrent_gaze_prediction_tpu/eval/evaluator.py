"""Generate + evaluate harness.

Rebuild of the reference's inference/scoring path
(`/root/reference/models/gaze_rnn.py:568-680`): run batched inference over a
dataset, flatten the time axis so there is one map per frame, then score
with the saliency metrics — here batched ON DEVICE (metrics_jax) instead of
a joblib process pool, with an optional NumPy path for original-scale
fixation maps (`models/evaluate_gaze.py` protocol).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np

from ..data.datasets import ClipDataset
from ..utils import log
from . import metrics_jax, metrics_np

AVAILABLE_METRICS = metrics_jax.AVAILABLE_METRICS


class RaggedMapsError(ValueError):
    """Fixation maps are ragged (original-scale, mixed resolutions), so the
    on-device path cannot form one rectangular device array. Callers catch
    THIS — not bare ValueError — so unrelated errors from predict_fn or the
    data pipeline propagate instead of silently re-running the epoch on the
    host path."""


def generate(predict_fn: Callable, params, dataset: ClipDataset,
             batch_size: int, max_instances: Optional[int] = 50,
             input_cast=None) -> dict:
    """Batched inference; returns per-frame stacks (time axis flattened),
    mirroring `gaze_rnn.py:568-650`. `input_cast` casts frames/c3d
    HOST-side before transfer (halves wire bytes on transfer-bound hosts;
    the models cast inputs to compute dtype in-graph anyway)."""
    pred_list, gt_list, fix_list, img_list, name_list = [], [], [], [], []
    for batch in dataset.iter_batches(batch_size, max_instances):
        frames, c3d = batch["frames"], batch["c3d"]
        if input_cast is not None:
            frames = np.asarray(frames).astype(input_cast)
            c3d = np.asarray(c3d).astype(input_cast)
        preds = predict_fn(params, frames, c3d)
        preds = np.asarray(jax.device_get(preds))
        b, t = preds.shape[:2]
        pred_list.append(preds.reshape(b * t, *preds.shape[2:]))
        gt_list.append(batch["gazemaps"].reshape(b * t,
                                                 *batch["gazemaps"].shape[2:]))
        fix = batch["fixationmaps"]
        if fix.dtype == object:
            # ragged original-scale maps (mixed resolutions, data/crc.py):
            # flatten windows of [T, H_i, W_i] to one object entry per frame
            flat = np.empty(b * t, dtype=object)
            i = 0
            for window in fix:
                for frame in window:
                    flat[i] = frame
                    i += 1
            fix_list.append(flat)
        else:
            fix_list.append(fix.reshape(b * t, *fix.shape[2:]))
        img_list.append(batch["frames"].reshape(b * t,
                                                *batch["frames"].shape[2:]))
        # one name per FRAME, so clipnames stays aligned with the flattened
        # per-frame stacks (the reference keeps one name per frame too)
        name_list.extend(n for n in batch["clipnames"] for _ in range(t))
    return {
        "pred_gazemaps": np.concatenate(pred_list),
        "gt_gazemaps": np.concatenate(gt_list),
        "fixationmaps": np.concatenate(fix_list),
        "images": np.concatenate(img_list),
        "clipnames": name_list,
    }


_SHARDED_EVAL_CACHE: dict = {}
_SHARDED_EVAL_CACHE_MAX = 8  # distinct (mesh, metrics, ...) configs live at once


def _sharded_evaluate_cached(mesh, metrics: tuple, n_rep: int, exact: bool):
    """One `parallel.make_sharded_evaluate` wrapper per (mesh, metrics,
    n_rep, exact): each wrapper owns a fresh `jax.jit` object, so building
    one per call would re-trace and re-compile the sharded metric program
    at every evaluation cadence of a training run. Mesh hashes by content
    (axis names + devices), so re-created identical meshes hit. Bounded:
    a long-lived process cycling through many distinct meshes (tests,
    notebooks) would otherwise pin every mesh's devices and compiled
    executables forever — beyond the cap the oldest entry is dropped
    (re-compiling later is correct, just slower)."""
    cache_key = (mesh, metrics, n_rep, exact)
    fn = _SHARDED_EVAL_CACHE.get(cache_key)
    if fn is None:
        from ..parallel import make_sharded_evaluate

        fn = make_sharded_evaluate(mesh, metrics=metrics, n_rep=n_rep,
                                   exact=exact)
        while len(_SHARDED_EVAL_CACHE) >= _SHARDED_EVAL_CACHE_MAX:
            _SHARDED_EVAL_CACHE.pop(next(iter(_SHARDED_EVAL_CACHE)))
        _SHARDED_EVAL_CACHE[cache_key] = fn
    return fn


def evaluate(pred_gazemaps: np.ndarray, gt_gazemaps: np.ndarray,
             fixationmaps: np.ndarray,
             metrics: Sequence[str] = AVAILABLE_METRICS,
             key: Optional[jax.Array] = None,
             on_device: bool = True, n_rep: int = 100,
             exact: bool = True, mesh=None) -> dict:
    """Mean per-frame scores. `on_device=True` runs the batched TPU metrics
    at map scale; `on_device=False` runs the NumPy protocol (including
    original-scale resize when fixation maps are larger). `exact` selects
    the closed-form AUC_Borji/AUC_shuffled expectation (default) vs the
    reference's Monte-Carlo samplers (see `metrics_jax.auc_borji_batch`);
    it only affects the on-device path — the NumPy protocol always
    samples, like the reference. `mesh` (a jax.sharding.Mesh) shards the
    frame axis over the mesh's "data" axis (`parallel.
    make_sharded_evaluate`) — exact mode is deterministic, so sharded
    and local scores are identical."""
    if isinstance(fixationmaps, jax.Array):
        ragged = False  # a device array is rectangular by construction
    elif isinstance(fixationmaps, np.ndarray):
        ragged = fixationmaps.dtype == np.dtype(object)
    else:
        ragged = len({np.shape(f) for f in fixationmaps}) > 1
    if on_device and ragged:
        # ragged original-scale maps cannot form one device array; the
        # NumPy protocol is the documented path for them
        log.warn("fixation maps are ragged (mixed resolutions): falling "
                 "back to the NumPy metric protocol")
        on_device = False
    if on_device:
        key = key if key is not None else jax.random.PRNGKey(0)
        if mesh is not None:
            sharded = _sharded_evaluate_cached(mesh, tuple(metrics), n_rep,
                                               exact)
            scores = sharded(jax.numpy.asarray(pred_gazemaps),
                             jax.numpy.asarray(gt_gazemaps),
                             jax.numpy.asarray(fixationmaps), key)
        else:
            scores = metrics_jax.evaluate_batch(
                jax.numpy.asarray(pred_gazemaps),
                jax.numpy.asarray(gt_gazemaps),
                jax.numpy.asarray(fixationmaps),
                key, metrics=tuple(metrics), n_rep=n_rep, exact=exact)
        out = {m: float(np.nanmean(np.asarray(v))) for m, v in scores.items()}
    else:
        rng = np.random.RandomState(0)
        out = {
            m: metrics_np.saliency_score(m, list(pred_gazemaps),
                                         list(gt_gazemaps),
                                         list(fixationmaps), rng=rng)
            for m in metrics
        }
    for metric, score in out.items():
        log.infov("Saliency %s : %f", metric, score)
    return out


def generate_on_device(predict_fn: Callable, params, dataset: ClipDataset,
                       batch_size: int, max_instances: Optional[int] = 50,
                       input_cast=None) -> dict:
    """`generate`, but prediction maps NEVER visit the host: per batch the
    inputs transfer up once, predict runs on-device, and the pred/gt/
    fixation stacks stay device arrays (concatenated on-device at the
    end) for `evaluate` to score in place. Skips the frame-image stack
    (only needed for dumps). Saves two full map transfers per eval epoch
    vs generate()+evaluate() — the reference's loop materializes every
    map in host memory (`gaze_rnn.py:568-650`). Requires fixed-scale
    fixation maps (the ragged original-scale protocol is host-side by
    nature)."""
    import jax.numpy as jnp

    pred_list, gt_list, fix_list, name_list = [], [], [], []
    for batch in dataset.iter_batches(batch_size, max_instances):
        frames, c3d = batch["frames"], batch["c3d"]
        if batch["fixationmaps"].dtype == object:
            raise RaggedMapsError(
                "generate_on_device needs fixed-scale fixation maps; use "
                "generate() + the NumPy protocol for ragged original-scale "
                "maps")
        if input_cast is not None:
            frames = np.asarray(frames).astype(input_cast)
            c3d = np.asarray(c3d).astype(input_cast)
        preds = predict_fn(params, jnp.asarray(frames), jnp.asarray(c3d))
        b, t = preds.shape[:2]
        pred_list.append(preds.reshape(b * t, *preds.shape[2:]))
        gt_list.append(jnp.asarray(batch["gazemaps"]).reshape(
            b * t, *batch["gazemaps"].shape[2:]))
        fix_list.append(jnp.asarray(batch["fixationmaps"]).reshape(
            b * t, *batch["fixationmaps"].shape[2:]))
        name_list.extend(n for n in batch["clipnames"] for _ in range(t))
    return {
        "pred_gazemaps": jnp.concatenate(pred_list),
        "gt_gazemaps": jnp.concatenate(gt_list),
        "fixationmaps": jnp.concatenate(fix_list),
        "clipnames": name_list,
    }


def generate_and_evaluate(predict_fn: Callable, params, dataset: ClipDataset,
                          batch_size: int, max_instances: Optional[int] = 50,
                          metrics: Sequence[str] = AVAILABLE_METRICS,
                          on_device: bool = True,
                          input_cast=None, keep_maps: str = "device",
                          mesh=None) -> tuple[dict, dict]:
    """`gaze_rnn.py:677-680` equivalent. `keep_maps="device"` (default)
    scores without ever moving maps to the host (falls back to the host
    path for ragged original-scale maps or `on_device=False`);
    `keep_maps="host"` returns NumPy stacks incl. frame images, like the
    reference's loop."""
    if keep_maps == "device" and on_device:
        try:
            ret = generate_on_device(predict_fn, params, dataset,
                                     batch_size, max_instances,
                                     input_cast=input_cast)
        except RaggedMapsError:
            ret = None
        if ret is not None:
            scores = evaluate(ret["pred_gazemaps"], ret["gt_gazemaps"],
                              ret["fixationmaps"], metrics=metrics,
                              on_device=True, mesh=mesh)
            return ret, scores
    ret = generate(predict_fn, params, dataset, batch_size, max_instances,
                   input_cast=input_cast)
    scores = evaluate(ret["pred_gazemaps"], ret["gt_gazemaps"],
                      ret["fixationmaps"], metrics=metrics,
                      on_device=on_device, mesh=mesh)
    return ret, scores


def write_overall(path: str, scores: dict) -> None:
    """Aggregate score dump (reference `overall.txt`,
    `models/evaluate_gaze.py:216-227`)."""
    with open(path, "w") as f:
        for metric, score in sorted(scores.items()):
            f.write(f"{metric}: {score}\n")
