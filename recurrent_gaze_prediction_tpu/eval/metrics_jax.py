"""Saliency metrics — batched, on-device (jit/vmap) implementations.

The reference evaluates per frame in NumPy under a joblib process pool
(`/root/reference/models/evaluate_gaze.py:201-209`, `evaluation_metrics.py`).
Here every metric is a fixed-shape batched computation so the whole
evaluation runs as one XLA program on TPU ("train_gaze-style loops never
leave the TPU", BASELINE.json north star).

Variable-length structures (per-frame fixation counts, data-dependent
threshold lists) are handled with fixed capacities + masking:

  * AUC_Judd: thresholds are the top-`max_fix` fixated saliency values per
    frame; rows past the true fixation count collapse onto the (1, 1) ROC
    endpoint, contributing zero area — the trapezoid sum is then exact.
  * AUC_Borji / AUC_shuffled: the reference sweeps `arange(0, max, 0.1)`
    over min-max-normalized maps (`evaluation_metrics.py:155`), so a fixed
    descending grid {0.9, ..., 0.0} is used; thresholds above the per-frame
    max land on the (0, 0) endpoint and add zero area.
  * negative sampling uses `jax.random` with explicit keys, making scores
    reproducible (the NumPy path inherits global-RNG nondeterminism).

All functions take [N, H, W] stacks and return [N] scores.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def _flatten(maps: jax.Array) -> jax.Array:
    n = maps.shape[0]
    return maps.reshape(n, -1)


def _normalize_range(x: jax.Array) -> jax.Array:
    lo = x.min(axis=-1, keepdims=True)
    hi = x.max(axis=-1, keepdims=True)
    return (x - lo) / jnp.where(hi > lo, hi - lo, 1.0)


def _sum_normalize(x: jax.Array) -> jax.Array:
    # plain division, like the golden: an all-zero map propagates NaN
    # through sim/kld instead of silently scoring garbage
    return x / x.sum(axis=-1, keepdims=True)


def cc_batch(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Pearson correlation per map (`evaluation_metrics.py:221-236`)."""
    p = _flatten(pred).astype(jnp.float32)
    g = _flatten(gt).astype(jnp.float32)
    p = p - p.mean(axis=-1, keepdims=True)
    g = g - g.mean(axis=-1, keepdims=True)
    num = (p * g).sum(axis=-1)
    den = jnp.sqrt((p * p).sum(axis=-1) * (g * g).sum(axis=-1))
    # constant map -> NaN, matching np.corrcoef in the golden
    return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), jnp.nan)


def sim_batch(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """SIM: intersection of sum-normalized maps (`evaluation_metrics.py:207-218`)."""
    p = _sum_normalize(_flatten(pred).astype(jnp.float32))
    g = _sum_normalize(_flatten(gt).astype(jnp.float32))
    return jnp.minimum(p, g).sum(axis=-1)


def nss_batch(pred: jax.Array, fixation: jax.Array) -> jax.Array:
    """NSS: mean z-scored saliency at fixated pixels."""
    p = _flatten(pred).astype(jnp.float32)
    f = _flatten(fixation) > 0.5
    mean = p.mean(axis=-1, keepdims=True)
    std = p.std(axis=-1, keepdims=True)
    z = (p - mean) / jnp.maximum(std, 1e-12)
    n_fix = f.sum(axis=-1)
    score = jnp.where(f, z, 0.0).sum(axis=-1) / jnp.maximum(n_fix, 1)
    # no fixated pixels -> NaN like the golden ("no fixation to predict");
    # np.nanmean aggregation then excludes the frame instead of biasing
    # the mean toward 0
    return jnp.where(n_fix > 0, score, jnp.nan)


def kld_batch(pred: jax.Array, gt: jax.Array, eps: float = 1e-12) -> jax.Array:
    """KL(gt || pred) of sum-normalized maps."""
    p = _sum_normalize(_flatten(pred).astype(jnp.float32))
    g = _sum_normalize(_flatten(gt).astype(jnp.float32))
    return (g * (jnp.log(g + eps) - jnp.log(p + eps))).sum(axis=-1)


@functools.partial(jax.jit, static_argnames=("max_fix", "jitter"))
def auc_judd_batch(pred: jax.Array, fixation: jax.Array, key: jax.Array,
                   max_fix: int = 64, jitter: bool = True) -> jax.Array:
    """Batched AUC-Judd (`evaluation_metrics.py:42-98`).

    Threshold sweep over the (top `max_fix`) fixated saliency values of each
    frame; exact when every frame has <= max_fix fixated pixels.
    """
    s = _flatten(pred).astype(jnp.float32)
    f = _flatten(fixation) > 0.5
    n, p_pixels = s.shape
    max_fix = min(max_fix, p_pixels)

    if jitter:
        s = s + jax.random.uniform(key, s.shape) * 1e-7
    s = _normalize_range(s)

    n_fix = f.sum(axis=-1)  # [N]
    # top-K fixated values, descending; padded with -inf
    fix_vals = jnp.where(f, s, -jnp.inf)
    thresholds = jax.lax.top_k(fix_vals, max_fix)[0]  # [N, K] descending

    # above[i, k] = #{ s[i] >= thresholds[i, k] }
    s_sorted = jnp.sort(s, axis=-1)  # ascending
    idx = jax.vmap(jnp.searchsorted, in_axes=(0, 0))(s_sorted, thresholds)
    above = p_pixels - idx  # [N, K]

    k = jnp.arange(1, max_fix + 1, dtype=jnp.float32)[None, :]
    valid = k <= n_fix[:, None]
    nf = jnp.maximum(n_fix, 1).astype(jnp.float32)[:, None]
    tp = jnp.where(valid, k / nf, 1.0)
    fp = jnp.where(valid, (above - k) / jnp.maximum(p_pixels - nf, 1.0), 1.0)

    # prepend (0,0), append (1,1)
    zeros = jnp.zeros((n, 1), jnp.float32)
    ones = jnp.ones((n, 1), jnp.float32)
    tp = jnp.concatenate([zeros, tp, ones], axis=1)
    fp = jnp.concatenate([zeros, fp, ones], axis=1)
    area = jnp.sum(0.5 * (tp[:, 1:] + tp[:, :-1]) * (fp[:, 1:] - fp[:, :-1]),
                   axis=1)
    return jnp.where(n_fix > 0, area, jnp.nan)


def _auc_from_samples(s_fix: jax.Array, fix_valid: jax.Array,
                      s_rand: jax.Array, rand_valid: jax.Array,
                      n_thresholds: int = 10,
                      step: float = 0.1) -> jax.Array:
    """Shared Borji-style AUC: fixed descending threshold grid
    {(n-1)*step, ..., 0}; tp/fp normalized by the true fixation count."""
    grid = (jnp.arange(n_thresholds - 1, -1, -1, dtype=jnp.float32) * step)
    # s_fix: [N, K], s_rand: [N, R, K]
    n_fix = fix_valid.sum(axis=-1).astype(jnp.float32)  # [N]
    nf = jnp.maximum(n_fix, 1.0)

    # tp[i, t] = #{s_fix >= grid[t]} / n_fix
    tp_counts = jnp.sum(
        (s_fix[:, None, :] >= grid[None, :, None]) & fix_valid[:, None, :],
        axis=-1).astype(jnp.float32)  # [N, T]
    tp = tp_counts / nf[:, None]

    # fp[i, r, t] = #{s_rand[i, r] >= grid[t]} / n_fix
    fp_counts = jnp.sum(
        (s_rand[:, :, None, :] >= grid[None, None, :, None])
        & rand_valid[:, :, None, :],
        axis=-1).astype(jnp.float32)  # [N, R, T]
    fp = fp_counts / nf[:, None, None]

    n, r = s_rand.shape[:2]
    zeros = jnp.zeros((n, r, 1), jnp.float32)
    ones = jnp.ones((n, r, 1), jnp.float32)
    tp_full = jnp.concatenate(
        [zeros, jnp.broadcast_to(tp[:, None, :], fp.shape), ones], axis=-1)
    fp_full = jnp.concatenate([zeros, fp, ones], axis=-1)
    area = jnp.sum(
        0.5 * (tp_full[:, :, 1:] + tp_full[:, :, :-1])
        * (fp_full[:, :, 1:] - fp_full[:, :, :-1]), axis=-1)  # [N, R]
    auc = area.mean(axis=-1)
    return jnp.where(n_fix > 0, auc, jnp.nan)


@functools.partial(jax.jit, static_argnames=("max_fix", "n_rep"))
def auc_borji_batch(pred: jax.Array, fixation: jax.Array, key: jax.Array,
                    max_fix: int = 64, n_rep: int = 100) -> jax.Array:
    """Batched AUC-Borji (`evaluation_metrics.py:101-164`): negatives are
    uniform random pixels, as many as fixations, n_rep repeats."""
    s = _normalize_range(_flatten(pred).astype(jnp.float32))
    f = _flatten(fixation) > 0.5
    n, p_pixels = s.shape
    max_fix = min(max_fix, p_pixels)

    # fixated values packed into capacity K (descending with -inf padding)
    fix_vals = jnp.where(f, s, -jnp.inf)
    s_fix = jax.lax.top_k(fix_vals, max_fix)[0]
    k = jnp.arange(1, max_fix + 1)[None, :]
    n_fix = f.sum(axis=-1)
    fix_valid = k <= n_fix[:, None]

    r = jax.random.randint(key, (n, n_rep, max_fix), 0, p_pixels)
    s_rand = jnp.take_along_axis(s[:, None, :], r, axis=-1)  # [N, R, K]
    rand_valid = jnp.broadcast_to(fix_valid[:, None, :], s_rand.shape)
    return _auc_from_samples(s_fix, fix_valid, s_rand, rand_valid)


@functools.partial(jax.jit, static_argnames=("max_fix", "n_rep"))
def auc_shuffled_batch(pred: jax.Array, fixation: jax.Array,
                       other_map: jax.Array, key: jax.Array,
                       max_fix: int = 64, n_rep: int = 100) -> jax.Array:
    """Batched shuffled AUC (`evaluation_metrics.py:167-204`): negatives are
    drawn (without replacement, per repeat) from pixels fixated in
    `other_map` — the union of M other frames' fixation maps."""
    s = _normalize_range(_flatten(pred).astype(jnp.float32))
    f = _flatten(fixation) > 0.5
    n, p_pixels = s.shape
    max_fix = min(max_fix, p_pixels)

    fix_vals = jnp.where(f, s, -jnp.inf)
    s_fix = jax.lax.top_k(fix_vals, max_fix)[0]
    k = jnp.arange(1, max_fix + 1)[None, :]
    n_fix = f.sum(axis=-1)
    fix_valid = k <= n_fix[:, None]

    other = other_map.reshape(-1) > 0.5  # [P]
    n_other = other.sum()

    # Random permutation of "other"-fixated pixel slots per (frame, repeat):
    # rank pixels by uniform noise, but push non-fixated pixels to the end.
    noise = jax.random.uniform(key, (n, n_rep, p_pixels))
    noise = jnp.where(other[None, None, :], noise, 2.0)
    order = jnp.argsort(noise, axis=-1)[..., :max_fix]       # [N, R, K]
    s_rand = jnp.take_along_axis(s[:, None, :], order, axis=-1)
    # valid negatives: slot index < min(n_fix, n_other)
    cap = jnp.minimum(n_fix, n_other)
    rand_valid = jnp.broadcast_to(
        k[None, :, :] <= cap[:, None, None], s_rand.shape)
    rand_valid = rand_valid & jnp.broadcast_to(fix_valid[:, None, :],
                                               s_rand.shape)
    return _auc_from_samples(s_fix, fix_valid, s_rand, rand_valid)


# ---------------------------------------------------------------------------
# Aggregate evaluation
# ---------------------------------------------------------------------------

AVAILABLE_METRICS = ("sim", "cc", "AUC_shuffled", "AUC_Borji")
ALL_METRICS = ("sim", "cc", "nss", "kld", "AUC_Judd", "AUC_Borji",
               "AUC_shuffled")


def build_other_map_union(fixations: jax.Array, key: jax.Array,
                          m: int = 10) -> jax.Array:
    """Union of M randomly chosen fixation maps
    (`evaluation_metrics.py:283-287`); M is capped at the population size."""
    n = fixations.shape[0]
    idx = jax.random.choice(key, n, (min(m, n),), replace=False)
    return (fixations[idx] > 0).sum(axis=0)


def _evaluate_batch_impl(pred: jax.Array, gt: jax.Array,
                         fixation: jax.Array, other_map: jax.Array,
                         key: jax.Array, metrics: tuple,
                         max_fix: int, n_rep: int) -> dict:
    keys = jax.random.split(key, 3)
    norm_pred = _normalize_range(_flatten(pred)).reshape(pred.shape)
    out = {}
    for metric in metrics:
        if metric == "cc":
            out[metric] = cc_batch(norm_pred, gt)
        elif metric == "sim":
            out[metric] = sim_batch(norm_pred, gt)
        elif metric == "nss":
            out[metric] = nss_batch(norm_pred, fixation)
        elif metric == "kld":
            out[metric] = kld_batch(norm_pred, gt)
        elif metric == "AUC_Judd":
            out[metric] = auc_judd_batch(norm_pred, fixation, keys[0],
                                         max_fix=max_fix)
        elif metric == "AUC_Borji":
            out[metric] = auc_borji_batch(norm_pred, fixation, keys[1],
                                          max_fix=max_fix, n_rep=n_rep)
        elif metric == "AUC_shuffled":
            out[metric] = auc_shuffled_batch(norm_pred, fixation, other_map,
                                             keys[2], max_fix=max_fix,
                                             n_rep=n_rep)
        else:
            raise ValueError(f"unknown metric: {metric}")
    return out


_evaluate_batch_jit = jax.jit(
    _evaluate_batch_impl, static_argnames=("metrics", "max_fix", "n_rep"))


def evaluate_batch(pred: jax.Array, gt: jax.Array, fixation: jax.Array,
                   key: jax.Array,
                   metrics: Sequence[str] = AVAILABLE_METRICS,
                   other_map: Optional[jax.Array] = None,
                   max_fix: int = 64, n_rep: int = 100,
                   chunk_size: int = 512) -> dict:
    """Compute per-frame scores for each metric; returns {metric: [N]}.

    Predictions are min-max normalized first, matching
    `evaluation_metrics.py:245`. All maps must share the same [N, H, W]
    shape (the on-device protocol evaluates at gazemap scale; the
    original-scale path lives in the NumPy evaluator).

    Frames run through the jitted metric program in `chunk_size` slices:
    the shuffled/Borji AUC samplers materialize [chunk, n_rep, ...] noise
    tensors, so an unchunked 10k-frame eval would need ~10 GB of HBM for
    the noise alone. The AUC_shuffled other-map union is built from the
    FULL fixation set before chunking (protocol: union over the whole
    population, `evaluation_metrics.py:283-287`); the last chunk is padded
    to the chunk shape so at most two programs compile.
    """
    key, k_other = jax.random.split(key)
    pred = pred.reshape(pred.shape[0], *pred.shape[-2:])
    n = pred.shape[0]
    if other_map is None:
        if "AUC_shuffled" in metrics:
            other_map = build_other_map_union(fixation, k_other)
        else:
            other_map = jnp.zeros(fixation.shape[-2:], fixation.dtype)
    if any(m.startswith("AUC") for m in metrics):
        # exact AUC thresholds need capacity >= the densest fixation map;
        # round up to a power of two to bound recompilation
        densest = int(jnp.max(jnp.sum(
            fixation.reshape(fixation.shape[0], -1) > 0.5, axis=-1)))
        if densest > max_fix:
            max_fix = 1 << (densest - 1).bit_length()

    if n <= chunk_size:
        return _evaluate_batch_jit(pred, gt, fixation, other_map, key,
                                   tuple(metrics), max_fix, n_rep)

    def pad_to(x, size):
        return jnp.concatenate(
            [x, jnp.zeros((size - x.shape[0],) + x.shape[1:], x.dtype)])

    pieces: list[dict] = []
    for start in range(0, n, chunk_size):
        sl = slice(start, min(start + chunk_size, n))
        p, g, f = pred[sl], gt[sl], fixation[sl]
        valid = p.shape[0]
        if valid < chunk_size:
            p, g, f = (pad_to(x, chunk_size) for x in (p, g, f))
        out = _evaluate_batch_jit(p, g, f, other_map,
                                  jax.random.fold_in(key, start),
                                  tuple(metrics), max_fix, n_rep)
        pieces.append({m: v[:valid] for m, v in out.items()})
    return {m: jnp.concatenate([piece[m] for piece in pieces])
            for m in pieces[0]}
