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


def _auc_trapezoid(tp: jax.Array, fp: jax.Array,
                   n_fix: jax.Array) -> jax.Array:
    """Trapezoid area under the (fp, tp) curve with (0,0)/(1,1) endpoints;
    tp/fp are [N, T] over a descending threshold grid."""
    n = tp.shape[0]
    zeros = jnp.zeros((n, 1), jnp.float32)
    ones = jnp.ones((n, 1), jnp.float32)
    tp = jnp.concatenate([zeros, tp, ones], axis=-1)
    fp = jnp.concatenate([zeros, fp, ones], axis=-1)
    area = jnp.sum(0.5 * (tp[:, 1:] + tp[:, :-1]) * (fp[:, 1:] - fp[:, :-1]),
                   axis=-1)
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


@functools.partial(jax.jit,
                   static_argnames=("max_fix", "n_rep", "exact"))
def auc_borji_batch(pred: jax.Array, fixation: jax.Array, key: jax.Array,
                    max_fix: int = 64, n_rep: int = 100,
                    exact: bool = True) -> jax.Array:
    """Batched AUC-Borji (`evaluation_metrics.py:101-164`): negatives are
    uniform random pixels, as many as fixations, n_rep repeats.

    `exact=True` (default) computes the estimator's expectation in closed
    form: the trapezoid area is LINEAR in the per-threshold fp vector, so
    E[area] = area(E[fp]), and E[fp_t] is simply the fraction of pixels
    >= grid_t. This is the value the reference's n_rep-sample Monte Carlo
    converges to — zero bias, zero sampling variance — and needs neither
    the random gather (TPU-hostile) nor the repeat dimension.
    `exact=False` keeps the faithful sampler for replication studies.
    """
    s = _normalize_range(_flatten(pred).astype(jnp.float32))
    f = _flatten(fixation) > 0.5
    n, p_pixels = s.shape
    max_fix = min(max_fix, p_pixels)

    if exact:
        grid = (jnp.arange(9, -1, -1, dtype=jnp.float32) * 0.1)
        ge = s[:, None, :] >= grid[None, :, None]            # [N, T, P]
        n_fix = f.sum(axis=-1)
        nf = jnp.maximum(n_fix, 1).astype(jnp.float32)
        tp = (ge & f[:, None, :]).sum(axis=-1) / nf[:, None]
        fp = ge.mean(axis=-1)                                 # = E[fp_t]
        return _auc_trapezoid(tp, fp, n_fix)

    # fixated values packed into capacity K (descending with -inf padding)
    fix_vals = jnp.where(f, s, -jnp.inf)
    s_fix = jax.lax.top_k(fix_vals, max_fix)[0]
    k = jnp.arange(1, max_fix + 1)[None, :]
    n_fix = f.sum(axis=-1)
    fix_valid = k <= n_fix[:, None]

    r = jax.random.randint(key, (n, n_rep, max_fix), 0, p_pixels)
    # flat gather per frame: avoids materializing a broadcast [N, R, P]
    s_rand = jnp.take_along_axis(s, r.reshape(n, -1),
                                 axis=-1).reshape(n, n_rep, max_fix)
    rand_valid = jnp.broadcast_to(fix_valid[:, None, :], s_rand.shape)
    return _auc_from_samples(s_fix, fix_valid, s_rand, rand_valid)


@functools.partial(jax.jit, static_argnames=("max_fix", "n_rep", "max_other",
                                             "exact"))
def auc_shuffled_batch(pred: jax.Array, fixation: jax.Array,
                       other_map: jax.Array, key: jax.Array,
                       max_fix: int = 64, n_rep: int = 100,
                       max_other: Optional[int] = None,
                       exact: bool = True) -> jax.Array:
    """Batched shuffled AUC (`evaluation_metrics.py:167-204`): negatives are
    drawn (without replacement, per repeat) from pixels fixated in
    `other_map` — the union of M other frames' fixation maps.

    `exact=True` (default) replaces the Monte-Carlo sampler with its
    closed-form expectation (see `auc_borji_batch`): the trapezoid area is
    linear in fp, and for min(n_fix, n_other) draws without replacement
    from the other-fixated pixels, E[fp_t] = (cap / n_fix) * q_t with q_t
    the fraction of other-fixated pixels >= grid_t (hypergeometric mean).

    With `exact=False`, `max_other` bounds the candidate negative set: the
    sampler permutes only the (top `max_other`) other-fixated pixel slots
    instead of all P pixels, turning the [N, R, P] noise-argsort of the
    naive formulation into a [N, R, max_other] top_k. Faithful whenever
    the other map has <= max_other fixated pixels (`evaluate_batch` sizes
    it from the actual union); None falls back to P.
    """
    s = _normalize_range(_flatten(pred).astype(jnp.float32))
    f = _flatten(fixation) > 0.5
    n, p_pixels = s.shape
    max_fix = min(max_fix, p_pixels)

    if exact:
        other_f = other_map.reshape(-1) > 0.5                # [P]
        n_other = other_f.sum()
        grid = (jnp.arange(9, -1, -1, dtype=jnp.float32) * 0.1)
        ge = s[:, None, :] >= grid[None, :, None]            # [N, T, P]
        n_fix = f.sum(axis=-1)
        nf = jnp.maximum(n_fix, 1).astype(jnp.float32)
        tp = (ge & f[:, None, :]).sum(axis=-1) / nf[:, None]
        q = ((ge & other_f[None, None, :]).sum(axis=-1)
             / jnp.maximum(n_other, 1).astype(jnp.float32))  # [N, T]
        cap = jnp.minimum(n_fix, n_other).astype(jnp.float32)
        fp = (cap / nf)[:, None] * q
        return _auc_trapezoid(tp, fp, n_fix)

    fix_vals = jnp.where(f, s, -jnp.inf)
    s_fix = jax.lax.top_k(fix_vals, max_fix)[0]
    k = jnp.arange(1, max_fix + 1)[None, :]
    n_fix = f.sum(axis=-1)
    fix_valid = k <= n_fix[:, None]

    other = other_map.reshape(-1) > 0.5  # [P]
    n_other = other.sum()
    mo = min(max_other if max_other is not None else p_pixels, p_pixels)

    # candidate slots: indices of (up to mo) other-fixated pixels
    cand_hit, cand_idx = jax.lax.top_k(jnp.where(other, 1.0, 0.0), mo)
    cand_valid = cand_hit > 0.5                              # [mo]
    s_cand = jnp.take(s, cand_idx, axis=-1)                  # [N, mo]

    # Random permutation of candidate slots per (frame, repeat): rank by
    # uniform noise, invalid slots pushed to the end; keep the first K.
    kk = min(max_fix, mo)
    noise = jax.random.uniform(key, (n, n_rep, mo))
    noise = jnp.where(cand_valid[None, None, :], noise, 2.0)
    neg_noise, neg_slot = jax.lax.top_k(-noise, kk)          # [N, R, kk]
    s_rand = jnp.take_along_axis(s_cand, neg_slot.reshape(n, -1),
                                 axis=-1).reshape(n, n_rep, kk)
    sel_valid = neg_noise > -1.5   # selected slot was a real candidate
    if kk < max_fix:
        pad = ((0, 0), (0, 0), (0, max_fix - kk))
        s_rand = jnp.pad(s_rand, pad)
        sel_valid = jnp.pad(sel_valid, pad)

    # valid negatives: slot index < min(n_fix, n_other), real candidate
    cap = jnp.minimum(n_fix, n_other)
    rand_valid = jnp.broadcast_to(
        k[None, :, :] <= cap[:, None, None], s_rand.shape)
    rand_valid = rand_valid & sel_valid
    rand_valid = rand_valid & jnp.broadcast_to(fix_valid[:, None, :],
                                               s_rand.shape)
    return _auc_from_samples(s_fix, fix_valid, s_rand, rand_valid)


# ---------------------------------------------------------------------------
# Aggregate evaluation
# ---------------------------------------------------------------------------

AVAILABLE_METRICS = ("sim", "cc", "AUC_shuffled", "AUC_Borji")
ALL_METRICS = ("sim", "cc", "nss", "kld", "AUC_Judd", "AUC_Borji",
               "AUC_shuffled")


@jax.jit
def _preamble_stats(fixation: jax.Array, other_map: jax.Array):
    """(densest per-frame fixation count, other-union fixated-pixel count)."""
    dens = jnp.max(jnp.sum(fixation.reshape(fixation.shape[0], -1) > 0.5,
                           axis=-1))
    return dens, jnp.sum(other_map > 0.5)


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
                         max_fix: int, n_rep: int,
                         max_other: Optional[int] = None,
                         exact: bool = True) -> dict:
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
                                          max_fix=max_fix, n_rep=n_rep,
                                          exact=exact)
        elif metric == "AUC_shuffled":
            out[metric] = auc_shuffled_batch(norm_pred, fixation, other_map,
                                             keys[2], max_fix=max_fix,
                                             n_rep=n_rep, max_other=max_other,
                                             exact=exact)
        else:
            raise ValueError(f"unknown metric: {metric}")
    return out


_evaluate_batch_jit = jax.jit(
    _evaluate_batch_impl,
    static_argnames=("metrics", "max_fix", "n_rep", "max_other", "exact"))


def evaluate_batch(pred: jax.Array, gt: jax.Array, fixation: jax.Array,
                   key: jax.Array,
                   metrics: Sequence[str] = AVAILABLE_METRICS,
                   other_map: Optional[jax.Array] = None,
                   max_fix: int = 64, n_rep: int = 100,
                   chunk_size: Optional[int] = None,
                   exact: bool = True) -> dict:
    """Compute per-frame scores for each metric; returns {metric: [N]}.

    Predictions are min-max normalized first, matching
    `evaluation_metrics.py:245`. All maps must share the same [N, H, W]
    shape (the on-device protocol evaluates at gazemap scale; the
    original-scale path lives in the NumPy evaluator).

    `exact=True` (default) computes AUC_Borji / AUC_shuffled as the
    closed-form expectation of the reference's Monte-Carlo estimator
    (unbiased, zero sampling variance — see `auc_borji_batch`);
    `exact=False` runs the faithful n_rep-repeat samplers.

    Frames run through the jitted metric program in `chunk_size` slices:
    the sampled (`exact=False`) shuffled/Borji AUCs materialize
    [chunk, n_rep, ...] noise tensors, so an unchunked 10k-frame eval
    would need ~10 GB of HBM for the noise alone. The AUC_shuffled other-map union is built from the
    FULL fixation set before chunking (protocol: union over the whole
    population, `evaluation_metrics.py:283-287`); the last chunk is padded
    to the chunk shape so at most two programs compile.
    """
    if chunk_size is None:
        # exact mode has no [chunk, n_rep, ...] noise tensors, so much
        # larger chunks fit; fewer dispatches matter on tunneled backends.
        # The exact AUC paths still form [chunk, ~10, H*W] comparison
        # tensors, so budget a fixed chunk*H*W working set (8192 frames at
        # 49x49 = ~20M elements) instead of a flat frame count — larger
        # maps get proportionally smaller chunks.
        if exact:
            pixels = max(int(pred.shape[-2]) * int(pred.shape[-1]), 1)
            chunk_size = max(min(8192, (8192 * 49 * 49) // pixels), 64)
        else:
            chunk_size = 512
    key, k_other = jax.random.split(key)
    pred = pred.reshape(pred.shape[0], *pred.shape[-2:])
    n = pred.shape[0]
    if other_map is None:
        if "AUC_shuffled" in metrics:
            other_map = build_other_map_union(fixation, k_other)
        else:
            other_map = jnp.zeros(fixation.shape[-2:], fixation.dtype)
    max_other = None
    needs_capacity = ("AUC_Judd" in metrics
                      or (not exact and any(m.startswith("AUC")
                                            for m in metrics)))
    if needs_capacity:
        # sampled AUCs / AUC_Judd need threshold capacity >= the densest
        # fixation map; round up to a power of two to bound recompilation.
        # One jitted program for both stats — eager reductions each pay a
        # dispatch round-trip on tunneled backends. (The exact Borji /
        # shuffled paths work on full pixel masks and need no capacity.)
        densest, n_other = (int(x) for x in
                            _preamble_stats(fixation, other_map))
        if densest > max_fix:
            max_fix = 1 << (densest - 1).bit_length()
        if not exact and "AUC_shuffled" in metrics:
            # candidate-set capacity for the shuffled-AUC sampler
            # (faithful when >= the union's fixated-pixel count)
            max_other = min(1 << (max(n_other, 1) - 1).bit_length(),
                            pred.shape[-2] * pred.shape[-1])

    if n <= chunk_size:
        return _evaluate_batch_jit(pred, gt, fixation, other_map, key,
                                   tuple(metrics), max_fix, n_rep, max_other,
                                   exact)

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
                                  tuple(metrics), max_fix, n_rep, max_other,
                                  exact)
        pieces.append({m: v[:valid] for m, v in out.items()})
    return {m: jnp.concatenate([piece[m] for piece in pieces])
            for m in pieces[0]}
