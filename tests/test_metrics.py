"""Golden tests: on-device batched metrics vs NumPy reference formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recurrent_gaze_prediction_tpu.eval import metrics_jax as mj
from recurrent_gaze_prediction_tpu.eval import metrics_np as mnp


def _random_frames(n=12, h=49, w=49, seed=0, n_fix_range=(3, 12)):
    rng = np.random.RandomState(seed)
    # smooth-ish saliency maps
    pred = rng.rand(n, h, w).astype(np.float32)
    gt = rng.rand(n, h, w).astype(np.float32) + 0.05
    fix = np.zeros((n, h, w), np.float32)
    for i in range(n):
        n_fix = rng.randint(*n_fix_range)
        ys = rng.randint(0, h, n_fix)
        xs = rng.randint(0, w, n_fix)
        fix[i, ys, xs] = 1.0
    return pred, gt, fix


def test_cc_parity():
    pred, gt, _ = _random_frames()
    dev = np.asarray(mj.cc_batch(jnp.array(pred), jnp.array(gt)))
    ref = np.array([mnp.cc(g, p) for p, g in zip(pred, gt)])
    np.testing.assert_allclose(dev, ref, rtol=1e-4, atol=1e-5)


def test_sim_parity():
    pred, gt, _ = _random_frames(seed=1)
    dev = np.asarray(mj.sim_batch(jnp.array(pred), jnp.array(gt)))
    ref = np.array([mnp.similarity(g, p) for p, g in zip(pred, gt)])
    np.testing.assert_allclose(dev, ref, rtol=1e-4, atol=1e-5)


def test_nss_parity():
    pred, _, fix = _random_frames(seed=2)
    dev = np.asarray(mj.nss_batch(jnp.array(pred), jnp.array(fix)))
    ref = np.array([mnp.nss(f, p) for p, f in zip(pred, fix)])
    np.testing.assert_allclose(dev, ref, rtol=1e-3, atol=1e-4)


def test_kld_parity():
    pred, gt, _ = _random_frames(seed=3)
    dev = np.asarray(mj.kld_batch(jnp.array(pred), jnp.array(gt)))
    ref = np.array([mnp.kld(g, p) for p, g in zip(pred, gt)])
    np.testing.assert_allclose(dev, ref, rtol=1e-3, atol=1e-4)


def test_auc_judd_parity():
    """Deterministic up to the 1e-7 jitter; tolerance 2e-3."""
    pred, _, fix = _random_frames(seed=4)
    dev = np.asarray(mj.auc_judd_batch(jnp.array(pred), jnp.array(fix),
                                       jax.random.PRNGKey(0)))
    ref = np.array([
        mnp.AUC_Judd(f, p, rng=np.random.RandomState(0))
        for p, f in zip(pred, fix)
    ])
    np.testing.assert_allclose(dev, ref, atol=2e-3)


def test_auc_judd_no_fixation_is_nan():
    pred = np.random.RandomState(0).rand(2, 9, 9).astype(np.float32)
    fix = np.zeros((2, 9, 9), np.float32)
    fix[1, 4, 4] = 1
    dev = np.asarray(mj.auc_judd_batch(jnp.array(pred), jnp.array(fix),
                                       jax.random.PRNGKey(0)))
    assert np.isnan(dev[0]) and not np.isnan(dev[1])


def test_auc_borji_close_to_numpy():
    """Different RNGs -> compare means across frames with loose tolerance."""
    pred, _, fix = _random_frames(n=16, seed=5, n_fix_range=(8, 16))
    dev = np.asarray(mj.auc_borji_batch(jnp.array(pred), jnp.array(fix),
                                        jax.random.PRNGKey(1), n_rep=64))
    ref = np.array([
        mnp.AUC_Borji(f, p, n_rep=64, rng=np.random.RandomState(i))
        for i, (p, f) in enumerate(zip(pred, fix))
    ])
    assert abs(dev.mean() - ref.mean()) < 0.03
    np.testing.assert_allclose(dev, ref, atol=0.12)  # per-frame sampling noise


def test_auc_borji_perfect_predictor():
    """A saliency map that exactly equals the fixation map -> AUC near 1."""
    rng = np.random.RandomState(6)
    fix = np.zeros((4, 21, 21), np.float32)
    for i in range(4):
        ys, xs = rng.randint(0, 21, 8), rng.randint(0, 21, 8)
        fix[i, ys, xs] = 1.0
    pred = fix + rng.rand(4, 21, 21).astype(np.float32) * 0.01
    dev = np.asarray(mj.auc_borji_batch(jnp.array(pred), jnp.array(fix),
                                        jax.random.PRNGKey(2)))
    assert (dev > 0.95).all()


def test_auc_shuffled_close_to_numpy():
    pred, _, fix = _random_frames(n=16, seed=7, n_fix_range=(8, 16))
    other = (fix[:10] > 0).sum(0)
    dev = np.asarray(mj.auc_shuffled_batch(
        jnp.array(pred), jnp.array(fix), jnp.array(other),
        jax.random.PRNGKey(3), n_rep=64))
    ref = np.array([
        mnp.AUC_shuffled(f, p, other, n_rep=64, rng=np.random.RandomState(i))
        for i, (p, f) in enumerate(zip(pred, fix))
    ])
    assert abs(np.nanmean(dev) - np.nanmean(ref)) < 0.04
    np.testing.assert_allclose(dev, ref, atol=0.15)


def test_evaluate_batch_full_metric_set():
    pred, gt, fix = _random_frames(n=12, seed=8)
    scores = mj.evaluate_batch(jnp.array(pred), jnp.array(gt), jnp.array(fix),
                               jax.random.PRNGKey(4),
                               metrics=mj.ALL_METRICS, n_rep=16)
    assert set(scores) == set(mj.ALL_METRICS)
    for name, vals in scores.items():
        assert vals.shape == (12,), name
        assert np.isfinite(np.asarray(vals)).all(), name


def test_numpy_protocol_original_scale_resize():
    """The offline protocol resizes pred/gt (49x49) to the fixation map's
    original scale before scoring (evaluation_metrics.py:239-272)."""
    from recurrent_gaze_prediction_tpu.eval import evaluator

    rng = np.random.RandomState(11)
    n = 12
    preds = rng.rand(n, 49, 49).astype(np.float32)
    gts = rng.rand(n, 49, 49).astype(np.float32) + 0.05
    # original-scale sparse fixation maps (72 x 96, bigger than the maps)
    fixs = np.zeros((n, 72, 96), np.float32)
    for i in range(n):
        fixs[i, rng.randint(0, 72, 6), rng.randint(0, 96, 6)] = 1.0
    scores = evaluator.evaluate(preds, gts, fixs,
                                metrics=("cc", "AUC_Borji"),
                                on_device=False)
    assert np.isfinite(scores["cc"])
    assert 0.0 <= scores["AUC_Borji"] <= 1.0


def test_numpy_saliency_score_aggregate():
    """Reference-style aggregate API works end to end."""
    pred, gt, fix = _random_frames(n=12, seed=9)
    rng = np.random.RandomState(0)
    score = mnp.saliency_score("cc", list(pred), list(gt), list(fix), rng=rng)
    assert np.isfinite(score)
    score_sauc = mnp.saliency_score("AUC_shuffled", list(pred), list(gt),
                                    list(fix), rng=rng)
    assert 0.0 <= score_sauc <= 1.0


def test_evaluate_batch_autosizes_auc_capacity():
    """Frames with more fixations than the default max_fix=64 still get
    exact AUC-Judd thresholds (capacity auto-raised)."""
    rng = np.random.RandomState(12)
    n, h, w = 4, 49, 49
    pred = rng.rand(n, h, w).astype(np.float32)
    gt = rng.rand(n, h, w).astype(np.float32) + 0.05
    fix = (rng.rand(n, h, w) < 0.06).astype(np.float32)  # ~144 fixations
    assert fix.reshape(n, -1).sum(-1).max() > 64
    scores = mj.evaluate_batch(jnp.array(pred), jnp.array(gt),
                               jnp.array(fix), jax.random.PRNGKey(0),
                               metrics=("AUC_Judd",))
    dev = np.asarray(scores["AUC_Judd"])
    ref = np.array([mnp.AUC_Judd(f, mnp.normalize_range(p),
                                 rng=np.random.RandomState(0))
                    for p, f in zip(pred, fix)])
    np.testing.assert_allclose(dev, ref, atol=2e-3)


def test_protocol_delta_on_device_vs_original_scale():
    """Quantifies the documented split between the two eval protocols
    (VERDICT r1 item 10): the on-device metrics score at gazemap scale
    (49x49), the reference's offline protocol resizes pred/gt (bicubic,
    reference-era skimage semantics since round 3) to the ORIGINAL
    fixation-map scale (`evaluation_metrics.py:239-272`). Measured here:
    cc -0.010, sim -0.002, AUC_Judd -0.004 — training-time on-device
    scores are interpretable against offline numbers to ~+-0.02 for the
    reference's metric set. NSS (our extension, not in the reference set)
    reads -0.55 lower on-device: old-skimage's corner-anchored resize
    decays the map's bottom/right border toward the constant-0 pad, which
    deflates the mean/std and inflates fixation z-scores; interpret
    offline NSS with that in mind (PARITY.md "Resize family")."""
    import jax
    import jax.numpy as jnp

    from recurrent_gaze_prediction_tpu.data.gazemap import (
        apply_gaussian_filter,
        resize_onehot_tensor,
    )
    from recurrent_gaze_prediction_tpu.eval import metrics_jax, metrics_np

    rng = np.random.RandomState(0)
    n, oh, ow, gh, gw = 40, 90, 120, 49, 49

    fix_orig = np.zeros((n, oh, ow), np.float64)
    for i in range(n):
        ys, xs = rng.randint(0, oh, 5), rng.randint(0, ow, 5)
        fix_orig[i, ys, xs] = 1
    fix_map = resize_onehot_tensor(fix_orig, (gh, gw)).astype(np.float64)

    gt = apply_gaussian_filter(fix_map.astype(np.float32), 2.0)
    gt = gt.astype(np.float64)
    gt /= gt.max(axis=(1, 2), keepdims=True).clip(1e-9)
    pred = np.roll(gt, shift=2, axis=2) * 0.9 + 0.1 * rng.rand(n, gh, gw)

    metrics = ("cc", "sim", "nss", "AUC_Judd")
    on_device = metrics_jax.evaluate_batch(
        jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(fix_map),
        jax.random.PRNGKey(0), metrics=metrics)
    rs = np.random.RandomState(0)
    bounds = {"cc": 0.03, "sim": 0.02, "nss": 0.65, "AUC_Judd": 0.01}
    for m in metrics:
        dev = float(np.nanmean(np.asarray(on_device[m])))
        ref = metrics_np.saliency_score(m, list(pred), list(gt),
                                        list(fix_orig), rng=rs)
        assert abs(dev - ref) <= bounds[m], (m, dev, ref)


def test_on_device_nan_conventions_match_golden():
    """Degenerate frames (no fixations / constant maps / zero-sum maps)
    must score NaN on-device exactly where the NumPy golden does, so
    nanmean aggregation excludes them instead of biasing toward 0
    (code-review r2 finding on nss_batch)."""
    import jax

    rng = np.random.RandomState(3)
    pred = rng.rand(3, 21, 21).astype(np.float32)
    fix = np.zeros((3, 21, 21), np.float32)
    fix[1, 4, 5] = 1.0  # only frame 1 has a fixation

    nss_dev = np.asarray(mj.nss_batch(jnp.asarray(pred), jnp.asarray(fix)))
    assert np.isnan(nss_dev[0]) and np.isnan(nss_dev[2])
    assert np.isfinite(nss_dev[1])
    assert np.isnan(mnp.nss(fix[0], pred[0]))

    const = np.ones((1, 21, 21), np.float32)
    cc_dev = np.asarray(mj.cc_batch(jnp.asarray(const), jnp.asarray(pred[:1])))
    assert np.isnan(cc_dev[0])
    assert np.isnan(mnp.cc(pred[0], const[0]))

    zero = np.zeros((1, 21, 21), np.float32)
    sim_dev = np.asarray(mj.sim_batch(jnp.asarray(zero), jnp.asarray(pred[:1])))
    assert np.isnan(sim_dev[0])
    assert np.isnan(mnp.similarity(pred[0], zero[0]))


def test_constant_prediction_map_scores_chance_not_crash():
    """A constant predicted map (uniform softmax from an untrained or
    collapsed checkpoint) must score — not crash the NumPy protocol.
    Pre-fix, normalize_range produced all-NaN and `np.arange(0, nan)`
    raised ValueError, killing the whole saliency_scores pass on one
    degenerate frame; the on-device path already guarded this."""
    rng = np.random.RandomState(0)
    fix = np.zeros((21, 21), np.float32)
    fix[4, 5] = fix[10, 11] = 1.0
    const = np.full((21, 21), 0.25, np.float32)

    borji = mnp.AUC_Borji(fix, const, rng=np.random.RandomState(1))
    assert borji == pytest.approx(0.5)  # chance, matching the jax guard
    judd = mnp.AUC_Judd(fix, const, rng=np.random.RandomState(1))
    assert np.isfinite(judd)  # jitter breaks ties; must not crash
    other = np.zeros((21, 21), np.float32)
    other[2, 2] = other[15, 3] = 1.0
    shuf = mnp.AUC_shuffled(fix, const, other,
                            rng=np.random.RandomState(1))
    assert shuf == pytest.approx(0.5)

    # and the full per-frame pass survives a mixed batch with one
    # degenerate frame
    pred = [rng.rand(21, 21).astype(np.float32), const]
    gt = [rng.rand(21, 21).astype(np.float32)] * 2
    vals = mnp.saliency_scores("AUC_Borji", pred, gt, [fix, fix],
                               rng=np.random.RandomState(2))
    assert np.isfinite(vals).all()


def test_evaluate_batch_chunking_matches_unchunked():
    """Chunked evaluation (memory bound for large N) must agree with the
    single-program path on deterministic metrics and stay in sampling
    noise for the stochastic AUCs; padded tail frames must not leak into
    the results."""
    pred, gt, fix = _random_frames(n=23, seed=21)
    key = jax.random.PRNGKey(5)
    whole = mj.evaluate_batch(jnp.asarray(pred), jnp.asarray(gt),
                              jnp.asarray(fix), key,
                              metrics=("cc", "sim", "AUC_shuffled"))
    chunked = mj.evaluate_batch(jnp.asarray(pred), jnp.asarray(gt),
                                jnp.asarray(fix), key,
                                metrics=("cc", "sim", "AUC_shuffled"),
                                chunk_size=10)
    for m in ("cc", "sim"):
        np.testing.assert_allclose(np.asarray(chunked[m]),
                                   np.asarray(whole[m]), rtol=1e-5,
                                   atol=1e-6)
    assert chunked["AUC_shuffled"].shape == (23,)
    # same frames, same other-map: stochastic AUC means agree closely
    assert abs(np.nanmean(np.asarray(chunked["AUC_shuffled"])) -
               np.nanmean(np.asarray(whole["AUC_shuffled"]))) < 0.05


def test_resize_family_score_delta():
    """round-3 (VERDICT item 6): quantify the protocol's cubic-resize
    delta. The reference upsamples 49x49 maps to the fixation-map scale
    with skimage.transform.resize(order=3) (`evaluation_metrics.py:248`);
    rounds 1-2 used scipy.ndimage.zoom. metrics_np now defaults to a
    skimage-semantics resize (corner-anchored map_coordinates); this test
    measures the per-metric score delta between the two cubic families on
    the protocol fixture and pins it small (recorded in PARITY.md)."""
    rng = np.random.RandomState(3)
    n, oh, ow, gh, gw = 30, 90, 120, 49, 49

    from recurrent_gaze_prediction_tpu.data.gazemap import (
        apply_gaussian_filter,
        resize_onehot_tensor,
    )

    fix_orig = np.zeros((n, oh, ow), np.float64)
    for i in range(n):
        ys, xs = rng.randint(0, oh, 5), rng.randint(0, ow, 5)
        fix_orig[i, ys, xs] = 1
    fix_small = resize_onehot_tensor(fix_orig, (gh, gw)).astype(np.float32)
    gt = apply_gaussian_filter(fix_small, 2.0).astype(np.float64)
    gt /= gt.max(axis=(1, 2), keepdims=True).clip(1e-9)
    pred = np.roll(gt, shift=2, axis=2) * 0.9 + 0.1 * rng.rand(n, gh, gw)

    deltas = {}
    for metric in ("cc", "sim", "AUC_Judd", "AUC_Borji"):
        vals = {}
        for impl in ("skimage", "zoom"):
            old = mnp.RESIZE_IMPL
            mnp.RESIZE_IMPL = impl
            try:
                rs = np.random.RandomState(0)
                vals[impl] = np.nanmean([
                    mnp.saliency_score_single(metric, p, g, f, rng=rs)
                    for p, g, f in zip(pred, gt, fix_orig)])
            finally:
                mnp.RESIZE_IMPL = old
        deltas[metric] = abs(vals["skimage"] - vals["zoom"])
    # measured on this fixture (PARITY.md): cc 1.1e-3, sim 1.5e-4,
    # AUC_Judd 7.3e-3, AUC_Borji 1.4e-2 — distribution metrics are nearly
    # family-invariant; AUC deltas come from the differing edge handling
    # (constant-0 vs nearest padding changes low-saliency negatives)
    bounds = {"cc": 5e-3, "sim": 2e-3, "AUC_Judd": 2e-2, "AUC_Borji": 3e-2}
    for metric, delta in deltas.items():
        assert delta < bounds[metric], (metric, delta, deltas)

    # the skimage-like path really is corner-anchored with zero padding:
    # an impulse at the source corner stays at the output corner
    impulse = np.zeros((7, 7))
    impulse[0, 0] = 1.0
    up = mnp._resize_skimage_like(impulse, (49, 49))
    assert up[0, 0] == np.max(up)


def test_saliency_score_excludes_empty_fixation_frames():
    """One no-fixation frame must not poison the aggregate (nanmean, like
    the on-device protocol — round-3 review; the reference's np.mean
    returns NaN for the whole eval)."""
    from recurrent_gaze_prediction_tpu.eval import metrics_np

    rng = np.random.RandomState(0)
    n = 12
    preds = [rng.rand(20, 20) for _ in range(n)]
    gts = [rng.rand(20, 20) for _ in range(n)]
    fixs = []
    for i in range(n):
        f = np.zeros((20, 20), np.float64)
        if i != 3:  # frame 3 has NO fixations
            f[rng.randint(0, 20, 5), rng.randint(0, 20, 5)] = 1
        fixs.append(f)
    score = metrics_np.saliency_score("AUC_Borji", preds, gts, fixs,
                                      rng=np.random.RandomState(1))
    assert np.isfinite(score)


def test_auc_exact_is_sampler_expectation():
    """exact=True equals the mean of the Monte-Carlo sampler: the trapezoid
    area is linear in fp, so E[area] = area(E[fp]). With many repeats the
    sampled per-frame values concentrate on the exact ones."""
    pred, _, fix = _random_frames(n=10, seed=11, n_fix_range=(8, 16))
    other = (fix[:8] > 0).sum(0)
    jp, jf, jo = jnp.array(pred), jnp.array(fix), jnp.array(other)

    exact_b = np.asarray(mj.auc_borji_batch(jp, jf, jax.random.PRNGKey(0)))
    sampled_b = np.stack([
        np.asarray(mj.auc_borji_batch(jp, jf, jax.random.PRNGKey(k),
                                      n_rep=128, exact=False))
        for k in range(4)
    ]).mean(0)
    np.testing.assert_allclose(exact_b, sampled_b, atol=0.02)

    exact_s = np.asarray(mj.auc_shuffled_batch(jp, jf, jo,
                                               jax.random.PRNGKey(0)))
    sampled_s = np.stack([
        np.asarray(mj.auc_shuffled_batch(jp, jf, jo, jax.random.PRNGKey(k),
                                         n_rep=128, exact=False))
        for k in range(4)
    ]).mean(0)
    np.testing.assert_allclose(exact_s, sampled_s, atol=0.03)

    # exact mode is deterministic: the key must not matter
    again = np.asarray(mj.auc_borji_batch(jp, jf, jax.random.PRNGKey(9)))
    np.testing.assert_array_equal(exact_b, again)


def test_auc_exact_through_evaluate_batch_chunked():
    """evaluate_batch(exact=True) skips the capacity sync and still matches
    the per-metric entry points across the chunked path."""
    pred, gt, fix = _random_frames(n=23, seed=12, n_fix_range=(8, 16))
    jp, jg, jf = jnp.array(pred), jnp.array(gt), jnp.array(fix)
    key = jax.random.PRNGKey(5)
    whole = mj.evaluate_batch(jp, jg, jf, key,
                              metrics=("AUC_Borji", "AUC_shuffled"))
    chunked = mj.evaluate_batch(jp, jg, jf, key,
                                metrics=("AUC_Borji", "AUC_shuffled"),
                                chunk_size=8)
    # Borji's exact path is key-independent -> chunking must be a no-op
    np.testing.assert_allclose(np.asarray(whole["AUC_Borji"]),
                               np.asarray(chunked["AUC_Borji"]), atol=1e-6)
    assert np.isfinite(np.asarray(chunked["AUC_shuffled"])).all()


def test_evaluator_and_cli_expose_sampled_auc():
    """`exact` plumbs through evaluator.evaluate and the CLI flag
    (--sampled_auc) selects the faithful Monte-Carlo samplers."""
    from recurrent_gaze_prediction_tpu.cli import evaluate_gaze as eg
    from recurrent_gaze_prediction_tpu.eval import evaluator

    args = eg.build_parser().parse_args(["--train_dir", "x"])
    assert args.exact is True
    args = eg.build_parser().parse_args(["--train_dir", "x",
                                         "--sampled_auc"])
    assert args.exact is False

    pred, gt, fix = _random_frames(n=6, seed=13, n_fix_range=(8, 16))
    out = evaluator.evaluate(pred, gt, fix, metrics=("AUC_Borji",),
                             exact=False, n_rep=16)
    assert np.isfinite(out["AUC_Borji"])


def test_generate_on_device_matches_host_path():
    """The fused eval path (maps never visit the host) must score exactly
    like generate()+evaluate() — exact mode is deterministic."""
    from recurrent_gaze_prediction_tpu import registry
    from recurrent_gaze_prediction_tpu.data import synthetic
    from recurrent_gaze_prediction_tpu.eval import evaluator
    from recurrent_gaze_prediction_tpu.train import make_predict_fn

    model = registry.create_model("gaze_grcn", n_lstm_steps=3, batch_size=2,
                                  compute_dtype="float32",
                                  rnn_state_size=8, dim_cnn_proj=16)
    params = model.init(jax.random.PRNGKey(0))
    data = synthetic.make_splits(n_train=0, n_valid=4, n_test=0, t=3,
                                 gazemap_hw=(49, 49), seed=1).valid
    predict = make_predict_fn(model)

    ret_dev, scores_dev = evaluator.generate_and_evaluate(
        predict, params, data, batch_size=2, max_instances=None)
    ret_host, scores_host = evaluator.generate_and_evaluate(
        predict, params, data, batch_size=2, max_instances=None,
        keep_maps="host")

    # device path: maps stayed device arrays, no image stack collected
    assert isinstance(ret_dev["pred_gazemaps"], jax.Array)
    assert "images" not in ret_dev
    assert "images" in ret_host
    assert ret_dev["clipnames"] == ret_host["clipnames"]
    np.testing.assert_allclose(np.asarray(ret_dev["pred_gazemaps"]),
                               ret_host["pred_gazemaps"], atol=1e-6)
    for m in scores_host:
        np.testing.assert_allclose(scores_dev[m], scores_host[m],
                                   rtol=1e-5, atol=1e-6, err_msg=m)


def test_auc_shuffled_bounded_candidate_set_is_faithful():
    """max_other >= the union's fixated-pixel count must not bias the
    sampler: its mean over keys matches the exact expectation like the
    unbounded (max_other=None) sampler does."""
    pred, _, fix = _random_frames(n=8, seed=21, n_fix_range=(6, 12))
    other = (fix[:6] > 0).sum(0)
    jp, jf, jo = jnp.array(pred), jnp.array(fix), jnp.array(other)
    n_other = int((other > 0.5).sum())
    mo = 1 << (n_other - 1).bit_length()  # smallest sufficient power of 2

    exact = np.asarray(mj.auc_shuffled_batch(jp, jf, jo,
                                             jax.random.PRNGKey(0)))
    bounded = np.stack([
        np.asarray(mj.auc_shuffled_batch(jp, jf, jo, jax.random.PRNGKey(k),
                                         n_rep=128, max_other=mo,
                                         exact=False))
        for k in range(4)
    ]).mean(0)
    np.testing.assert_allclose(bounded, exact, atol=0.03)
