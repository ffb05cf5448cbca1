"""Raw-video training surface (`train/fused.py` + `cli/train_fused.py`).

The fused TRAIN STEP itself is covered in test_c3d.py; this file covers the
product surface around it: corpus loading (videos + processed .mat ->
aligned batches), the checkpointed fit loop, and the CLI main including
resume.
"""

import os

import numpy as np
import pytest

from recurrent_gaze_prediction_tpu import registry
from recurrent_gaze_prediction_tpu.models import pipeline
from recurrent_gaze_prediction_tpu.train import fused

F = 32  # -> 2 c3d windows, T=2


def test_synthetic_fused_corpus_shapes():
    data = fused.make_synthetic_fused_corpus(4, num_frames=F,
                                             frame_hw=(48, 64), seed=0)
    t = pipeline.pipeline_timesteps(F)
    assert data.video.shape == (4, F, 48, 64, 3)
    assert data.video.dtype == np.uint8
    assert data.gazemaps.shape == (4, t, 49, 49)
    # learnable: the gaze target peaks where the frame is bright
    ci, ti = 1, t - 1
    gy, gx = np.unravel_index(np.argmax(data.gazemaps[ci, ti]), (49, 49))
    fy, fx = int(gy / 48 * 47), int(gx / 48 * 63)
    frame = data.video[ci, fused.FRAME_OFFSET + ti * fused.FRAME_STRIDE]
    patch = frame[max(0, fy - 6):fy + 6, max(0, fx - 6):fx + 6]
    assert patch.mean() > frame.mean() + 20

    batch = data.next_batch(2)
    assert batch["video"].shape == (2, F, 48, 64, 3)
    train, valid = data.split(1)
    assert len(train) == 3 and len(valid) == 1
    assert valid.clipnames[0] == data.clipnames[3]


def test_split_degenerate_returns_none():
    data = fused.make_synthetic_fused_corpus(2, num_frames=F,
                                             frame_hw=(48, 64))
    train, valid = data.split(0)
    assert valid is None and train is data
    train, valid = data.split(5)
    assert valid is None and train is data


@pytest.mark.slow
def test_fit_fused_checkpoints_and_resumes(tmp_path):
    """fit_fused descends on the synthetic corpus, saves a checkpoint, and
    a second invocation resumes from it instead of restarting."""
    import jax.numpy as jnp
    import optax

    from recurrent_gaze_prediction_tpu.config import ExperimentConfig

    data = fused.make_synthetic_fused_corpus(4, num_frames=F,
                                             frame_hw=(48, 64), seed=0)
    t = pipeline.pipeline_timesteps(F)
    model = registry.create_model("gaze_grcn", n_lstm_steps=t, batch_size=2,
                                  compute_dtype="float32", rnn_state_size=8,
                                  dim_cnn_proj=16)
    exp = ExperimentConfig()
    exp.model = model.cfg
    exp.schedule.max_steps = 4
    exp.schedule.steps_per_checkpoint = 2
    exp.schedule.steps_per_validation = 2
    exp.schedule.steps_per_logprint = 1

    import jax

    from recurrent_gaze_prediction_tpu.models import c3d

    tx = optax.adam(1e-3)
    c3d_params = c3d.init_params(jax.random.PRNGKey(0))
    gaze_params = model.init(jax.random.PRNGKey(1))
    state = fused.FusedTrainState(
        gaze_params, pipeline.init_fused_opt_state(tx, gaze_params),
        c3d_params, jnp.zeros((), jnp.int32))

    train_dir = str(tmp_path / "run")
    state = fused.fit_fused(model, state, tx, data, exp,
                            valid_data=data, compute_dtype=jnp.float32,
                            train_dir=train_dir)
    assert int(state.step) == 4
    assert os.path.isdir(os.path.join(train_dir, "model"))

    # resume: raise max_steps, feed a FRESH state — the loop must restore
    # step 4 from disk and only run 2 more
    exp.schedule.max_steps = 6
    fresh = fused.FusedTrainState(
        model.init(jax.random.PRNGKey(9)),
        pipeline.init_fused_opt_state(tx, gaze_params), c3d_params,
        jnp.zeros((), jnp.int32))
    state2 = fused.fit_fused(model, fresh, tx, data, exp,
                             compute_dtype=jnp.float32,
                             train_dir=train_dir)
    assert int(state2.step) == 6


@pytest.mark.slow
def test_fit_fused_on_mesh(tmp_path):
    """fit_fused(mesh=...) routes through the sharded fused train step:
    loss descends and the checkpoint round-trips like the local path."""
    import jax
    import jax.numpy as jnp
    import optax

    from recurrent_gaze_prediction_tpu.config import ExperimentConfig
    from recurrent_gaze_prediction_tpu.models import c3d
    from recurrent_gaze_prediction_tpu.parallel import make_mesh

    data = fused.make_synthetic_fused_corpus(4, num_frames=F,
                                             frame_hw=(48, 64), seed=0)
    t = pipeline.pipeline_timesteps(F)
    model = registry.create_model("gaze_grcn", n_lstm_steps=t, batch_size=2,
                                  compute_dtype="float32", rnn_state_size=8,
                                  dim_cnn_proj=16)
    exp = ExperimentConfig()
    exp.model = model.cfg
    exp.schedule.max_steps = 2
    exp.schedule.steps_per_checkpoint = 2
    exp.schedule.steps_per_validation = 10
    exp.schedule.steps_per_logprint = 1

    tx = optax.adam(1e-3)
    c3d_params = c3d.init_params(jax.random.PRNGKey(0))
    gaze_params = model.init(jax.random.PRNGKey(1))
    state = fused.FusedTrainState(
        gaze_params, pipeline.init_fused_opt_state(tx, gaze_params),
        c3d_params, jnp.zeros((), jnp.int32))

    mesh = make_mesh(data_parallel=2, model_parallel=1)
    train_dir = str(tmp_path / "mesh_run")
    state = fused.fit_fused(model, state, tx, data, exp,
                            compute_dtype=jnp.float32,
                            train_dir=train_dir, mesh=mesh)
    assert int(state.step) == 2
    assert os.path.isdir(os.path.join(train_dir, "model"))

    # batch not divisible by the data axis -> loud error, not wrong math
    model3 = registry.create_model(
        "gaze_grcn", n_lstm_steps=t, batch_size=3,
        compute_dtype="float32", rnn_state_size=8, dim_cnn_proj=16)
    exp2 = ExperimentConfig()
    exp2.model = model3.cfg
    exp2.schedule.max_steps = 1
    with pytest.raises(ValueError, match="divisible"):
        fused.fit_fused(model3, state, tx, data, exp2,
                        compute_dtype=jnp.float32, mesh=mesh)


@pytest.mark.slow
def test_train_fused_cli_synthetic(tmp_path):
    from recurrent_gaze_prediction_tpu.cli import train_fused as cli

    train_dir = str(tmp_path / "cli_run")
    rc = cli.main([
        "--dataset", "synthetic", "--model", "gaze_grcn",
        "--num_frames", str(F), "--synthetic_clips", "4",
        "--valid_clips", "1", "--batch_size", "2",
        "--max_steps", "5", "--train_dir", train_dir,
        "--compute_dtype", "float32",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(train_dir, "config.json"))
    assert os.path.exists(os.path.join(train_dir, "metrics.jsonl"))
    with open(os.path.join(train_dir, "metrics.jsonl")) as f:
        lines = [line for line in f if "loss/train" in line]
    assert lines, "no train-loss records written"


@pytest.mark.slow
def test_load_fused_corpus_from_avi(tmp_path):
    """Real container formats end to end: .avi videos + raw .mat records ->
    process_gazemap -> load_fused_corpus gives aligned arrays."""
    cv2 = pytest.importorskip("cv2")
    import h5py

    from recurrent_gaze_prediction_tpu.cli import process_gazemap

    videos = tmp_path / "videos"
    gaze = tmp_path / "gazemap"
    videos.mkdir()
    gaze.mkdir()
    rng = np.random.RandomState(0)
    oh, ow = 36, 48
    for ci in range(2):
        clip = f"clip{ci:03d}"
        writer = cv2.VideoWriter(str(videos / (clip + ".avi")),
                                 cv2.VideoWriter_fourcc(*"MJPG"), 10,
                                 (ow, oh))
        assert writer.isOpened()
        for _ in range(F + 8):  # longer than num_frames: truncation path
            writer.write(rng.randint(0, 255, (oh, ow, 3), np.uint8))
        writer.release()
        with h5py.File(gaze / (clip + ".mat"), "w") as mat:
            grp = mat.create_group("data")
            for ui in range(2):
                user = grp.create_group(f"user{ui:02d}")
                raw = np.zeros((F + 8, oh, ow), np.uint8)
                raw[np.arange(F + 8), rng.randint(0, oh, F + 8),
                    rng.randint(0, ow, F + 8)] = 1
                user["gazemap"] = raw
                user["pupilsize"] = rng.rand(F + 8)

    rc = process_gazemap.main(["--glob", str(gaze / "*.mat"),
                               "--num_agents", "1"])
    assert rc == 0

    data = fused.load_fused_corpus(str(videos), str(gaze), num_frames=F,
                                   frame_hw=(40, 56))
    t = pipeline.pipeline_timesteps(F)
    assert data.video.shape == (2, F, 40, 56, 3)
    assert data.gazemaps.shape == (2, t, 49, 49)
    assert data.gazemaps.min() > 0  # blurred + floored
    assert sorted(data.clipnames) == ["clip000", "clip001"]


def test_load_fused_corpus_missing_inputs(tmp_path):
    with pytest.raises(ValueError, match="no videos"):
        fused.load_fused_corpus(str(tmp_path), str(tmp_path), num_frames=F)


@pytest.mark.slow
def test_load_fused_corpus_skips_allzero_gaze(tmp_path):
    """A clip whose gaze record is all-zero for every user is SKIPPED with
    a warning (like `data/crc.read_clip`), not a corpus-wide crash."""
    cv2 = pytest.importorskip("cv2")
    import h5py

    videos = tmp_path / "videos"
    gaze = tmp_path / "gazemap"
    videos.mkdir()
    gaze.mkdir()
    rng = np.random.RandomState(0)
    oh, ow = 36, 48
    for ci, zero in enumerate([False, True]):
        clip = f"clip{ci:03d}"
        writer = cv2.VideoWriter(str(videos / (clip + ".avi")),
                                 cv2.VideoWriter_fourcc(*"MJPG"), 10,
                                 (ow, oh))
        assert writer.isOpened()
        for _ in range(F):
            writer.write(rng.randint(0, 255, (oh, ow, 3), np.uint8))
        writer.release()
        with h5py.File(gaze / (clip + ".mat"), "w") as mat:
            grp = mat.create_group("data")
            user = grp.create_group("user00")
            maps = np.zeros((F, 49, 49), np.float32)
            if not zero:
                maps[np.arange(F), rng.randint(0, 49, F),
                     rng.randint(0, 49, F)] = 1.0
            user["gazemap49x49"] = maps

    data = fused.load_fused_corpus(str(videos), str(gaze), num_frames=F,
                                   frame_hw=(40, 56))
    assert data.clipnames == ["clip000"]  # the all-zero clip was skipped
    assert len(data) == 1


@pytest.mark.slow
def test_fit_fused_resume_matches_uninterrupted(tmp_path):
    """A preempted-and-resumed run must land on the SAME params as the
    uninterrupted run: the per-step RNG key is fold_in(seed, step), not a
    split chain replayed from the head on resume (round-3 review fix)."""
    import jax
    import jax.numpy as jnp
    import optax

    from recurrent_gaze_prediction_tpu.config import ExperimentConfig
    from recurrent_gaze_prediction_tpu.models import c3d

    # 2 clips, batch 2: every batch is the whole corpus, so the batch
    # stream is step-deterministic and any param divergence is RNG-driven
    data = fused.make_synthetic_fused_corpus(2, num_frames=F,
                                             frame_hw=(48, 64), seed=0)
    t = pipeline.pipeline_timesteps(F)

    def run(train_dir, max_steps, state=None):
        model = registry.create_model(
            "gaze_grcn", n_lstm_steps=t, batch_size=2,
            compute_dtype="float32", rnn_state_size=8, dim_cnn_proj=16)
        exp = ExperimentConfig()
        exp.model = model.cfg
        exp.schedule.max_steps = max_steps
        exp.schedule.steps_per_checkpoint = 2
        exp.schedule.steps_per_validation = 100
        exp.schedule.steps_per_logprint = 100
        tx = optax.adam(1e-3)
        if state is None:
            c3d_params = c3d.init_params(jax.random.PRNGKey(0))
            gaze_params = model.init(jax.random.PRNGKey(1))
            state = fused.FusedTrainState(
                gaze_params, pipeline.init_fused_opt_state(tx, gaze_params),
                c3d_params, jnp.zeros((), jnp.int32))
        return fused.fit_fused(model, state, tx, data, exp,
                               compute_dtype=jnp.float32,
                               train_dir=train_dir)

    # uninterrupted 4 steps
    full = run(str(tmp_path / "full"), 4)
    # interrupted: 2 steps, then a fresh process resumes to 4
    run(str(tmp_path / "resumed"), 2)
    resumed = run(str(tmp_path / "resumed"), 4)

    assert int(full.step) == int(resumed.step) == 4
    import jax

    paths_a = jax.tree_util.tree_flatten_with_path(full.gaze_params)[0]
    paths_b = jax.tree_util.tree_flatten_with_path(resumed.gaze_params)[0]
    for (path, a), (_, b) in zip(paths_a, paths_b, strict=True):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
            err_msg=f"gaze_params{jax.tree_util.keystr(path)}")


def test_gaze_targets_match_crc_loader_protocol(tmp_path):
    """_gaze_targets_for_clip must produce the SAME maps as the CRC
    loader for the same .mat record — root group name agnostic, NaN-pupil
    users excluded, gazelen-10 truncation, per-user [15::5] subsample,
    and the (W,H)->(H,W) swap (round-3 review: the fused loader trained
    on TRANSPOSED targets)."""
    import h5py

    from recurrent_gaze_prediction_tpu.data.gazemap import (
        apply_gaussian_filter,
        gazemap_key_and_sigma,
    )

    rng = np.random.RandomState(7)
    n_rec = 64
    # asymmetric one-hot records in the on-disk (T, W, H) convention:
    # a fixation at column c_x=40, row r_y=5 is stored as maps[t, 40, 5]
    rec_a = np.zeros((n_rec, 49, 49), np.float32)
    rec_a[np.arange(n_rec), 40, 5] = 1.0
    rec_b = np.zeros((n_rec, 49, 49), np.float32)
    rec_b[np.arange(n_rec), 10, 30] = 1.0
    nan_rec = np.zeros((n_rec, 49, 49), np.float32)
    nan_rec[:, 0, 0] = 1.0

    mat_path = tmp_path / "clip.mat"
    with h5py.File(mat_path, "w") as mat:
        grp = mat.create_group("whatever_matlab_named_it")  # not "data"
        u0 = grp.create_group("user00")
        u0["gazemap49x49"] = rec_a
        u0["pupilsize"] = np.ones(n_rec, np.float32)
        u1 = grp.create_group("user01")
        u1["gazemap49x49"] = rec_b
        u1["pupilsize"] = np.ones(n_rec, np.float32)
        u2 = grp.create_group("user02")  # NaN pupil: must be excluded
        u2["gazemap49x49"] = nan_rec
        u2["pupilsize"] = np.full(n_rec, np.nan, np.float32)

    num_frames = 160  # T = min(160//16, ceil(145/5)) = 10
    t = pipeline.pipeline_timesteps(num_frames)
    got = fused._gaze_targets_for_clip(str(mat_path), num_frames, (49, 49))

    # reference protocol by hand (crc_input_data_seq.py:261-295)
    gazelen = max(len(rec_a), len(rec_b)) - 10
    subs = [r[15:gazelen:5] for r in (rec_a, rec_b)]
    mean = np.mean(subs, axis=0)
    mean = np.swapaxes(mean, 1, 2).copy()  # (W,H) -> (H,W)
    _, sigma = gazemap_key_and_sigma(49, 49)
    apply_gaussian_filter(mean, sigma)
    want = mean[:t]
    if len(want) < t:
        want = np.concatenate(
            [want, np.repeat(want[-1:], t - len(want), axis=0)])
    np.testing.assert_allclose(got, want.astype(np.float32) + 1e-6,
                               rtol=1e-6, atol=1e-6)

    # orientation pin: fixation (x=40, y=5) must land at [row 5, col 40]
    hot = np.unravel_index(np.argmax(got[0]), got[0].shape)
    assert abs(hot[0] - 5) <= 1 and abs(hot[1] - 40) <= 1


def test_synthetic_fused_corpus_flicker_mode():
    """mode="flicker": gaze follows the TEMPORALLY flickering blob, the
    steady distractor has the same mean brightness — per-frame appearance
    cannot separate them (the A/B corpus for --finetune_c3d)."""
    data = fused.make_synthetic_fused_corpus(3, num_frames=F,
                                             frame_hw=(48, 64), seed=0,
                                             mode="flicker")
    t = pipeline.pipeline_timesteps(F)
    assert data.gazemaps.shape == (3, t, 49, 49)

    ci, ti = 1, t - 1
    fi = fused.FRAME_OFFSET + ti * fused.FRAME_STRIDE
    gy, gx = np.unravel_index(np.argmax(data.gazemaps[ci, ti]), (49, 49))
    fy, fx = int(gy / 48 * 47), int(gx / 48 * 63)
    # the gazed blob's pixels ALTERNATE between consecutive frames ...
    a = data.video[ci, fi, fy, fx].astype(int)
    b = data.video[ci, fi + 1, fy, fx].astype(int)
    assert abs(a - b).max() >= 100, (a, b)
    # ... around the same mean the steady distractor holds (120): both
    # blob brightness levels straddle it, background noise stays < 70
    assert {int(data.video[ci, fi, fy, fx, 0]),
            int(data.video[ci, fi + 1, fy, fx, 0])} == {60, 180}


def test_synthetic_fused_corpus_rejects_unknown_mode():
    with pytest.raises(ValueError, match="unknown corpus mode"):
        fused.make_synthetic_fused_corpus(2, num_frames=F, mode="nope")


@pytest.mark.slow
def test_fit_fused_learns_gaze_from_raw_video():
    """Learning evidence for the fused raw-video path (VERDICT r4 weak
    #1): train gaze_grcn from PIXELS through fit_fused (frozen random
    tower) on the bright-blob corpus and assert real held-out quality —
    the random C3D tower transmits the blob's position, the gaze model
    learns to decode it. Scaled for the CPU harness (12 steps at B=2 —
    measured CC 0.37/AUC 0.99 after just 4; asserted CC >= 0.3,
    AUC_Borji >= 0.9 vs chance 0.0/0.5); the full on-chip run (B=8,
    F=80, 400 steps) reaches held-out CC 0.86 / AUC_Borji 0.997 in 443 s
    (BENCHMARKS.md "Fused raw-video training rehearsal"). The reference
    cannot train from video at all (`extract_C3D_features.py:689-724` is
    an offline Caffe subprocess)."""
    import jax
    import jax.numpy as jnp
    import optax

    from recurrent_gaze_prediction_tpu.config import ExperimentConfig
    from recurrent_gaze_prediction_tpu.eval import evaluator
    from recurrent_gaze_prediction_tpu.models import c3d

    F_local, b = 32, 2
    t = pipeline.pipeline_timesteps(F_local)
    corpus = fused.make_synthetic_fused_corpus(
        10, num_frames=F_local, frame_hw=(48, 64), seed=0,
        walk_bounds=(0.25, 0.75))
    train_data, valid_data = corpus.split(2)

    model = registry.create_model("gaze_grcn", n_lstm_steps=t,
                                  batch_size=b, compute_dtype="float32")
    exp = ExperimentConfig()
    exp.model = model.cfg
    exp.schedule.max_steps = 12
    exp.schedule.steps_per_checkpoint = 10 ** 9
    exp.schedule.steps_per_validation = 10 ** 9
    exp.schedule.steps_per_logprint = 10
    exp.optimizer.initial_learning_rate = 1e-3

    tx = optax.adam(1e-3)
    gaze_params = model.init(jax.random.PRNGKey(1))
    c3d_params = c3d.init_params(jax.random.PRNGKey(2))
    state = fused.FusedTrainState(
        gaze_params, pipeline.init_fused_opt_state(tx, gaze_params),
        c3d_params, jnp.zeros((), jnp.int32))
    state = fused.fit_fused(model, state, tx, train_data, exp,
                            compute_dtype=jnp.float32)
    assert int(state.step) == 12

    predict = pipeline.make_fused_predict(model, num_frames=F_local,
                                          compute_dtype=jnp.float32)
    maps = np.asarray(predict(state.c3d_params, state.gaze_params,
                              jnp.asarray(valid_data.video,
                                          jnp.float32)), np.float32)
    gt = valid_data.gazemaps
    flat = gt.reshape(-1, 49 * 49)
    fix = np.zeros_like(flat)
    fix[np.arange(len(flat)), flat.argmax(axis=1)] = 1.0
    scores = evaluator.evaluate(
        maps.reshape(-1, 49, 49), gt.reshape(-1, 49, 49),
        fix.reshape(-1, 49, 49), metrics=("cc", "AUC_Borji"))
    assert scores["cc"] >= 0.3, scores
    assert scores["AUC_Borji"] >= 0.9, scores


def test_synthetic_fused_corpus_period_mode():
    """mode="period": both blobs flicker; only temporal FREQUENCY marks
    the gaze target (period 2 at +-35 vs period 4 at +-70 — equal mean
    per-frame |delta|, distractor carries MORE raw temporal energy)."""
    data = fused.make_synthetic_fused_corpus(3, num_frames=F,
                                             frame_hw=(48, 64), seed=0,
                                             mode="period")
    t = pipeline.pipeline_timesteps(F)
    ci, ti = 1, t - 1
    fi = fused.FRAME_OFFSET + ti * fused.FRAME_STRIDE
    gy, gx = np.unravel_index(np.argmax(data.gazemaps[ci, ti]), (49, 49))
    fy, fx = int(gy / 48 * 47), int(gx / 48 * 63)
    px = data.video[ci, fi - 4:fi + 4, fy, fx, 0].astype(int)
    # period-2: consecutive frames differ by ~70 (2*35, jitter +-30)
    deltas = np.abs(np.diff(px))
    assert deltas.mean() > 35, px
    # mean stays near 120 (both levels straddle it)
    assert 90 < px.mean() < 150, px
