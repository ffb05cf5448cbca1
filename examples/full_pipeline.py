"""Full-workflow rehearsal: the reference's research loop, end to end.

Drives ONE synthetic corpus through all seven CLI stages in the exact
order the reference user ran them
(`/root/reference/C3D/.../extract_C3D_features_script.py:12-21` ->
`models/train_gaze.py:137-157` -> `models/evaluate_gaze.py:287-305` ->
`models/extract_map.py:241-254` -> `models/create_tfrecords.py:157-203` ->
`models/action_classification.py:384`):

  0. synthesize corpus  (.avi videos + raw HDF5 gaze .mat files)
  1. process_gazemap    (.mat gains gazemap49x49/7x7/fixation_* keys)
  2. extract_features   (.avi -> .c3d blobs + frame JPEG dirs)
  3. train_gaze         (dataset crc over the corpus -> checkpoint)
  4. evaluate_gaze      (valid split -> overall.txt)
  5. extract_map        (bulk inference -> {clip}.gazemap.npy + 7x7)
  6. create_records     (predicted maps + labels -> record shards)
  7. action_classification (gaze-attention classifier over the shards)
  8. extract_features --attention_maps_root (the reference's gaze-weighted
     C3D re-extraction variant, closing the loop)

Each stage boundary asserts the artifact format the next stage consumes
(mat keys, blob shapes, checkpoint layout, npy shapes, shard schema).

Run:  python examples/full_pipeline.py [--work_dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_CLIPS = 6          # crc split 60/40 -> train 3 / valid 2 / test 1
N_FRAMES = 80        # -> 5 c3d windows, 13 subsampled frames, n=5/clip
ORIG_H, ORIG_W = 36, 48
SEQ_LEN = 4
ACTION_CLASSES = ("AnswerPhone", "DriveCar", "Eat")  # of the 13


def _clip_name(i: int) -> str:
    return f"clip{i:05d}"


def synthesize_corpus(work: str, seed: int = 0) -> tuple[str, str]:
    """Stage 0: .avi videos + RAW gaze .mat files (one-hot per-user
    'gazemap' + 'pupilsize' only — the derived keys are stage 1's job),
    following the reference container formats exactly."""
    import h5py

    try:
        import cv2
    except ImportError as e:  # pragma: no cover
        raise SystemExit(f"OpenCV required for the rehearsal: {e}")

    videos = os.path.join(work, "videos")
    root = os.path.join(work, "root")
    os.makedirs(videos, exist_ok=True)
    os.makedirs(os.path.join(root, "gazemap"), exist_ok=True)
    rng = np.random.RandomState(seed)

    for ci in range(N_CLIPS):
        clip = _clip_name(ci)
        writer = cv2.VideoWriter(
            os.path.join(videos, clip + ".avi"),
            cv2.VideoWriter_fourcc(*"MJPG"), 10, (ORIG_W * 2, ORIG_H * 2))
        assert writer.isOpened(), "cv2 VideoWriter failed"
        for fi in range(N_FRAMES):
            frame = rng.randint(0, 80, (ORIG_H * 2, ORIG_W * 2, 3),
                                np.uint8)
            x = (5 * fi + 17 * ci) % (ORIG_W * 2 - 8)
            frame[:, x:x + 8] = (0, 0, 255)
            writer.write(frame)
        writer.release()

        with h5py.File(os.path.join(root, "gazemap", clip + ".mat"),
                       "w") as mat:
            grp = mat.create_group("data")
            for ui in range(3):
                user = grp.create_group(f"user{ui:02d}")
                raw = np.zeros((N_FRAMES, ORIG_H, ORIG_W), np.uint8)
                ys = rng.randint(0, ORIG_H, N_FRAMES)
                xs = rng.randint(0, ORIG_W, N_FRAMES)
                raw[np.arange(N_FRAMES), ys, xs] = 1
                user["gazemap"] = raw
                user["pupilsize"] = rng.rand(N_FRAMES).astype(np.float64)
    return videos, root


def run(work: str, platform: str = "cpu") -> dict:
    # The rehearsal runs tiny shapes through many small jit programs —
    # CPU finishes in minutes, while a remote-relay TPU backend pays a
    # relay round-trip per program (and hangs outright if a killed
    # client left the relay wedged). Default to CPU EXPLICITLY:
    # `os.environ.setdefault` is not enough on hosts where the
    # environment already exports JAX_PLATFORMS=<relay backend>.
    from recurrent_gaze_prediction_tpu.utils import (
        honor_jax_platforms_env,
        wait_for_device,
    )

    os.environ["JAX_PLATFORMS"] = platform
    honor_jax_platforms_env()
    if platform != "cpu":
        # device path opted into: wait out a wedged relay first, and fall
        # back to CPU rather than hanging stage 2 if it never heals
        if not wait_for_device(max_wait_s=600.0):
            print("# device never answered; falling back to cpu")
            os.environ["JAX_PLATFORMS"] = "cpu"
            honor_jax_platforms_env()

    import h5py

    from recurrent_gaze_prediction_tpu.cli import (
        action_classification,
        create_records,
        evaluate_gaze,
        extract_features,
        extract_map,
        process_gazemap,
        train_gaze,
    )
    from recurrent_gaze_prediction_tpu.data import codec

    artifacts: dict = {}

    # ---- 0. corpus --------------------------------------------------
    videos, root = synthesize_corpus(work)
    artifacts["videos"] = videos
    artifacts["data_root"] = root
    print(f"[0/8] corpus: {N_CLIPS} videos + raw .mat under {work}")

    # ---- 1. process_gazemap -----------------------------------------
    rc = process_gazemap.main(
        ["--glob", os.path.join(root, "gazemap", "*.mat"),
         "--num_agents", "1"])
    assert rc == 0, "process_gazemap failed"
    with h5py.File(os.path.join(root, "gazemap",
                                _clip_name(0) + ".mat"), "r") as mat:
        user = mat["data"]["user00"]
        for key in ("gazemap49x49", "gazemap48x48", "gazemap7x7",
                    "fixation", "fixation_t", "fixation_r", "fixation_c"):
            assert key in user, f".mat missing {key} after process_gazemap"
        assert user["gazemap49x49"].shape == (N_FRAMES, 49, 49)
    print("[1/8] process_gazemap: derived keys added in place")

    # ---- 2. extract_features (.avi -> .c3d + frame dirs) ------------
    c3d_dir = os.path.join(root, "vid_c3d")
    frm_dir = os.path.join(root, "vid_frm")
    rc = extract_features.main([
        "--videos_root", videos, "--out_dir", c3d_dir,
        "--frames_dir", frm_dir, "--compute_dtype", "float32",
        "--batch_windows", "4"])
    assert rc == 0, "extract_features failed"
    n_windows = N_FRAMES // 16
    for ci in range(N_CLIPS):
        clip = _clip_name(ci)
        feats = codec.load_c3d_for_model(
            os.path.join(c3d_dir, clip + ".c3d"))
        assert feats.shape == (n_windows, 1024, 7, 7), feats.shape
        assert np.isfinite(feats).all()
        # raw pickle container is the reference's per-window blob list
        with open(os.path.join(c3d_dir, clip + ".c3d"), "rb") as f:
            blobs = np.asarray(pickle.load(f, encoding="latin1"))
        assert blobs.shape[-2:] == (7, 7)
        jpgs = os.listdir(os.path.join(frm_dir, clip))
        assert len(jpgs) == N_FRAMES, "frame dump incomplete"
    print(f"[2/8] extract_features: {N_CLIPS} .c3d blobs "
          f"({n_windows} windows each) + frame dirs")

    # ---- 3. train_gaze over the corpus ------------------------------
    train_dir = os.path.join(work, "run")
    rc = train_gaze.main([
        "--model", "gaze_grcn", "--dataset", "crc", "--data_root", root,
        "--n_lstm_steps", str(SEQ_LEN), "--batch_size", "2",
        "--max_steps", "4", "--compute_dtype", "float32",
        "--train_dir", train_dir])
    assert rc == 0, "train_gaze failed"
    assert os.path.isfile(os.path.join(train_dir, "config.json"))
    assert os.path.isdir(os.path.join(train_dir, "model"))
    artifacts["train_dir"] = train_dir
    print("[3/8] train_gaze: checkpoint + config.json written")

    # ---- 4. evaluate_gaze -------------------------------------------
    rc = evaluate_gaze.main([
        "--train_dir", train_dir, "--data_root", root,
        "--metrics", "cc", "sim"])
    assert rc == 0, "evaluate_gaze failed"
    overall = os.path.join(train_dir, "evaluation", "overall.txt")
    assert os.path.isfile(overall)
    scores = dict(line.split(": ") for line in
                  open(overall).read().strip().splitlines())
    assert all(np.isfinite(float(v)) for v in scores.values()), scores
    artifacts["overall"] = overall
    print(f"[4/8] evaluate_gaze: {scores}")

    # ---- 5. extract_map (bulk inference) ----------------------------
    maps_dir = os.path.join(work, "maps")
    rc = extract_map.main([
        "--train_dir", train_dir, "--clips_root", frm_dir,
        "--c3d_root", c3d_dir, "--out_dir", maps_dir,
        "--n_lstm_steps", "8", "--batch_size", "2"])
    assert rc == 0, "extract_map failed"
    for ci in range(N_CLIPS):
        clip = _clip_name(ci)
        maps = np.load(os.path.join(maps_dir, clip + ".gazemap.npy"))
        small = np.load(os.path.join(maps_dir, clip + ".gazemap7x7.npy"))
        assert maps.shape[1:] == (49, 49) and maps.dtype == np.float16
        assert small.shape[1:] == (7, 7)
    artifacts["maps_dir"] = maps_dir
    print(f"[5/8] extract_map: 49x49 + 7x7 .npy for {N_CLIPS} clips")

    # ---- 6. create_records ------------------------------------------
    clipsets = os.path.join(work, "ClipSets")
    os.makedirs(clipsets, exist_ok=True)
    rng = np.random.RandomState(1)
    for action in ACTION_CLASSES:
        for split in ("train", "test"):
            with open(os.path.join(clipsets,
                                   f"{action}_{split}.txt"), "w") as f:
                for ci in range(N_CLIPS):
                    label = 1 if rng.rand() > 0.5 else -1
                    f.write(f"{_clip_name(ci)} {label}\n")
    records_dir = os.path.join(work, "records")
    rc = create_records.main([
        "--train_dir", train_dir, "--out_dir", records_dir,
        "--split", "train", "--data_root", root,
        "--clipsets_dir", clipsets])
    assert rc == 0, "create_records failed"
    shards = sorted(os.listdir(records_dir))
    assert shards, "no record shards written"
    with np.load(os.path.join(records_dir, shards[0])) as shard:
        assert set(shard.files) >= {"c3d", "frames", "gaze_pred",
                                    "gaze_gt", "labels"}
        assert shard["c3d"].shape[1:] == (1024, 7, 7)
        assert shard["gaze_pred"].shape[1:] == (49, 49)
        assert shard["labels"].shape[1:] == (13,)
    artifacts["records_dir"] = records_dir
    print(f"[6/8] create_records: {len(shards)} shard(s)")

    # ---- 7. action_classification -----------------------------------
    scores_json = os.path.join(work, "action_scores.json")
    rc = action_classification.main([
        "--records_glob", os.path.join(records_dir, "train-*.npz"),
        "--head", "NN", "--use_gazemap", "--batch_size", "8",
        "--max_iter", "30", "--out", scores_json])
    assert rc == 0, "action_classification failed"
    action_scores = json.load(open(scores_json))
    assert 0.0 <= action_scores["hamming_loss"] <= 1.0
    assert np.isfinite(action_scores["mean_average_precision"])
    artifacts["action_scores"] = scores_json
    print(f"[7/8] action_classification: {action_scores}")

    # ---- 8. attention-variant C3D re-extraction ---------------------
    att_dir = os.path.join(work, "vid_c3d_att")
    rc = extract_features.main([
        "--videos", os.path.join(videos, _clip_name(0) + ".avi"),
        "--out_dir", att_dir, "--attention_maps_root", maps_dir,
        "--compute_dtype", "float32", "--batch_windows", "4"])
    assert rc == 0, "attention extract_features failed"
    att = codec.load_c3d_for_model(
        os.path.join(att_dir, _clip_name(0) + ".c3d"))
    plain = codec.load_c3d_for_model(
        os.path.join(c3d_dir, _clip_name(0) + ".c3d"))
    assert att.shape == plain.shape
    assert not np.allclose(att, plain), "attention had no effect"
    print("[8/8] attention-variant features differ from plain — done")

    return artifacts


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--work_dir", default=None,
                        help="default: a fresh temp dir")
    parser.add_argument("--platform", default="cpu",
                        help="jax platform for the rehearsal (default "
                             "cpu — fastest for these tiny shapes; pass "
                             "tpu/axon to exercise the device path)")
    args = parser.parse_args(argv)
    work = args.work_dir
    if work is None:
        import tempfile

        work = tempfile.mkdtemp(prefix="rgp_full_pipeline_")
    os.makedirs(work, exist_ok=True)
    artifacts = run(work, platform=args.platform)
    print("\nAll 8 stages passed. Artifacts:")
    for key, value in artifacts.items():
        print(f"  {key}: {value}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
