"""CLI smoke tests: train -> evaluate -> extract, all on synthetic data."""

import json
import os
import pickle

import numpy as np
import pytest

from recurrent_gaze_prediction_tpu.cli import (
    evaluate_gaze,
    extract_map,
    pretrain_shallownet,
    train_gaze,
)

# >60s on the virtual-CPU harness: deselected by default (pyproject addopts
# -m "not slow"); run everything with `pytest -m ""`.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    train_dir = str(tmp_path_factory.mktemp("run"))
    rc = train_gaze.main([
        "--model", "gaze_grcn77", "--dataset", "synthetic",
        "--max_steps", "5", "--n_lstm_steps", "4", "--batch_size", "2",
        "--synthetic_clips", "4", "--compute_dtype", "float32",
        "--train_dir", train_dir,
    ])
    assert rc == 0
    return train_dir


def test_train_cli_outputs(trained_run):
    assert os.path.exists(os.path.join(trained_run, "config.json"))
    assert os.path.isdir(os.path.join(trained_run, "model"))
    with open(os.path.join(trained_run, "metrics.jsonl")) as f:
        records = [json.loads(line) for line in f]
    assert any("loss/train" in r for r in records)


def test_evaluate_cli(trained_run, tmp_path):
    out_dir = str(tmp_path / "eval")
    rc = evaluate_gaze.main([
        "--train_dir", trained_run, "--out_dir", out_dir,
        "--metrics", "cc", "sim",
    ])
    assert rc == 0
    overall = open(os.path.join(out_dir, "overall.txt")).read()
    assert "cc:" in overall and "sim:" in overall
    scores = open(os.path.join(out_dir, "scores.txt")).read().splitlines()
    assert scores[0].startswith("frame")
    assert len(scores) > 1
    # overall.txt IS the nanmean of the scores.txt columns: the CLI scores
    # every frame exactly once and derives the aggregate from the same
    # per-frame vectors (no second metric pass)
    header = scores[0].split("\t")[1:]
    cols = np.array([[float(v) for v in line.split("\t")[1:]]
                     for line in scores[1:]])
    agg = dict(line.split(": ") for line in overall.strip().splitlines())
    for j, metric in enumerate(header):
        np.testing.assert_allclose(float(agg[metric]),
                                   np.nanmean(cols[:, j]), atol=1e-5)


def test_extract_map_cli(trained_run, tmp_path):
    # fake LSMDC-style clips: frames + .c3d
    from PIL import Image

    rng = np.random.RandomState(0)
    clips_root = str(tmp_path / "clips")
    out_dir = str(tmp_path / "maps")
    for name in ("clipA", "clipB"):
        cdir = os.path.join(clips_root, name)
        os.makedirs(cdir)
        for i in range(40):
            Image.fromarray(rng.randint(0, 255, (98, 98, 3)).astype(
                np.uint8)).save(os.path.join(cdir, f"{i:04d}.jpg"))
        blobs = rng.rand(3, 1, 512, 2, 7, 7).astype(np.float32)
        with open(os.path.join(clips_root, name + ".c3d"), "wb") as f:
            pickle.dump(blobs, f, protocol=2)

    rc = extract_map.main([
        "--train_dir", trained_run, "--clips_root", clips_root,
        "--out_dir", out_dir, "--n_lstm_steps", "6", "--batch_size", "2",
    ])
    assert rc == 0
    maps = np.load(os.path.join(out_dir, "clipA.gazemap.npy"))
    assert maps.shape[1:] == (7, 7)  # grcn77 emits 7x7
    # skip-if-exists resume
    rc2 = extract_map.main([
        "--train_dir", trained_run, "--clips_root", clips_root,
        "--out_dir", out_dir, "--n_lstm_steps", "6", "--batch_size", "2",
    ])
    assert rc2 == 0


def test_pretrain_shallownet_cli(tmp_path):
    out = str(tmp_path / "shallownet_params")
    rc = pretrain_shallownet.main([
        "--dataset", "synthetic", "--max_steps", "2", "--batch_size", "8",
        "--out", out,
    ])
    assert rc == 0
    assert os.path.exists(out)


def test_train_cli_missing_data_root():
    """Real datasets without --data_root exit with a clear error, not a
    KeyError (ADVICE r1)."""
    assert train_gaze.main(["--dataset", "crc", "--max_steps", "1"]) == 1


def test_crcxh2_train_and_numpy_protocol_eval(tmp_path):
    """crcxh2 end-to-end through the CLIs (ADVICE r1 mediums): the
    evaluate/create_records layout table must contain BOTH constituent
    datasets, and --numpy_protocol (original-scale fixation maps) must not
    reach the fixed-shape on-device per-frame metrics."""
    from test_data import _write_fake_dataset

    root = str(tmp_path / "data")
    for name in ("crc", "hollywood2"):
        _write_fake_dataset(os.path.join(root, name), n_clips=3)

    train_dir = str(tmp_path / "run")
    rc = train_gaze.main([
        "--model", "gaze_grcn77", "--dataset", "crcxh2",
        "--data_root", root, "--max_steps", "2", "--n_lstm_steps", "6",
        "--batch_size", "2", "--compute_dtype", "float32",
        "--train_dir", train_dir,
    ])
    assert rc == 0

    # real datasets get the reference TRAINING-ENTRY defaults
    # (train_gaze.py:74-97): lr 1e-4 and 100/20/100 cadences; CLI flags
    # (batch_size=2 here) still win
    cfg = json.load(open(os.path.join(train_dir, "config.json")))
    assert cfg["model"]["batch_size"] == 2
    assert cfg["optimizer"]["initial_learning_rate"] == 1e-4
    assert cfg["schedule"]["steps_per_validation"] == 20
    assert cfg["schedule"]["steps_per_evaluation"] == 100
    assert cfg["schedule"]["steps_per_checkpoint"] == 100

    out_dir = str(tmp_path / "eval")
    rc = evaluate_gaze.main([
        "--train_dir", train_dir, "--out_dir", out_dir,
        "--data_root", root, "--numpy_protocol", "--metrics", "cc", "sim",
    ])
    assert rc == 0
    overall = open(os.path.join(out_dir, "overall.txt")).read()
    assert "cc:" in overall and "sim:" in overall
    scores = open(os.path.join(out_dir, "scores.txt")).read().splitlines()
    assert len(scores) > 1  # header + per-frame rows


def test_evaluator_clipnames_per_frame():
    """generate() returns per-frame stacks; clipnames must align (one name
    per FRAME, not per window — ADVICE r1 low)."""
    import jax

    from recurrent_gaze_prediction_tpu.data import synthetic
    from recurrent_gaze_prediction_tpu.eval import evaluator

    t = 4
    data = synthetic.make_clip_windows(4, t, seed=0)

    def predict(params, frames, c3d):
        return np.zeros((frames.shape[0], t, 49, 49), np.float32)

    ret = evaluator.generate(predict, {}, data, batch_size=2,
                             max_instances=None)
    assert len(ret["clipnames"]) == len(ret["pred_gazemaps"])
    assert ret["clipnames"][0] == ret["clipnames"][t - 1]
    assert ret["clipnames"][t] != ret["clipnames"][t - 1]


def test_extract_map_streaming(tmp_path):
    """--streaming exports the FULL clip length with carried state, not the
    reference's truncate-to-n_lstm_steps protocol."""
    train_dir = str(tmp_path / "run")
    rc = train_gaze.main([
        "--model", "gaze_grcn", "--dataset", "synthetic",
        "--max_steps", "2", "--n_lstm_steps", "4", "--batch_size", "2",
        "--synthetic_clips", "4", "--compute_dtype", "float32",
        "--train_dir", train_dir,
    ])
    assert rc == 0

    rng = np.random.RandomState(0)
    clips_root = str(tmp_path / "clips")
    out_dir = str(tmp_path / "maps")
    os.makedirs(os.path.join(clips_root, "longclip"))
    # 10 c3d windows -> longer than n_lstm_steps=4 AND chunk_len=4
    blobs = rng.rand(10, 1, 512, 2, 7, 7).astype(np.float32)
    with open(os.path.join(clips_root, "longclip.c3d"), "wb") as f:
        pickle.dump(blobs, f, protocol=2)

    rc = extract_map.main([
        "--train_dir", train_dir, "--clips_root", clips_root,
        "--out_dir", out_dir, "--n_lstm_steps", "4", "--batch_size", "1",
        "--streaming", "--chunk_len", "4",
    ])
    assert rc == 0
    maps = np.load(os.path.join(out_dir, "longclip.gazemap.npy"))
    assert maps.shape == (10, 49, 49)  # full length, not clipped to 4
    assert np.isfinite(maps).all()
    small = np.load(os.path.join(out_dir, "longclip.gazemap7x7.npy"))
    assert small.shape == (10, 7, 7)


def test_pretrain_then_graft_into_gaze_training(tmp_path):
    """The reference's two-stage workflow end to end through the CLIs:
    SALICON-style ShallowNet pretraining -> graft into a gaze model
    (--shallownet_pretrain) -> gaze training with the grafted subtree
    FROZEN (lr=0 group, `gaze_rnn.py:459`)."""
    import jax
    import numpy as np

    from recurrent_gaze_prediction_tpu import registry
    from recurrent_gaze_prediction_tpu.train import (
        Checkpointer,
        create_train_state,
        load_params,
    )

    pretrained_path = str(tmp_path / "shallownet_params")
    rc = pretrain_shallownet.main([
        "--dataset", "synthetic", "--max_steps", "2", "--batch_size", "8",
        "--out", pretrained_path,
    ])
    assert rc == 0

    train_dir = str(tmp_path / "run")
    rc = train_gaze.main([
        "--model", "gaze_rnn", "--dataset", "synthetic",
        "--max_steps", "3", "--n_lstm_steps", "4", "--batch_size", "2",
        "--synthetic_clips", "4", "--compute_dtype", "float32",
        "--train_dir", train_dir,
        "--shallownet_pretrain", pretrained_path,
    ])
    assert rc == 0

    # restore the trained state and check the grafted subtree is (a) the
    # pretrained weights and (b) untouched by 3 train steps (frozen group)
    exp = Checkpointer.load_config(train_dir)
    model = registry.create_model(exp.model.name, exp.model)
    state, _ = create_train_state(model, exp.optimizer, jax.random.PRNGKey(0))
    restored = Checkpointer(train_dir).restore_latest(
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), state))
    assert restored is not None and int(restored.step) == 3
    pretrained = load_params(pretrained_path,
                             model.init(jax.random.PRNGKey(1))["shallownet"])
    for key, val in pretrained.items():
        np.testing.assert_array_equal(
            np.asarray(val), np.asarray(restored.params["shallownet"][key]),
            err_msg=f"shallownet/{key} changed despite frozen group")
    # and the non-frozen groups DID train
    fresh = model.init(jax.random.PRNGKey(0))
    r_leaves = jax.tree_util.tree_leaves(
        {k: v for k, v in restored.params.items() if k != "shallownet"})
    f_leaves = jax.tree_util.tree_leaves(
        {k: v for k, v in fresh.items() if k != "shallownet"})
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(r_leaves, f_leaves))
    assert moved
