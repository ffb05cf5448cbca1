"""Action-classification subsystem tests."""

import os

import numpy as np
import pytest

from recurrent_gaze_prediction_tpu.action import (
    ActionClassifier,
    ActionHParams,
    evaluate,
    iter_record_batches,
    load_clipset_labels,
    multi_hot,
    read_record_shard,
    write_record_shard,
)

# >60s on the virtual-CPU harness: deselected by default (pyproject addopts
# -m "not slow"); run everything with `pytest -m ""`.
pytestmark = pytest.mark.slow


def _fake_records(n=32, seed=0, learnable=True):
    """Synthetic frame records where class c correlates with c3d channel c."""
    rng = np.random.RandomState(seed)
    labels = np.zeros((n, 13), np.float32)
    labels[np.arange(n), rng.randint(0, 13, n)] = 1.0
    c3d = rng.rand(n, 1024, 7, 7).astype(np.float32) * 0.1
    if learnable:
        for i in range(n):
            c = int(np.argmax(labels[i]))
            c3d[i, c] += 1.0
    return {
        "c3d": c3d,
        "frames": rng.rand(n, 98, 98, 3).astype(np.float32),
        "gaze_pred": rng.rand(n, 49, 49).astype(np.float32),
        "gaze_gt": rng.rand(n, 49, 49).astype(np.float32),
        "labels": labels,
    }


def test_record_shard_roundtrip(tmp_path):
    fields = _fake_records(8)
    path = str(tmp_path / "shard0.npz")
    write_record_shard(path, **fields)
    back = read_record_shard(path)
    for key in fields:
        np.testing.assert_array_equal(fields[key], back[key])


def test_iter_record_batches(tmp_path):
    paths = []
    for i in range(3):
        fields = _fake_records(10, seed=i)
        path = str(tmp_path / f"shard{i}.npz")
        write_record_shard(path, **fields)
        paths.append(path)
    batches = list(iter_record_batches(paths, batch_size=8))
    assert len(batches) == 3  # 30 frames -> 3 full batches of 8
    for batch in batches:
        assert batch["c3d"].shape == (8, 1024, 7, 7)
        assert batch["labels"].shape == (8, 13)


def test_clipset_labels(tmp_path):
    d = str(tmp_path / "ClipSets")
    os.makedirs(d)
    with open(os.path.join(d, "AnswerPhone_train.txt"), "w") as f:
        f.write("clip001 1\nclip002 -1\n")
    with open(os.path.join(d, "Kiss_train.txt"), "w") as f:
        f.write("clip001 1\nclip002 1\n")
    labels = load_clipset_labels(d, "train")
    assert labels["clip001"] == [0, 1]
    assert labels["clip002"] == [1]
    np.testing.assert_array_equal(multi_hot([0, 1])[:3], [1, 1, 0])


@pytest.mark.parametrize("use_gazemap", [False, True])
def test_nn_classifier_learns(use_gazemap):
    hp = ActionHParams(batch_size=8, max_iter=60, use_gazemap=use_gazemap,
                       learning_rate=0.003)
    clf = ActionClassifier(hp)
    data = _fake_records(64, learnable=True)

    def batches():
        for _ in range(hp.max_iter):
            idx = np.random.RandomState(_).randint(0, 64, hp.batch_size)
            yield {k: v[idx] for k, v in data.items()}

    losses = clf.fit(batches())
    # per-step losses are single random 8-of-64 batches and Adam at this
    # lr oscillates once the tiny corpus is memorized (mAP below is the
    # real quality bar), so assert the optimizer clearly descended rather
    # than comparing two arbitrary single-batch draws
    assert min(losses) < 0.5 * losses[0]
    scores = clf.predict({k: v[:16] for k, v in data.items()})
    result = evaluate(data["labels"][:16], scores)
    assert result["mean_average_precision"] > 0.3  # well above 1/13 chance


def test_svm_classifier_runs():
    hp = ActionHParams(batch_size=8, max_iter=10, head="SVM")
    clf = ActionClassifier(hp)
    data = _fake_records(16)
    losses = clf.fit([{k: v[:8] for k, v in data.items()}] * 10)
    assert np.isfinite(losses).all()


def test_evaluate_metrics_perfect_prediction():
    y = np.zeros((4, 13), np.float32)
    y[np.arange(4), [0, 3, 5, 7]] = 1.0
    result = evaluate(y, y)
    assert result["hamming_loss"] == 0.0
    assert result["zero_one_loss"] == 0.0
    assert result["mean_average_precision"] == 1.0


def test_classifier_save_load_roundtrip(tmp_path):
    hp = ActionHParams(batch_size=8, max_iter=5, use_gazemap=True)
    clf = ActionClassifier(hp)
    data = _fake_records(16)
    clf.fit([{k: v[:8] for k, v in data.items()}] * 5)
    path = str(tmp_path / "clf_params")
    clf.save(path)

    loaded = ActionClassifier.load(path, hp)
    np.testing.assert_allclose(clf.predict(data), loaded.predict(data),
                               rtol=1e-6)


def test_svm_compat_flag_replicates_reference_hinge():
    """`svm_signed_labels=False` reproduces the reference's EXACT loss
    (`/root/reference/models/action_classification.py:250-254`): raw {0,1}
    multi-hot labels in the hinge, 0.5*||W||^2 + 50 * sum(max(0, 1-y*f)).
    Absent classes then contribute a constant 1 with zero gradient — the
    documented reference bug, replicable on demand for strict A/B runs."""
    from recurrent_gaze_prediction_tpu.action.classification import loss_fn

    rng = np.random.RandomState(3)
    data = _fake_records(8, seed=3)
    params = {
        "svm_W": rng.randn(1024 * 49, 13).astype(np.float32) * 1e-3,
        "svm_b": rng.randn(13).astype(np.float32) * 1e-2,
    }
    batch = {"c3d": data["c3d"], "labels": data["labels"]}

    # reference formula, transcribed in NumPy
    flat = data["c3d"].reshape(8, -1)
    logits = flat @ params["svm_W"] + params["svm_b"]
    hinge = np.maximum(0.0, 1.0 - data["labels"] * logits).sum()
    ref_loss = 0.5 * np.square(params["svm_W"]).sum() + 50.0 * hinge

    hp_compat = ActionHParams(batch_size=8, head="SVM",
                              svm_signed_labels=False)
    got = float(loss_fn(params, batch, hp_compat, compute_dtype=np.float32))
    np.testing.assert_allclose(got, ref_loss, rtol=1e-5)

    # the default (signed) loss differs whenever any label is 0
    hp_fixed = ActionHParams(batch_size=8, head="SVM")
    fixed = float(loss_fn(params, batch, hp_fixed, compute_dtype=np.float32))
    assert abs(fixed - ref_loss) > 1.0


def test_svm_suppresses_negative_classes():
    """With signed hinge labels (reference bug fixed: {0,1} labels give
    absent classes zero gradient), a trained SVM drives absent-class
    margins negative; evaluate(threshold=0.0) then scores margins at the
    SVM's actual decision boundary."""
    hp = ActionHParams(batch_size=8, max_iter=200, head="SVM")
    clf = ActionClassifier(hp)
    data = _fake_records(64, learnable=True)

    def batches():
        for i in range(hp.max_iter):
            idx = np.random.RandomState(i).randint(0, 64, hp.batch_size)
            yield {k: v[idx] for k, v in data.items()}

    clf.fit(batches())
    margins = clf.predict({k: v[:32] for k, v in data.items()})
    labels = data["labels"][:32]
    # absent classes sit below the decision boundary on average, present
    # classes above — impossible with the unsigned-label hinge (absent
    # classes were unconstrained)
    assert margins[labels == 0].mean() < 0.0 < margins[labels == 1].mean()
    result = evaluate(labels, margins, threshold=0.0)
    assert result["hamming_loss"] < 0.5


def test_gaze_attention_improves_action_map():
    """The reason the reference's action stack exists: gaze attention
    HELPS classification (`action_classification.py:210-240`). On the
    attention corpus (label pattern hidden at the gazed cell, 48
    distractor cells polluting an attention-less pool —
    `scripts/action_attention_study.make_attention_corpus`), the NN head
    with use_gazemap=True must beat the same head without it by a wide
    margin. Full-scale study (1500 train / 1500 iters, CPU ~6 min):
    attn mAP 0.603 vs no-attn 0.367 (BENCHMARKS.md "Gaze attention");
    scaled thresholds here leave room for run noise."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.action_attention_study import (
        make_attention_corpus,
        run_head,
    )

    train = make_attention_corpus(800, seed=0)
    test = make_attention_corpus(300, seed=100)
    with_attn = run_head("NN", True, train, test, max_iter=800,
                         batch_size=64, seed=0, learning_rate=0.01)
    without = run_head("NN", False, train, test, max_iter=800,
                       batch_size=64, seed=0, learning_rate=0.01)
    assert with_attn["mAP"] >= 0.45, (with_attn, without)
    assert with_attn["mAP"] >= without["mAP"] + 0.08, (with_attn, without)
