"""crcxh2 concatenated-dataset loading + sharded fused-pipeline tests."""

import os
import pickle

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from recurrent_gaze_prediction_tpu import registry
from recurrent_gaze_prediction_tpu.data import (
    DatasetLayout,
    gazemap,
    read_crc_data_sets,
)

# >60s on the virtual-CPU harness: deselected by default (pyproject addopts
# -m "not slow"); run everything with `pytest -m ""`.
pytestmark = pytest.mark.slow

N_FRAMES = 90


def _make_root(base, n_clips, prefix, seed, orig=(20, 20)):
    rng = np.random.RandomState(seed)
    root = str(base)
    for sub in ("vid_frm", "gazemap", "vid_c3d"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for ci in range(n_clips):
        clip = f"{prefix}{ci:05d}"
        fdir = os.path.join(root, "vid_frm", clip)
        os.makedirs(fdir, exist_ok=True)
        for fi in range(N_FRAMES):
            Image.fromarray(rng.randint(0, 255, (98, 98, 3)).astype(
                np.uint8)).save(os.path.join(fdir, f"{fi:05d}.jpg"))
        with h5py.File(os.path.join(root, "gazemap", clip + ".mat"),
                       "w") as mat:
            grp = mat.create_group("data")
            for ui in range(2):
                user = grp.create_group(f"user{ui}")
                raw = np.zeros((N_FRAMES,) + orig, np.uint8)
                raw[np.arange(N_FRAMES),
                    rng.randint(0, orig[0], N_FRAMES),
                    rng.randint(0, orig[1], N_FRAMES)] = 1
                user["gazemap"] = raw
                user["pupilsize"] = rng.rand(N_FRAMES)
            gazemap.process_mat_file(mat)
        blobs = rng.rand(N_FRAMES // 16, 1, 512, 2, 7, 7).astype(np.float32)
        with open(os.path.join(root, "vid_c3d", clip + ".c3d"), "wb") as f:
            pickle.dump(blobs, f, protocol=2)
    return root


def test_crcxh2_concatenates_both_datasets(tmp_path):
    crc_root = _make_root(tmp_path / "crc", 2, "actionclipcrc", 0)
    h2_root = _make_root(tmp_path / "h2", 2, "actioncliptrain", 1)
    layouts = {"crc": DatasetLayout(root=crc_root),
               "hollywood2": DatasetLayout(root=h2_root)}
    data = read_crc_data_sets(98, 98, 49, 49, dataset="crcxh2",
                              layouts=layouts, seq_len=5, use_cache=False,
                              parallel_jobs=2)
    # both sources contribute windows somewhere across the splits
    names = []
    for split in (data.train, data.valid, data.test):
        if split is not None:
            names.extend(split.clipnames)
    assert any("crc" in n for n in names)
    assert any("train" in n for n in names)
    batch = (data.train or data.valid or data.test).next_batch(1)
    assert batch["frames"].shape[1] == 5


def test_crcxh2_mixed_original_scale_fixations(tmp_path):
    """crcxh2 with fixation_original_scale=True across datasets whose
    trackers ran at DIFFERENT resolutions: the loader must fall back to a
    ragged object array (not crash in np.stack), the evaluator must
    flatten it per frame, per-frame metrics must score it, and
    AUC_shuffled must raise a clear error (code-review r2 finding)."""
    from recurrent_gaze_prediction_tpu.eval import evaluator, metrics_np

    crc_root = _make_root(tmp_path / "crc", 2, "actionclipcrc", 0,
                          orig=(20, 20))
    h2_root = _make_root(tmp_path / "h2", 2, "actioncliptrain", 1,
                         orig=(24, 30))
    layouts = {"crc": DatasetLayout(root=crc_root),
               "hollywood2": DatasetLayout(root=h2_root)}
    data = read_crc_data_sets(98, 98, 49, 49, dataset="crcxh2",
                              layouts=layouts, seq_len=5, use_cache=False,
                              fixation_original_scale=True,
                              parallel_jobs=2)
    # hollywood2's "actioncliptrain" clips all land in train alongside
    # crc's 60% -> train mixes both resolutions and must go ragged
    ds = data.train
    assert ds is not None and ds.fixationmaps.dtype == np.dtype(object)

    def fake_predict(params, frames, c3d):
        b, t = frames.shape[:2]
        maps = jax.random.uniform(jax.random.PRNGKey(0), (b, t, 49, 49))
        return maps / maps.sum((-2, -1), keepdims=True)

    ret = evaluator.generate(fake_predict, {}, ds, batch_size=1,
                             max_instances=2)
    fix = ret["fixationmaps"]
    assert len(fix) == len(ret["pred_gazemaps"])
    # per-frame numpy-protocol metrics handle ragged maps
    score = metrics_np.saliency_score(
        "cc", list(ret["pred_gazemaps"]), list(ret["gt_gazemaps"]),
        list(fix), rng=np.random.RandomState(0))
    assert np.isfinite(score)
    if fix.dtype == object and len(
            {np.asarray(f).shape for f in fix}) > 1:
        with pytest.raises(ValueError, match="resolution"):
            metrics_np.build_other_map_union(
                list(fix), rng=np.random.RandomState(0))

    # evaluate() with the default on_device=True must fall back to the
    # NumPy protocol on ragged maps instead of crashing jnp.asarray
    scores = evaluator.evaluate(ret["pred_gazemaps"], ret["gt_gazemaps"],
                                fix, metrics=("cc", "sim"), on_device=True)
    assert np.isfinite(scores["cc"]) and np.isfinite(scores["sim"])


def test_sharded_fused_pipeline_on_mesh():
    """The raw-video -> C3D -> GRCN pipeline jit-partitioned over the
    8-device data axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from recurrent_gaze_prediction_tpu.models import c3d, pipeline
    from recurrent_gaze_prediction_tpu.parallel import make_mesh

    b, f = 8, 16  # 1 window, T=1 (kept tiny: full C3D runs twice on CPU)
    t = pipeline.pipeline_timesteps(f)
    model = registry.create_model("gaze_grcn", n_lstm_steps=t, batch_size=b,
                                  compute_dtype="float32",
                                  rnn_state_size=8, dim_cnn_proj=16)
    c3d_params = c3d.init_params(jax.random.PRNGKey(0))
    gaze_params = model.init(jax.random.PRNGKey(1))
    frames = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (b, f, 40, 48, 3)).astype(np.float32))

    local = pipeline.extract_and_predict(c3d_params, gaze_params, model,
                                         frames, compute_dtype=jnp.float32)

    mesh = make_mesh(data_parallel=8, model_parallel=1)
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    fn = jax.jit(
        lambda cp, gp, fr: pipeline.extract_and_predict(
            cp, gp, model, fr, compute_dtype=jnp.float32),
        in_shardings=(jax.tree_util.tree_map(lambda _: repl, c3d_params),
                      jax.tree_util.tree_map(lambda _: repl, gaze_params),
                      batch_sh),
        out_shardings=batch_sh)
    sharded = fn(c3d_params, gaze_params, jax.device_put(frames, batch_sh))
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(local),
                               rtol=1e-4, atol=1e-5)
