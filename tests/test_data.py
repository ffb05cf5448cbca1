"""Data-pipeline tests on a synthetic on-disk dataset that follows the
reference container formats exactly (frames/.mat/.c3d folder layout)."""

import os
import pickle

import h5py
import numpy as np
import pytest
from PIL import Image

from recurrent_gaze_prediction_tpu.data import (
    DatasetLayout,
    gazemap,
    read_crc_data_sets,
    salicon,
    seq2batch,
    split_foldernames,
)

N_FRAMES = 120   # raw frames per clip
ORIG_H, ORIG_W = 36, 48


def _write_fake_dataset(root, n_clips=3, n_users=3, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "vid_frm"), exist_ok=True)
    os.makedirs(os.path.join(root, "gazemap"), exist_ok=True)
    os.makedirs(os.path.join(root, "vid_c3d"), exist_ok=True)
    for ci in range(n_clips):
        clip = f"actionclip{'test' if ci == n_clips - 1 else 'train'}{ci:05d}"
        fdir = os.path.join(root, "vid_frm", clip)
        os.makedirs(fdir, exist_ok=True)
        for fi in range(N_FRAMES):
            arr = rng.randint(0, 255, (98, 98, 3)).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(fdir, f"{fi:06d}.jpg"))

        # raw one-hot gaze per user + pupil, then derived keys
        with h5py.File(os.path.join(root, "gazemap", clip + ".mat"),
                       "w") as mat:
            grp = mat.create_group("data")
            for ui in range(n_users):
                user = grp.create_group(f"user{ui:02d}")
                raw = np.zeros((N_FRAMES, ORIG_H, ORIG_W), np.uint8)
                ys = rng.randint(0, ORIG_H, N_FRAMES)
                xs = rng.randint(0, ORIG_W, N_FRAMES)
                raw[np.arange(N_FRAMES), ys, xs] = 1
                user["gazemap"] = raw
                user["pupilsize"] = rng.rand(N_FRAMES).astype(np.float64)
            gazemap.process_mat_file(mat)

        # c3d windows: one per 16 frames
        n_windows = N_FRAMES // 16
        blobs = rng.rand(n_windows, 1, 512, 2, 7, 7).astype(np.float32)
        with open(os.path.join(root, "vid_c3d", clip + ".c3d"), "wb") as f:
            pickle.dump(blobs, f, protocol=2)
    return root


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("crc_data"))
    return _write_fake_dataset(root)


def test_process_mat_adds_keys(fake_root):
    path = os.path.join(fake_root, "gazemap")
    mat_files = sorted(os.listdir(path))
    with h5py.File(os.path.join(path, mat_files[0]), "r") as mat:
        user = list(mat.values())[0]["user00"]
        for key in ("gazemap49x49", "gazemap48x48", "gazemap7x7",
                    "fixation", "fixation_t", "fixation_r", "fixation_c"):
            assert key in user, key
        assert user["gazemap49x49"].shape == (N_FRAMES, 49, 49)
        # every frame had exactly one gaze point
        assert np.asarray(user["gazemap49x49"]).sum() == N_FRAMES


def test_resize_onehot_projection():
    x = np.zeros((1, 10, 10), np.uint8)
    x[0, 0, 0] = 1
    x[0, 9, 9] = 1
    out = gazemap.resize_onehot_tensor(x, (49, 49))
    assert out[0, 0, 0] and out[0, 48, 48]
    assert out.sum() == 2


def test_fill_gazemap_forward_fill():
    g = np.zeros((3, 4, 4), np.float32)
    g[0, 1, 1] = 1.0
    gazemap.fill_gazemap(g)
    assert g[1, 1, 1] == 1.0 and g[2, 1, 1] == 1.0


def test_fill_missing_frames_backfills_first():
    g = np.zeros((4, 4, 4), np.float32)
    g[2, 3, 3] = 1.0  # frames 0,1 empty; 2 has gaze; 3 empty
    gazemap.fill_missing_frames(g)
    assert g[0, 3, 3] == 1.0 and g[1, 3, 3] == 1.0 and g[3, 3, 3] == 1.0
    assert g.sum() == 4  # one fixation per frame (add_gazemap.py:160-162)
    with pytest.raises(ValueError):
        gazemap.fill_missing_frames(np.zeros((3, 2, 2), np.float32))


def test_seq2batch_chunking():
    data = np.arange(100).reshape(100, 1)
    wins = seq2batch(data, 42)
    assert len(wins) == 3  # 2 full + overlapping tail
    np.testing.assert_array_equal(wins[0].ravel(), np.arange(42))
    np.testing.assert_array_equal(wins[1].ravel(), np.arange(42, 84))
    np.testing.assert_array_equal(wins[2].ravel(), np.arange(58, 100))
    # short clip -> tiled
    short = np.arange(10).reshape(10, 1)
    wins = seq2batch(short, 42)
    assert len(wins) == 1 and len(wins[0]) == 42
    np.testing.assert_array_equal(wins[0].ravel()[:20],
                                  np.tile(np.arange(10), 2))


def test_read_crc_data_sets_end_to_end(fake_root, tmp_path):
    layout = DatasetLayout(root=fake_root)
    data = read_crc_data_sets(
        98, 98, 49, 49, dataset="crc", layouts={"crc": layout},
        seq_len=8, use_cache=True, cache_dir=str(tmp_path / "cache"),
        parallel_jobs=2)
    assert data.train is not None
    batch = data.train.next_batch(1)
    assert batch["frames"].shape == (1, 8, 98, 98, 3)
    assert batch["gazemaps"].shape == (1, 8, 49, 49)
    assert batch["fixationmaps"].shape == (1, 8, 49, 49)
    assert batch["c3d"].shape == (1, 8, 1024, 7, 7)
    assert batch["pupils"].shape == (1, 8)
    assert batch["frames"].dtype == np.float32
    assert 0.0 <= batch["frames"].min() and batch["frames"].max() <= 1.0
    # blurred gazemaps are min-max normalized per frame
    assert batch["gazemaps"].max() <= 1.0 + 1e-6
    # fixation maps are integer counts of user fixations
    assert batch["fixationmaps"].max() >= 1.0

    # cache round-trip
    data2 = read_crc_data_sets(
        98, 98, 49, 49, dataset="crc", layouts={"crc": layout},
        seq_len=8, use_cache=True, cache_dir=str(tmp_path / "cache"),
        split_modes="train", parallel_jobs=2)
    np.testing.assert_array_equal(data.train.frames, data2.train.frames)


def test_hollywood_official_split_threshold(monkeypatch):
    """>1600 folders triggers the official 823-train/884-test split
    (crc_input_data_seq.py:467-476)."""
    from recurrent_gaze_prediction_tpu.data import crc as crc_mod

    layout = crc_mod.DatasetLayout(root="/nonexistent")
    names = ([f"actioncliptrain{i:05d}" for i in range(900)]
             + [f"actioncliptest{i:05d}" for i in range(900)])
    monkeypatch.setattr(crc_mod.DatasetLayout, "clip_folders",
                        lambda self: list(names))
    split = crc_mod.split_foldernames("hollywood2", layout)
    assert len(split["train"]) == 823
    assert len(split["valid"]) == 884 - 1
    assert all("test" not in n for n in split["train"])


def test_split_foldernames_hollywood_ordering(fake_root):
    layout = DatasetLayout(root=fake_root)
    split = split_foldernames("hollywood2", layout)
    all_names = split["train"] + split["valid"] + split["test"]
    # 'test' clips must sort after train clips
    test_positions = [i for i, n in enumerate(all_names) if "test" in n]
    train_positions = [i for i, n in enumerate(all_names) if "test" not in n]
    assert max(train_positions) < min(test_positions)


def test_salicon_loader(tmp_path):
    rng = np.random.RandomState(0)
    root = str(tmp_path / "salicon")
    img_dir = os.path.join(root, "images", "train98x98")
    map_dir = os.path.join(root, "saliencymaps", "train49x49")
    fix_dir = os.path.join(root, "fixations", "train")
    for d in (img_dir, map_dir, fix_dir):
        os.makedirs(d)
    for i in range(10):
        name = f"img{i:03d}.jpg"
        Image.fromarray(rng.randint(0, 255, (98, 98, 3)).astype(
            np.uint8)).save(os.path.join(img_dir, name))
        Image.fromarray(rng.randint(0, 255, (49, 49)).astype(
            np.uint8)).save(os.path.join(map_dir, name))
        fix = np.zeros((36, 48), np.uint8)
        fix[rng.randint(0, 36, 5), rng.randint(0, 48, 5)] = 1
        np.save(os.path.join(fix_dir, name + ".npy"), fix)

    sal = salicon.SaliconData(root=root, use_val_split=True).build()
    assert len(sal.train) == 8 and len(sal.valid) == 2
    images, maps, fixs = sal.train.next_batch(4)
    assert images.shape == (4, 98, 98, 3)
    assert maps.shape == (4, 49, 49)
    assert len(fixs) == 4
    assert images.max() <= 1.0


def test_seq_helpers():
    from recurrent_gaze_prediction_tpu.data.seq import (
        chunk_streams,
        subsample_indices,
    )

    idx = subsample_indices(40)
    np.testing.assert_array_equal(idx, np.arange(15, 40, 5))

    streams = {"a": np.arange(10).reshape(10, 1), "names": list("abcdefghij")}
    out = chunk_streams(streams, seq_len=4)
    assert out["a"].shape == (3, 4, 1)      # 2 full + tail
    assert len(out["names"]) == 3 and len(out["names"][0]) == 4


def test_layouts_for_crcxh2():
    """crcxh2 needs BOTH constituent layouts (ADVICE r1: evaluate/create_
    records crashed with KeyError 'crc')."""
    from recurrent_gaze_prediction_tpu.data.crc import layouts_for

    both = layouts_for("crcxh2", "/data")
    assert set(both) == {"crc", "hollywood2"}
    assert both["crc"].root == "/data/crc"
    assert both["hollywood2"].root == "/data/hollywood2"
    single = layouts_for("crc", "/data")
    assert set(single) == {"crc"} and single["crc"].root == "/data"


def test_process_gazemap_cli_agent_sharding(tmp_path, monkeypatch):
    """The preprocessing CLI processes exactly its AGENT_ID share of the
    .mat files (reference `process_gazemap.py:146-153`) and adds the
    derived keys in place."""
    import h5py

    from recurrent_gaze_prediction_tpu.cli import process_gazemap as cli

    rng = np.random.RandomState(0)
    paths = []
    for i in range(4):
        path = str(tmp_path / f"clip{i:02d}.mat")
        with h5py.File(path, "w") as mat:
            grp = mat.create_group("data")
            user = grp.create_group("user00")
            raw = np.zeros((20, 16, 16), np.uint8)
            raw[np.arange(20), rng.randint(0, 16, 20),
                rng.randint(0, 16, 20)] = 1
            user["gazemap"] = raw
            user["pupilsize"] = rng.rand(20)
        paths.append(path)

    monkeypatch.setenv("AGENT_ID", "1")
    rc = cli.main(["--glob", str(tmp_path / "*.mat"), "--num_agents", "2"])
    assert rc == 0
    processed = []
    for path in paths:
        with h5py.File(path, "r") as mat:
            processed.append("gazemap49x49" in mat["data"]["user00"])
    # agent 1 of 2 handles odd indices only
    assert processed == [False, True, False, True]

    monkeypatch.delenv("AGENT_ID")
    rc = cli.main(["--glob", str(tmp_path / "*.mat")])
    assert rc == 0
    with h5py.File(paths[0], "r") as mat:
        user = mat["data"]["user00"]
        assert "gazemap49x49" in user and "fixation_t" in user


def test_cache_key_includes_data_root(fake_root, tmp_path):
    """One cache_dir reused across two --data_root corpora must not serve
    the wrong arrays (round-2 VERDICT: cache key omitted layout.root)."""
    import os

    cache_dir = str(tmp_path / "cache")
    layout = DatasetLayout(root=fake_root)
    read_crc_data_sets(
        98, 98, 49, 49, dataset="crc", layouts={"crc": layout},
        seq_len=8, use_cache=True, cache_dir=cache_dir,
        split_modes="train", parallel_jobs=2)
    first = set(os.listdir(cache_dir))
    assert first, "expected a cache file to be written"

    # same corpus reachable under a DIFFERENT root path -> different key
    alias = str(tmp_path / "alias_root")
    os.symlink(fake_root, alias)
    read_crc_data_sets(
        98, 98, 49, 49, dataset="crc", layouts={"crc": DatasetLayout(root=alias)},
        seq_len=8, use_cache=True, cache_dir=cache_dir,
        split_modes="train", parallel_jobs=2)
    second = set(os.listdir(cache_dir)) - first
    assert second, "a different data root must produce a different cache key"


def test_read_clip_single_window_c3d(tmp_path):
    """A clip whose .c3d holds ONE window must come back with channel dim
    1024, not squeezed to [512,2,7,7] (round-3 review: a bare np.squeeze
    dropped the window axis and crashed the split-level np.stack)."""
    import pickle as pkl

    root = str(tmp_path / "one")
    _write_fake_dataset(root, n_clips=1, n_users=2, seed=3)
    clip = sorted(os.listdir(os.path.join(root, "vid_frm")))[0]
    one = np.random.RandomState(0).rand(1, 1, 512, 2, 7, 7).astype(
        np.float32)
    with open(os.path.join(root, "vid_c3d", clip + ".c3d"), "wb") as f:
        pkl.dump(one, f, protocol=2)
    from recurrent_gaze_prediction_tpu.data.crc import read_clip
    out = read_clip(DatasetLayout(root=root), clip, 98, 98, 49, 49)
    assert out is not None
    assert out["c3d"].shape[1:] == (1024, 7, 7)
    assert len(out["c3d"]) == 1  # truncated to the common min length


def test_iter_batches_covers_tail_exactly_once():
    """n % batch_size != 0: every window must be yielded exactly once —
    the cursor-wrapping iteration duplicated the head and dropped the
    tail, corrupting create_records shards (round-3 review)."""
    from recurrent_gaze_prediction_tpu.data.datasets import ClipDataset

    n = 10
    ds = ClipDataset(
        frames=np.arange(n, dtype=np.float32).reshape(n, 1, 1, 1, 1),
        gazemaps=np.zeros((n, 1, 2, 2), np.float32),
        fixationmaps=np.zeros((n, 1, 2, 2), np.float32),
        c3d=np.zeros((n, 1, 4, 7, 7), np.float32),
        pupils=np.zeros((n, 1), np.float32),
        clipnames=[f"c{i}" for i in range(n)],
    )
    ds.next_batch(4)  # move the persistent cursor: iter must ignore it
    batches = list(ds.iter_batches(4))
    assert [len(b["clipnames"]) for b in batches] == [4, 4, 2]
    seen = np.concatenate([b["frames"].ravel() for b in batches])
    np.testing.assert_array_equal(np.sort(seen), np.arange(n))
    # max_instances caps INSTANCES, including a short tail
    batches = list(ds.iter_batches(4, max_instances=5))
    assert [len(b["clipnames"]) for b in batches] == [4, 1]


def test_normalize_pupils_matches_reference_zscore_axis():
    """The reference normalizes pupils with `stats.zscore(asarray(list))`
    on an [N_windows, T] array — scipy's DEFAULT axis=0, i.e. each time
    position standardized independently (round-4 review: a global
    z-score silently diverged). Pin against scipy + the reference's
    min-max step with its precedence bug fixed (documented divergence)."""
    import scipy.stats

    from recurrent_gaze_prediction_tpu.data.crc import _normalize_pupils

    rng = np.random.RandomState(3)
    # time positions with very different statistics so axis matters
    windows = (rng.rand(20, 8) * np.linspace(1, 9, 8) +
               np.linspace(0, 4, 8)).astype(np.float64)

    z = scipy.stats.zscore(windows)          # reference line, axis=0
    lo, hi = z.min(), z.max()
    want = (z - lo) / (hi - lo)              # intended (fixed) min-max

    got = _normalize_pupils(windows)
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-6)
