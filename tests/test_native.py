"""Native blob codec tests: build, parity with the NumPy codec, batch read."""

import numpy as np
import pytest

from recurrent_gaze_prediction_tpu import native
from recurrent_gaze_prediction_tpu.data import codec


def test_native_library_builds():
    assert native.available(), "libblobio.so failed to build"


def test_native_read_matches_numpy(tmp_path):
    rng = np.random.RandomState(0)
    blob = rng.rand(1, 512, 2, 7, 7).astype(np.float32)
    path = str(tmp_path / "a.conv5b")
    codec.write_binary_blob(path, blob)  # numpy writer
    native_read = native.read_blob(path)
    np.testing.assert_array_equal(native_read, blob)


def test_native_write_matches_numpy(tmp_path):
    rng = np.random.RandomState(1)
    blob = rng.rand(2, 3, 4, 5, 6).astype(np.float32)
    path = str(tmp_path / "b.blob")
    native.write_blob(path, blob)
    np.testing.assert_array_equal(codec.read_binary_blob(path), blob)


def test_batch_read_parallel(tmp_path):
    rng = np.random.RandomState(2)
    shape = (1, 512, 2, 7, 7)
    paths, blobs = [], []
    for i in range(20):
        blob = rng.rand(*shape).astype(np.float32)
        path = str(tmp_path / f"w{i:03d}.conv5b")
        codec.write_binary_blob(path, blob)
        paths.append(path)
        blobs.append(blob)
    out = native.read_blob_batch(paths, shape, n_threads=4)
    np.testing.assert_array_equal(out, np.stack(blobs))


def test_batch_read_reports_failures(tmp_path):
    shape = (1, 2, 2, 2, 2)
    good = str(tmp_path / "good.blob")
    codec.write_binary_blob(good, np.zeros(shape, np.float32))
    missing = str(tmp_path / "missing.blob")
    if native.available():
        with pytest.raises(IOError):
            native.read_blob_batch([good, missing], shape)


def test_framedec_decode_parity_with_pil(tmp_path):
    """Native threaded JPEG batch decoder: decode-only output is
    bit-identical to PIL (same libjpeg); resize within +-1."""
    from PIL import Image

    from recurrent_gaze_prediction_tpu import native

    rng = np.random.RandomState(0)
    paths = []
    for i in range(5):
        arr = rng.randint(0, 255, (60, 80, 3)).astype(np.uint8)
        p = str(tmp_path / f"{i:03d}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)

    ours = native.decode_jpeg_batch(paths, (60, 80))
    pil = np.stack([np.asarray(Image.open(p).convert("RGB"))
                    for p in paths])
    np.testing.assert_array_equal(ours, pil)

    resized = native.decode_jpeg_batch(paths, (98, 98))
    pil_r = np.stack([
        np.asarray(Image.open(p).convert("RGB").resize((98, 98),
                                                       Image.BILINEAR))
        for p in paths])
    assert np.abs(resized.astype(int) - pil_r.astype(int)).max() <= 2

    if native.framedec_available():
        with pytest.raises(IOError):
            native.decode_jpeg_batch([paths[0], str(tmp_path / "no.jpg")],
                                     (60, 80))


def test_load_frame_folder_native_backend(tmp_path):
    from PIL import Image

    from recurrent_gaze_prediction_tpu.data import video

    rng = np.random.RandomState(1)
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (50, 60, 3)).astype(
            np.uint8)).save(tmp_path / f"{i:06d}.jpg", quality=95)
    nat = video.load_frame_folder(str(tmp_path), image_hw=(50, 60),
                                  backend="native")
    pil = video.load_frame_folder(str(tmp_path), image_hw=(50, 60))
    np.testing.assert_array_equal(nat, pil)  # decode-only: bit-identical
