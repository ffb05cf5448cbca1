"""C3D binary blob codec + .c3d feature-file IO.

The blob format is defined by the C3D Caffe tools
(`/root/reference/.../extract_C3D_features.py:13-76`): a 5-int32 header
[num, channels, length, height, width] followed by the float32 payload in
row-major (num, channel, length, h, w) order. Per-video features are
aggregated into a pickled float32 array of per-window blobs
(`extract_C3D_features.py:763-798`), read back by the data loader and
reshaped to [T, 1024, 7, 7] with the (channel=512, length=2) axes folded
channel-major (`models/gaze_rnn.py:494-497`).

A C++ implementation of the same codec lives in `native/blobio.cc`
(threaded batch reads); this module is the NumPy reference implementation
and the fallback when the native library is not built.
"""

from __future__ import annotations

import pickle
import struct
from typing import Sequence

import numpy as np

_HEADER = struct.Struct("<5i")


def write_binary_blob(filename: str, blob: np.ndarray) -> None:
    """Write a 5-D [n, c, l, h, w] float32 blob in C3D binary format."""
    blob = np.ascontiguousarray(blob, dtype=np.float32)
    if blob.ndim != 5:
        raise ValueError(f"blob must be 5-D [n,c,l,h,w], got {blob.shape}")
    with open(filename, "wb") as f:
        f.write(_HEADER.pack(*blob.shape))
        f.write(blob.tobytes())


def read_binary_blob(filename: str) -> np.ndarray:
    """Read a C3D binary blob -> float32 array [n, c, l, h, w]."""
    with open(filename, "rb") as f:
        header = f.read(_HEADER.size)
        if len(header) != _HEADER.size:
            raise IOError(f"truncated blob header in {filename}")
        shape = _HEADER.unpack(header)
        count = int(np.prod(shape))
        raw = f.read(count * 4)
        if len(raw) != count * 4:
            raise IOError(f"truncated blob payload in {filename}")
        data = np.frombuffer(raw, dtype="<f4", count=count)
    return data.reshape(shape).astype(np.float32)


def write_c3d_file(filename: str, window_blobs: Sequence[np.ndarray]) -> None:
    """Aggregate per-window blobs into the pickled `.c3d` container
    (`extract_C3D_features.py:794-798`, pickle protocol 2 for compat)."""
    arr = np.array(window_blobs, dtype=np.float32)
    with open(filename, "wb") as f:
        pickle.dump(arr, f, protocol=2)


def read_c3d_file(filename: str) -> np.ndarray:
    """Read a `.c3d` pickle -> [T, 512, 2, 7, 7] (or squeezed variants)."""
    with open(filename, "rb") as f:
        arr = pickle.load(f, encoding="latin1")
    return np.asarray(arr, dtype=np.float32)


def fold_conv5b(features: np.ndarray) -> np.ndarray:
    """[..., 512, 2, 7, 7] -> [..., 1024, 7, 7], channel-major fold.

    Matches the reference's `reshape(-1, 1024, 7, 7)` on the raw blob
    layout: flat channel index = c3d_channel * 2 + temporal_slot
    (`models/gaze_rnn.py:497`, `models/extract_map.py:125-126`).
    """
    features = np.asarray(features)
    lead = features.shape[:-4]
    return features.reshape(*lead, 1024, 7, 7)


def load_c3d_for_model(filename: str) -> np.ndarray:
    """`.c3d` file -> [T, 1024, 7, 7] ready for the gaze models
    (squeeze singleton num dim, fold temporal into channels).

    The leading WINDOW axis is never squeezed: a single-window clip
    ([1, 1, 512, 2, 7, 7] or [1, 512, 2, 7, 7]) must still come back as
    [1, 1024, 7, 7]."""
    arr = read_c3d_file(filename)
    inner = tuple(i for i, s in enumerate(arr.shape) if s == 1 and i != 0)
    if inner:
        arr = arr.squeeze(axis=inner)
    if arr.shape[-2:] != (7, 7):
        raise ValueError(f"unexpected c3d spatial shape: {arr.shape}")
    if arr.ndim == 4 and arr.shape[1] == 1024:
        return arr
    return fold_conv5b(arr)
