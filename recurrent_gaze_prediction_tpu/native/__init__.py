"""ctypes bindings for the native libraries (libblobio.so, libframedec.so).

Build with `make -C recurrent_gaze_prediction_tpu/native`; at import the
libraries are compiled on demand if a toolchain is present, and every
entry point falls back to a pure-Python path (`data/codec.py` / PIL) when
a shared library is unavailable, so the framework never hard-depends on
the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

from ..utils import log

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libblobio.so")
_lib: Optional[ctypes.CDLL] = None
_build_attempted = False


def _try_build() -> None:
    global _build_attempted
    if _build_attempted:
        return
    _build_attempted = True
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
    except Exception as e:
        log.warn("native blobio build failed (NumPy fallback in use): %s", e)


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _try_build()
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.blobio_read_header.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_int32)]
    lib.blobio_read.argtypes = [ctypes.c_char_p,
                                ctypes.POINTER(ctypes.c_int32),
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.c_int64]
    lib.blobio_write.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_int32),
                                 ctypes.POINTER(ctypes.c_float)]
    lib.blobio_read_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
    ]
    for fn in (lib.blobio_read_header, lib.blobio_read, lib.blobio_write,
               lib.blobio_read_batch):
        fn.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def read_blob(path: str) -> np.ndarray:
    """Native single-blob read; NumPy fallback otherwise."""
    lib = get_lib()
    if lib is None:
        from ..data import codec
        return codec.read_binary_blob(path)
    shape = (ctypes.c_int32 * 5)()
    rc = lib.blobio_read_header(path.encode(), shape)
    if rc != 0:
        raise IOError(f"blobio_read_header({path}) -> {rc}")
    dims = tuple(shape)
    out = np.empty(dims, np.float32)
    rc = lib.blobio_read(path.encode(), shape,
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                         out.size)
    if rc != 0:
        raise IOError(f"blobio_read({path}) -> {rc}")
    return out


def write_blob(path: str, blob: np.ndarray) -> None:
    lib = get_lib()
    if lib is None:
        from ..data import codec
        codec.write_binary_blob(path, blob)
        return
    blob = np.ascontiguousarray(blob, np.float32)
    assert blob.ndim == 5
    shape = (ctypes.c_int32 * 5)(*blob.shape)
    rc = lib.blobio_write(path.encode(), shape,
                          blob.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise IOError(f"blobio_write({path}) -> {rc}")


# --------------------------------------------------------- frame decoding

_framedec: Optional[ctypes.CDLL] = None
_FRAMEDEC_PATH = os.path.join(_DIR, "libframedec.so")


def get_framedec() -> Optional[ctypes.CDLL]:
    global _framedec
    if _framedec is not None:
        return _framedec
    if not os.path.exists(_FRAMEDEC_PATH):
        _try_build()
    if not os.path.exists(_FRAMEDEC_PATH):
        return None
    lib = ctypes.CDLL(_FRAMEDEC_PATH)
    lib.framedec_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
    ]
    lib.framedec_decode_batch.restype = ctypes.c_int
    _framedec = lib
    return _framedec


def framedec_available() -> bool:
    return get_framedec() is not None


def decode_jpeg_batch(paths: Sequence[str], out_hw: tuple[int, int],
                      n_threads: int = 8) -> np.ndarray:
    """Threaded native JPEG batch decode (+ bilinear resize) ->
    [N, H, W, 3] uint8. Decode-only (source size == out size) is
    bit-identical to PIL (same libjpeg); resized output uses
    half-pixel-center bilinear (cv2 semantics), which differs slightly
    from PIL's antialiased BILINEAR. Raises IOError naming the first
    failing files.
    """
    lib = get_framedec()
    if lib is None:
        from PIL import Image

        frames = []
        for p in paths:
            img = Image.open(p).convert("RGB")
            if img.size != (out_hw[1], out_hw[0]):
                img = img.resize((out_hw[1], out_hw[0]), Image.BILINEAR)
            frames.append(np.asarray(img))
        return np.stack(frames)

    n = len(paths)
    out = np.empty((n, out_hw[0], out_hw[1], 3), np.uint8)
    statuses = np.zeros(n, np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.framedec_decode_batch(
        c_paths, n, out_hw[0], out_hw[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_threads)
    if failures:
        bad = [paths[i] for i in np.nonzero(statuses)[0]]
        raise IOError(f"decode_jpeg_batch: {failures} failures, "
                      f"e.g. {bad[:3]}")
    return out


def read_blob_batch(paths: Sequence[str], blob_shape: Sequence[int],
                    n_threads: int = 8) -> np.ndarray:
    """Decode many same-shape blob files in parallel ->
    [len(paths), *blob_shape]."""
    blob_shape = tuple(blob_shape)
    count = int(np.prod(blob_shape))
    lib = get_lib()
    if lib is None:
        from ..data import codec
        return np.stack([
            codec.read_binary_blob(p).reshape(blob_shape) for p in paths])

    n = len(paths)
    out = np.empty((n,) + blob_shape, np.float32)
    statuses = np.zeros(n, np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.blobio_read_batch(
        c_paths, n, count,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads)
    if failures:
        bad = [paths[i] for i in np.nonzero(statuses)[0]]
        raise IOError(f"blobio_read_batch: {failures} failures, e.g. {bad[:3]}")
    return out
