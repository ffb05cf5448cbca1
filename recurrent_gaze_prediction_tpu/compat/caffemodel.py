"""Minimal Caffe .caffemodel reader for the C3D (Sports-1M) weights.

The reference consumes the pretrained `conv3d_deepnetA_sport1m_iter_1900000`
binary through the Caffe C++ tools; this module reads the weights directly
with a small protobuf WIRE-FORMAT walker — no caffe, no protoc schema
needed. Field numbers follow the C3D-v1.0 fork's caffe.proto (2014-era):

    NetParameter:       layers = 2 (repeated LayerParameter message)
    LayerParameter:     name = 4 (string), blobs = 6 (repeated BlobProto)
    BlobProto (5-D):    num=1, channels=2, length=3, height=4, width=5
                        (varints), data = 6 (packed float)

The same dimension order [num, channels, length, height, width] appears in
the C3D feature-blob files (`extract_C3D_features.py:13-76`), which is the
strongest in-repo evidence for the layout. A writer for the same format
lives here too so the parser is round-trip tested without the (external,
multi-hundred-MB) Sports-1M download.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import numpy as np

from ..utils import log


# ------------------------------------------------------------ wire format

def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        byte = buf[pos]
        pos += 1
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf: memoryview) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over one message's bytes.
    wire 0 -> int, wire 2 -> memoryview, wire 5 -> 4 raw bytes,
    wire 1 -> 8 raw bytes."""
    pos = 0
    end = len(buf)
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            value, pos = _read_varint(buf, pos)
        elif wire == 2:
            length, pos = _read_varint(buf, pos)
            value = buf[pos:pos + length]
            pos += length
        elif wire == 5:
            value = bytes(buf[pos:pos + 4])
            pos += 4
        elif wire == 1:
            value = bytes(buf[pos:pos + 8])
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire} (field {field})")
        yield field, wire, value


def _encode_varint(value: int) -> bytes:
    out = bytearray()
    while True:
        byte = value & 0x7F
        value >>= 7
        if value:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def _encode_field(field: int, wire: int, payload: bytes) -> bytes:
    return _encode_varint((field << 3) | wire) + payload


# ---------------------------------------------------------------- parsing

def _parse_blob(buf: memoryview) -> np.ndarray:
    dims = {}
    data: Optional[np.ndarray] = None
    shape7 = None
    for field, wire, value in _iter_fields(buf):
        if wire == 0 and 1 <= field <= 5:
            dims[field] = value
        elif field == 6 and wire == 2:            # C3D: packed float data
            data = np.frombuffer(bytes(value), dtype="<f4")
        elif field == 6 and wire == 5:            # unpacked float entry
            v = struct.unpack("<f", value)[0]
            data = (np.append(data, v) if data is not None
                    else np.array([v], np.float32))
        elif field == 5 and wire == 2 and 5 not in dims:
            # modern BlobProto fallback: data = 5 packed
            data = np.frombuffer(bytes(value), dtype="<f4")
        elif field == 7 and wire == 2 and data is None:
            # modern BlobShape { dims = 1 repeated varint }
            shape7 = [v for f, w, v in _iter_fields(value) if f == 1]
    if data is None:
        raise ValueError("blob without data")
    if shape7:
        return data.reshape(shape7).astype(np.float32)
    shape = [dims.get(i, 1) for i in range(1, 6)]
    if int(np.prod(shape)) != data.size:
        # header/dim mismatch: return flat rather than guessing
        log.warn("blob dims %s != data size %d; leaving flat", shape,
                 data.size)
        return data.astype(np.float32)
    return data.reshape(shape).astype(np.float32)


def parse_caffemodel(path: str) -> dict[str, list[np.ndarray]]:
    """.caffemodel -> {layer_name: [blob, ...]} (blobs shaped
    [num, channels, length, height, width])."""
    with open(path, "rb") as f:
        raw = memoryview(f.read())
    layers: dict[str, list[np.ndarray]] = {}
    for field, wire, value in _iter_fields(raw):
        if wire != 2 or field not in (2, 100):   # layers / layer
            continue
        name = None
        blobs = []
        name_field = 4 if field == 2 else 1      # V1 vs modern layer
        blob_field = 6 if field == 2 else 7
        for lf, lw, lv in _iter_fields(value):
            if lf == name_field and lw == 2:
                name = bytes(lv).decode("utf-8", "replace")
            elif lf == blob_field and lw == 2:
                blobs.append(_parse_blob(lv))
        if name and blobs:
            layers[name] = blobs
    return layers


def c3d_params_from_caffemodel(path: str) -> dict:
    """Sports-1M .caffemodel -> `models/c3d.init_params`-shaped pytree."""
    from ..models import c3d as c3d_model

    layers = parse_caffemodel(path)
    arrays = {}
    for name, blobs in layers.items():
        if len(blobs) < 2:
            continue
        w, b = blobs[0], blobs[1]
        b = b.reshape(-1)
        if w.ndim == 5 and w.shape[2] == 1 and name.startswith("fc"):
            w = w.reshape(w.shape[0], -1)       # fc blobs [out,in,1,1,1]
        arrays[name] = (w, b)
        log.info("caffemodel layer %s: w%s b%s", name, w.shape, b.shape)
    return c3d_model.params_from_caffe_arrays(arrays)


# ----------------------------------------------------------------- writer

def _encode_blob(blob: np.ndarray) -> bytes:
    blob = np.asarray(blob, np.float32)
    assert blob.ndim == 5
    out = b""
    for i, dim in enumerate(blob.shape, start=1):
        out += _encode_field(i, 0, _encode_varint(int(dim)))
    payload = blob.astype("<f4").tobytes()
    out += _encode_field(6, 2, _encode_varint(len(payload)) + payload)
    return out


def write_caffemodel(path: str, layers: dict[str, list[np.ndarray]]) -> None:
    """Write the C3D-era format (for round-trip tests)."""
    body = b""
    for name, blobs in layers.items():
        layer = _encode_field(4, 2, _encode_varint(len(name))
                              + name.encode())
        for blob in blobs:
            encoded = _encode_blob(blob)
            layer += _encode_field(6, 2, _encode_varint(len(encoded))
                                   + encoded)
        body += _encode_field(2, 2, _encode_varint(len(layer)) + layer)
    with open(path, "wb") as f:
        f.write(body)
