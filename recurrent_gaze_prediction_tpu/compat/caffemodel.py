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

def _parse_blob(buf: memoryview, legacy_4d: bool = False) -> np.ndarray:
    """BlobProto bytes -> array, across the three schema generations:

      C3D/V1 era:  num=1 channels=2 length=3 height=4 width=5 (varints),
                   data = 6 (packed or unpacked float)
      modern/V0:   shape = 7 (BlobShape{dim=1 repeated varint}),
                   data = 5 (or 6 in V0, packed float); legacy 4-D dims
                   num=1 channels=2 height=3 width=4

    The field-3/4 varints are ambiguous between the 5-D (`length`) and
    4-D layouts, so the caller passes `legacy_4d` from the NetParameter
    framing (modern/V0 BlobProtos are 4-D). A `shape` submessage always
    wins.
    """
    dims = {}
    data = None  # np.ndarray (packed) or list (unpacked entries)
    shape7 = None
    for field, wire, value in _iter_fields(buf):
        if wire == 0 and 1 <= field <= 5:
            dims[field] = value
        elif field in (5, 6) and wire == 2:
            # packed float data: field 6 (C3D/V1) or field 5 (modern).
            # A wire-2 field 5 cannot be the `width` varint, so there is
            # no clash with the 5-D dims. The proto wire format allows a
            # packed repeated field to be SPLIT across several chunks
            # (streamed/merged messages) — concatenate instead of
            # overwriting earlier chunks.
            chunk = np.frombuffer(bytes(value), dtype="<f4")
            if isinstance(data, np.ndarray):
                data = np.concatenate([data, chunk])
            elif isinstance(data, list):
                data.extend(chunk.tolist())
            else:
                data = chunk
        elif field in (5, 6) and wire == 5:        # unpacked float entry
            # accumulate in a list: np.append per element is O(n^2) and
            # takes hours on conv5b/fc-scale blobs
            if not isinstance(data, list):
                data = list(data) if data is not None else []
            data.append(struct.unpack("<f", value)[0])
        elif field == 7 and wire == 2:
            # BlobShape { dim = 1 repeated varint, packed or not } — parse
            # regardless of field order (serializers commonly emit data=5
            # before shape=7)
            shape7 = []
            for f, w, v in _iter_fields(value):
                if f != 1:
                    continue
                if w == 0:                       # unpacked varint
                    shape7.append(v)
                elif w == 2:                     # packed varints
                    pos = 0
                    while pos < len(v):
                        dim, pos = _read_varint(v, pos)
                        shape7.append(dim)
    if data is None:
        raise ValueError("blob without data")
    if isinstance(data, list):
        data = np.asarray(data, np.float32)
    if shape7:
        return data.reshape(shape7).astype(np.float32)
    shape5 = [dims.get(i, 1) for i in range(1, 6)]  # 5-D [n,c,l,h,w]
    shape4 = [dims.get(i, 1) for i in range(1, 5)]  # legacy 4-D [n,c,h,w]
    candidates = ([shape4, shape5] if (legacy_4d and 5 not in dims)
                  else [shape5, shape4])
    for shape in candidates:
        if int(np.prod(shape)) == data.size:
            return data.reshape(shape).astype(np.float32)
    # header/dim mismatch: return flat rather than guessing
    log.warn("blob dims %s != data size %d; leaving flat", shape5,
             data.size)
    return data.astype(np.float32)


def _parse_layer_message(buf: memoryview, name_field: int, blob_field: int,
                         legacy_4d: bool = False
                         ) -> tuple[Optional[str], list]:
    name = None
    blobs = []
    for lf, lw, lv in _iter_fields(buf):
        if lf == name_field and lw == 2:
            name = bytes(lv).decode("utf-8", "replace")
        elif lf == blob_field and lw == 2:
            blobs.append(_parse_blob(lv, legacy_4d=legacy_4d))
    return name, blobs


def parse_caffemodel(path: str) -> dict[str, list[np.ndarray]]:
    """.caffemodel -> {layer_name: [blob, ...]}.

    Accepts all three NetParameter framings:

      V1 (the C3D fork, BVLC `V1LayerParameter`):
        layers = 2 { name = 4, blobs = 6 }
      V0 (oldest, `LayerConnection`/`V0LayerParameter`):
        layers = 2 { layer = 1 { name = 1, blobs = 50 } }
      modern (caffe 1.0 `LayerParameter`):
        layer = 100 { name = 1, blobs = 7 }
    """
    with open(path, "rb") as f:
        raw = memoryview(f.read())
    layers: dict[str, list[np.ndarray]] = {}
    for field, wire, value in _iter_fields(raw):
        if wire != 2 or field not in (2, 100):   # layers / layer
            continue
        if field == 100:                          # modern LayerParameter
            name, blobs = _parse_layer_message(value, 1, 7, legacy_4d=True)
        else:                                     # V1LayerParameter
            name, blobs = _parse_layer_message(value, 4, 6)
            if not blobs:
                # V0 fallback: nested V0LayerParameter at field 1
                for lf, lw, lv in _iter_fields(value):
                    if lf == 1 and lw == 2:
                        v0_name, v0_blobs = _parse_layer_message(
                            lv, 1, 50, legacy_4d=True)
                        if v0_blobs:
                            name = name or v0_name
                            blobs = v0_blobs
                        break
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
        if w.ndim == 5 and name.startswith("fc"):
            # InnerProduct blobs appear as (out,in,1,1,1) in the C3D-era
            # writer AND as (1,1,1,out,in) in V1-era NetParameters; strip
            # singleton dims and require exactly a 2-D matrix left over
            nontrivial = [d for d in w.shape if d != 1]
            if len(nontrivial) != 2:
                raise ValueError(
                    f"fc blob {name} has shape {w.shape}; cannot infer "
                    f"(out, in) matrix")
            w = w.reshape(nontrivial)
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
