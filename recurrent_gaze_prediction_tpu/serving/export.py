"""Serving bundles: ahead-of-time exported inference programs.

The reference's only "serving" story is re-running a Python process that
rebuilds the TF graph from model source and restores a Saver checkpoint
(`/root/reference/models/extract_map.py:43-91`) — inference requires the
full training codebase. This module exports the inference programs to
self-describing on-disk bundles via `jax.export` (StableHLO):

  * `predict.jaxexp`   — features -> maps      (`extract_map.py` path)
  * `fused.jaxexp`     — raw video -> maps     (pipeline path, optional)
  * `stream.jaxexp`    — carried-state chunk step (streaming, optional)
  * `params.npz` / `c3d_params.npz` — weights as flat path->array maps
  * `manifest.json`    — shapes, dtypes, model config

A loaded bundle runs WITHOUT the model zoo: the serialized artifact
contains the lowered program, so serving hosts need only jax + this
loader. Exports are multi-platform (cpu+tpu by default) and use the
portable XLA recurrence path (the Pallas kernel is a TPU-only custom
call, so it is disabled for the exported trace; XLA's fused scan is the
documented fallback at these shapes).

Batch symbolic dimension: the batch axis is exported symbolically
(`jax.export.symbolic_args_specs`) so one artifact serves any batch size;
sequence length T stays static (the recurrence scan length is a
compile-time constant, as in the reference's unrolled graphs).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from ..config import ModelConfig
from ..models.common import GazeModel

_MANIFEST = "manifest.json"
_SEP = "/"  # path separator inside npz keys


# ----------------------------------------------------------- params codec

def flatten_params(params: Any) -> dict[str, np.ndarray]:
    """Nested param dicts -> {"a/b/c": array} for npz storage.

    Dict-of-dicts ONLY: `unflatten_params` reconstructs mappings, so a
    list/tuple node would export fine but come back as a dict with string
    keys — a pytree-structure mismatch (or, for >=10 elements, a silent
    '0','1','10','2' leaf permutation) at SERVE time. Rejecting it here
    turns a dead-on-arrival bundle into an export-time error."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = {}
    for path, leaf in flat:
        for p in path:
            if not hasattr(p, "key"):
                raise TypeError(
                    f"params must be nested dicts for bundle export; found "
                    f"a non-dict node at {jax.tree_util.keystr(path)} "
                    f"(entry {p!r}) — unflatten_params cannot reconstruct "
                    f"it")
        key = _SEP.join(str(p.key) for p in path)
        out[key] = np.asarray(leaf)
    return out


def unflatten_params(flat: dict[str, np.ndarray]) -> dict:
    """Inverse of `flatten_params` for dict-of-dict pytrees."""
    root: dict = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = root
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return root


def _save_npz(path: str, params: Any) -> None:
    np.savez(path, **flatten_params(params))


def _load_npz(path: str) -> dict:
    with np.load(path) as data:
        return unflatten_params({k: data[k] for k in data.files})


# ------------------------------------------------------------- exporting

def _portable_model(model: GazeModel) -> GazeModel:
    """Clone with the TPU-only Pallas custom call disabled so the exported
    StableHLO runs on every requested platform."""
    if not model.cfg.use_pallas:
        return model
    from .. import registry

    cfg = dataclasses.replace(model.cfg, use_pallas=False)
    return registry.create_model(cfg.name, cfg)


def _export_fn(fn, args_shapes, platforms, symbolic_batch: bool):
    """Export `fn` over ShapeDtypeStructs, optionally with a symbolic
    leading batch dim on every non-param argument."""
    if symbolic_batch:
        # every entry in args_shapes whose marker is True gets batch="b"
        specs = []
        shape_polys = jax_export.symbolic_shape("b")
        (b,) = shape_polys
        for spec, batched in args_shapes:
            if batched:
                spec = jax.tree_util.tree_map(
                    lambda s: jax.ShapeDtypeStruct((b,) + s.shape[1:],
                                                   s.dtype), spec)
            specs.append(spec)
    else:
        specs = [spec for spec, _ in args_shapes]
    return jax_export.export(jax.jit(fn), platforms=list(platforms))(*specs)


def export_predict(model: GazeModel, *, batch_size: int = 1,
                   platforms=("cpu", "tpu"),
                   symbolic_batch: bool = True,
                   wire_dtype=jnp.float32) -> jax_export.Exported:
    """Export `predict(params, frames, c3d) -> maps` (features-fed path).

    `wire_dtype` declares the PROGRAM INPUT dtype for frames + c3d —
    the dtype the serving host transfers to the device. bfloat16 halves
    the per-request host->device transfer (the dominant serving cost on
    any networked deployment, BENCHMARKS.md "Serving + streaming");
    inputs are cast back to fp32 at program entry so the numerics equal
    the fp32 program evaluated on wire-rounded inputs."""
    model = _portable_model(model)
    cfg = model.cfg
    t = cfg.n_lstm_steps
    params = jax.eval_shape(model.init, jax.ShapeDtypeStruct((2,), jnp.uint32))
    frames = jax.ShapeDtypeStruct(
        (batch_size, t, cfg.image_height, cfg.image_width, 3), wire_dtype)
    c3d = jax.ShapeDtypeStruct((batch_size, t, cfg.dim_feature, 7, 7),
                               wire_dtype)

    def fn(p, fr, c3):
        return model.predict(p, fr.astype(jnp.float32),
                             c3.astype(jnp.float32))

    return _export_fn(fn,
                      [(params, False), (frames, True), (c3d, True)],
                      platforms, symbolic_batch)


def export_fused_predict(model: GazeModel, *, num_frames: int,
                         batch_size: int = 1, platforms=("cpu", "tpu"),
                         compute_dtype=jnp.float32,
                         video_hw: tuple[int, int] = (128, 171),
                         symbolic_batch: bool = True,
                         video_dtype=jnp.float32) -> jax_export.Exported:
    """Export the fused raw-video pipeline
    `fn(c3d_params, gaze_params, video) -> maps` for a fixed clip length.
    compute_dtype defaults to fp32 so the artifact is platform-portable
    (bf16 convs are TPU-tuned; pass bfloat16 for TPU-only bundles).
    video_hw: raw frame size; the reference's C3D protocol feeds 128x171
    (`extract_C3D_features.py:204-216`).
    video_dtype: program-input dtype for the raw pixels. uint8 is EXACT
    (decoded video is 0..255 integers; the cast to f32 at program entry
    loses nothing) and quarters the per-request host->device transfer
    vs the f32 default."""
    from ..models import c3d as c3d_model
    from ..models.pipeline import extract_and_predict

    model = _portable_model(model)
    c3d_params = jax.eval_shape(
        c3d_model.init_params, jax.ShapeDtypeStruct((2,), jnp.uint32))
    gaze_params = jax.eval_shape(
        model.init, jax.ShapeDtypeStruct((2,), jnp.uint32))
    video = jax.ShapeDtypeStruct((batch_size, num_frames) + tuple(video_hw)
                                 + (3,), video_dtype)

    def fn(cp, gp, v):
        return extract_and_predict(cp, gp, model, v.astype(jnp.float32),
                                   compute_dtype=compute_dtype)

    return _export_fn(fn, [(c3d_params, False), (gaze_params, False),
                           (video, True)], platforms, symbolic_batch)


def export_fused_predict_int8(model: GazeModel, qparams, *, num_frames: int,
                              batch_size: int = 1, platforms=("cpu", "tpu"),
                              compute_dtype=jnp.float32,
                              video_hw: tuple[int, int] = (128, 171),
                              symbolic_batch: bool = True,
                              video_dtype=jnp.float32
                              ) -> jax_export.Exported:
    """Export the fused pipeline with the INT8 C3D tower
    `fn(qparams, gaze_params, video) -> maps` (`models/quant.apply_int8`
    replaces the fp32/bf16 conv tower via the `c3d_forward` hook; +8%
    measured over bf16 on v5e, BENCHMARKS.md "int8 quantized C3D").
    `qparams` come from `models.quant.quantize_for_pipeline`.
    video_dtype: see `export_fused_predict` (uint8 is exact for decoded
    pixels and quarters the request transfer)."""
    from ..models.pipeline import extract_and_predict
    from ..models.quant import apply_int8

    model = _portable_model(model)
    gaze_params = jax.eval_shape(
        model.init, jax.ShapeDtypeStruct((2,), jnp.uint32))
    q_struct = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        qparams)
    video = jax.ShapeDtypeStruct((batch_size, num_frames) + tuple(video_hw)
                                 + (3,), video_dtype)

    def fn(qp, gp, v):
        return extract_and_predict(
            qp, gp, model, v.astype(jnp.float32),
            compute_dtype=compute_dtype,
            c3d_forward=lambda p, clips: apply_int8(p, clips))

    return _export_fn(fn, [(q_struct, False), (gaze_params, False),
                           (video, True)], platforms, symbolic_batch)


def export_stream_step(model: GazeModel, *, chunk_len: int,
                       batch_size: int = 1, platforms=("cpu", "tpu"),
                       symbolic_batch: bool = True,
                       wire_dtype=jnp.float32) -> jax_export.Exported:
    """Export the carried-state streaming step
    `fn(params, state, c3d_chunk) -> (state, maps)` (long-video serving).

    `wire_dtype` declares the feature-CHUNK input dtype (bfloat16 halves
    the per-chunk transfer — at Tc=105 the f32 chunk is ~21 MB/step).
    The carried state stays fp32 in BOTH directions: it round-trips
    host<->device every chunk, and rounding it would accumulate error
    across a long video's chunk chain."""
    from ..models.streaming import grcn_stream_step

    model = _portable_model(model)
    cfg = model.cfg
    params = jax.eval_shape(model.init, jax.ShapeDtypeStruct((2,), jnp.uint32))
    state = jax.ShapeDtypeStruct((batch_size, 7, 7, cfg.rnn_state_size),
                                 jnp.float32)
    chunk = jax.ShapeDtypeStruct((batch_size, chunk_len, cfg.dim_feature,
                                  7, 7), wire_dtype)

    def fn(p, s, c):
        return grcn_stream_step(p, s, c.astype(jnp.float32), cfg)

    return _export_fn(fn, [(params, False), (state, True), (chunk, True)],
                      platforms, symbolic_batch)


# --------------------------------------------------------------- bundles

def save_bundle(path: str, model: GazeModel, gaze_params, *,
                c3d_params=None, num_frames: Optional[int] = None,
                stream_chunk_len: Optional[int] = None,
                int8_qparams=None,
                platforms=("cpu", "tpu"),
                video_hw: tuple[int, int] = (128, 171),
                symbolic_batch: bool = True,
                wire_dtype: str = "float32",
                video_dtype: str = "float32") -> None:
    """Write a serving bundle directory.

    Always exports the features->maps predict program; additionally exports
    the fused raw-video program when `c3d_params` + `num_frames` are given,
    the streaming chunk step when `stream_chunk_len` is given (only for
    models with a ConvGRU state, i.e. gaze_grcn family), and the int8-C3D
    fused program when `int8_qparams` (from
    `models.quant.quantize_for_pipeline`) + `num_frames` are given.

    `wire_dtype` ("float32" | "bfloat16") sets the input dtype of the
    predict/stream programs' frame+feature tensors; `video_dtype`
    ("float32" | "uint8") sets the fused programs' raw-pixel input dtype.
    Non-f32 wire dtypes shrink the per-request host->device transfer —
    the dominant serving cost off-host — and are recorded per program in
    the manifest so `server_from_bundle` casts incoming requests to the
    program's dtype (clients can keep POSTing f32/f16 npz).
    """
    if wire_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"wire_dtype must be float32|bfloat16, got "
                         f"{wire_dtype!r} (uint8 is video_dtype's job)")
    if video_dtype not in ("float32", "uint8"):
        raise ValueError(f"video_dtype must be float32|uint8, got "
                         f"{video_dtype!r}")
    wire = jnp.dtype(wire_dtype)
    vid = jnp.dtype(video_dtype)
    os.makedirs(path, exist_ok=True)
    manifest: dict[str, Any] = {
        "format_version": 1,
        "model": dataclasses.asdict(model.cfg),
        "platforms": list(platforms),
        "symbolic_batch": bool(symbolic_batch),
        "programs": {},
    }

    exp = export_predict(model, platforms=platforms,
                         symbolic_batch=symbolic_batch, wire_dtype=wire)
    with open(os.path.join(path, "predict.jaxexp"), "wb") as f:
        f.write(exp.serialize())
    _save_npz(os.path.join(path, "params.npz"), gaze_params)
    t = model.cfg.n_lstm_steps
    manifest["programs"]["predict"] = {
        "file": "predict.jaxexp",
        "inputs": f"params, frames [B,T,H,W,3] {wire.name} in [0,1], "
                  f"c3d [B,T,1024,7,7] {wire.name}",
        "t": t,
        "wire_dtype": wire.name,
    }

    if c3d_params is not None and num_frames is not None:
        exp_f = export_fused_predict(model, num_frames=num_frames,
                                     platforms=platforms,
                                     video_hw=video_hw,
                                     symbolic_batch=symbolic_batch,
                                     video_dtype=vid)
        with open(os.path.join(path, "fused.jaxexp"), "wb") as f:
            f.write(exp_f.serialize())
        _save_npz(os.path.join(path, "c3d_params.npz"), c3d_params)
        manifest["programs"]["fused"] = {
            "file": "fused.jaxexp",
            "inputs": f"c3d_params, params, video [B,F,H,W,3] "
                      f"{vid.name} 0..255",
            "num_frames": num_frames,
            "video_hw": list(video_hw),
            "video_dtype": vid.name,
        }

    if int8_qparams is not None and num_frames is not None:
        exp_q = export_fused_predict_int8(model, int8_qparams,
                                          num_frames=num_frames,
                                          platforms=platforms,
                                          video_hw=video_hw,
                                          symbolic_batch=symbolic_batch,
                                          video_dtype=vid)
        with open(os.path.join(path, "fused_int8.jaxexp"), "wb") as f:
            f.write(exp_q.serialize())
        _save_npz(os.path.join(path, "qparams_int8.npz"), int8_qparams)
        manifest["programs"]["fused_int8"] = {
            "file": "fused_int8.jaxexp",
            "inputs": f"qparams_int8, params, video [B,F,H,W,3] "
                      f"{vid.name} 0..255",
            "num_frames": num_frames,
            "video_hw": list(video_hw),
            "video_dtype": vid.name,
        }

    if stream_chunk_len is not None:
        exp_s = export_stream_step(model, chunk_len=stream_chunk_len,
                                   platforms=platforms,
                                   symbolic_batch=symbolic_batch,
                                   wire_dtype=wire)
        with open(os.path.join(path, "stream.jaxexp"), "wb") as f:
            f.write(exp_s.serialize())
        manifest["programs"]["stream"] = {
            "file": "stream.jaxexp",
            "inputs": f"params, state [B,7,7,U] f32, chunk "
                      f"[B,Tc,1024,7,7] {wire.name}",
            "chunk_len": stream_chunk_len,
            "state_size": model.cfg.rnn_state_size,
            "wire_dtype": wire.name,
        }

    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
        f.write("\n")


class ServingBundle:
    """A loaded serving bundle: callable inference programs + weights.

    Does NOT import the model zoo — only deserialized StableHLO programs.
    """

    def __init__(self, path: str):
        with open(os.path.join(path, _MANIFEST)) as f:
            self.manifest = json.load(f)
        self.model_config = ModelConfig(**self.manifest["model"])
        self.params = _load_npz(os.path.join(path, "params.npz"))
        self._programs: dict[str, jax_export.Exported] = {}
        for name, meta in self.manifest["programs"].items():
            with open(os.path.join(path, meta["file"]), "rb") as f:
                self._programs[name] = jax_export.deserialize(f.read())
        self.c3d_params = None
        c3d_path = os.path.join(path, "c3d_params.npz")
        if os.path.exists(c3d_path):
            self.c3d_params = _load_npz(c3d_path)
        self.qparams_int8 = None
        q_path = os.path.join(path, "qparams_int8.npz")
        if os.path.exists(q_path):
            self.qparams_int8 = _load_npz(q_path)

    @property
    def programs(self) -> list[str]:
        return sorted(self._programs)

    def input_dtype(self, program: str) -> np.dtype:
        """Declared input dtype of a program's DATA tensors — frames/c3d
        for predict, video pixels for fused*, the feature CHUNK for
        stream (the `wire_dtype`/`video_dtype` the bundle was exported
        with; f32 for pre-wire-dtype bundles). Exported programs are
        dtype-strict, so cast data tensors to this before `.call`.
        NOT the stream program's carried STATE: that is always float32
        in both directions regardless of wire_dtype (rounding it would
        accumulate error across a long video's chunk chain)."""
        meta = self.manifest["programs"][program]
        name = meta.get("video_dtype") or meta.get("wire_dtype") or "float32"
        return jnp.dtype(name)

    def predict(self, frames, c3d):
        """[B,T,H,W,3] frames in [0,1] + [B,T,1024,7,7] features -> maps.
        Inputs must be `input_dtype("predict")` (f32, or bf16 for
        wire_dtype=bfloat16 bundles)."""
        return self._programs["predict"].call(self.params, frames, c3d)

    def predict_fused(self, video):
        """[B,F,128,171,3] raw pixels 0..255 -> [B,T,49,49] maps.
        `video` must be `input_dtype("fused")` (f32, or uint8 for
        video_dtype=uint8 bundles — exact for decoded pixels)."""
        if "fused" not in self._programs:
            raise KeyError("bundle has no fused program "
                           "(saved without c3d_params/num_frames)")
        return self._programs["fused"].call(self.c3d_params, self.params,
                                            video)

    def predict_fused_int8(self, video):
        """[B,F,128,171,3] raw pixels 0..255 -> maps via the int8 C3D
        tower (map corr >= 0.98 vs the bf16/fp32 tower, asserted in
        tests/test_quant.py; +8% throughput on v5e)."""
        if "fused_int8" not in self._programs:
            raise KeyError("bundle has no fused_int8 program "
                           "(export with --int8)")
        return self._programs["fused_int8"].call(self.qparams_int8,
                                                 self.params, video)

    def stream_step(self, state, c3d_chunk):
        """Carried-state chunk step -> (new_state, chunk maps).
        `state` is float32 ALWAYS (feed back what the previous step
        returned, or `initial_stream_state`); only `c3d_chunk` rides
        `input_dtype("stream")` (bf16 for wire_dtype=bfloat16 bundles)."""
        if "stream" not in self._programs:
            raise KeyError("bundle has no stream program")
        return self._programs["stream"].call(self.params, state, c3d_chunk)

    def initial_stream_state(self, batch_size: int):
        return jnp.zeros((batch_size, 7, 7, self.model_config.rnn_state_size),
                         jnp.float32)


def load_bundle(path: str) -> ServingBundle:
    return ServingBundle(path)
