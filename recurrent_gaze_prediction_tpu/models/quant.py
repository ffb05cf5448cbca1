"""Int8 quantized C3D inference (serving-time post-training quantization).

The v5e MXU runs int8 x int8 -> int32 at ~2x the bf16 FLOP rate; measured
on this chip, the C3D mid-layer conv shape runs 205 TOP/s int8 vs 135
TFLOP/s bf16 (1.5x — BENCHMARKS.md "int8 quantized C3D"). Since the fused
inference pipeline is conv-compute-bound (52% MFU), quantizing the C3D
tower is the one remaining algorithmic speed lever, and it also halves
inter-layer HBM traffic (int8 activations vs bf16) — conv1a's output
write is the known bandwidth hotspot.

Scheme (standard post-training quantization):
  * weights: symmetric per-OUTPUT-CHANNEL int8, scale = max|w_c| / 127
  * activations: symmetric per-TENSOR int8, scales calibrated by running
    the fp32 tower over calibration clips and recording max|x| per layer
  * conv: int8 x int8 -> int32 accumulation (`preferred_element_type`),
    dequant + bias + relu + requant fused into the conv epilogue; the
    tensor carried between layers is int8
  * max-pooling runs on the int8 tensor (monotonic, commutes with the
    requant)
  * conv5b output dequants to fp32 — the gaze model input is unchanged

Only the conv tower (the part RGP uses, conv1a..conv5b) is quantized;
the fc layers keep the fp32/bf16 path. The reference has no quantization
story at all (fp32 Caffe, `extract_C3D_features.py:689-724`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.layers import conv3d, max_pool3d
from . import c3d as c3d_model

_QMAX = 127.0


def _quantize_tensor(x: jax.Array, scale) -> jax.Array:
    return jnp.clip(jnp.round(x / scale), -_QMAX, _QMAX).astype(jnp.int8)


def calibrate_c3d(params: dict, calib_clips: jax.Array, *,
                  compute_dtype=jnp.float32) -> dict:
    """Record per-layer input activation scales on calibration clips.

    calib_clips: [N, 16, 112, 112, 3] ALREADY preprocessed (mean-subtracted)
    network inputs. Returns {layer_name: float scale} with
    scale = max|input| / 127 (symmetric absmax calibration).
    """
    scales = {}
    x = calib_clips.astype(compute_dtype)
    for name, _ in c3d_model.CONV_LAYERS:
        scales[name] = float(jnp.max(jnp.abs(x))) / _QMAX
        x = conv3d(x, params[f"{name}_w"], padding="SAME",
                   compute_dtype=compute_dtype, out_dtype=compute_dtype)
        x = jax.nn.relu(x + params[f"{name}_b"].astype(x.dtype))
        if name == "conv5b":
            break
        if name in c3d_model.POOLS:
            window, stride = c3d_model.POOLS[name]
            x = max_pool3d(x, window, stride, padding="SAME")
    return scales


def quantize_c3d(params: dict, act_scales: dict) -> dict:
    """fp32 conv-tower params + calibrated activation scales -> int8 params.

    Returns a pytree with, per conv layer: `{name}_wq` int8 DHWIO kernel,
    `{name}_wscale` fp32 [out] per-channel weight scales, `{name}_b` fp32
    bias, `{name}_xscale` fp32 scalar input scale.
    """
    q = {}
    for name, _ in c3d_model.CONV_LAYERS:
        w = np.asarray(params[f"{name}_w"], np.float32)
        wscale = np.abs(w).max(axis=(0, 1, 2, 3)) / _QMAX  # [out]
        wscale = np.maximum(wscale, 1e-12)
        q[f"{name}_wq"] = jnp.asarray(
            np.clip(np.round(w / wscale), -_QMAX, _QMAX).astype(np.int8))
        q[f"{name}_wscale"] = jnp.asarray(wscale.astype(np.float32))
        q[f"{name}_b"] = jnp.asarray(np.asarray(params[f"{name}_b"],
                                                np.float32))
        q[f"{name}_xscale"] = jnp.float32(act_scales[name])
    return q


def _conv3d_int8(x_q: jax.Array, w_q: jax.Array) -> jax.Array:
    """int8 NDHWC conv, SAME padding, int32 accumulation."""
    dn = jax.lax.conv_dimension_numbers(x_q.shape, w_q.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=dn, preferred_element_type=jnp.int32)


def apply_int8(qparams: dict, clips: jax.Array) -> jax.Array:
    """Quantized conv tower: preprocessed clips [N, 16, 112, 112, 3] fp32
    -> conv5b features [N, 2, 7, 7, 512] fp32 (same contract as
    `c3d.apply(..., feature_layer='conv5b')`)."""
    names = [name for name, _ in c3d_model.CONV_LAYERS]
    x_q = _quantize_tensor(clips.astype(jnp.float32),
                           qparams["conv1a_xscale"])
    for i, name in enumerate(names):
        y = _conv3d_int8(x_q, qparams[f"{name}_wq"])  # int32
        # dequant + bias + relu, fused into the conv epilogue by XLA
        alpha = qparams[f"{name}_xscale"] * qparams[f"{name}_wscale"]
        y = jax.nn.relu(y.astype(jnp.float32) * alpha + qparams[f"{name}_b"])
        if name == "conv5b":
            return y
        # requant to the NEXT layer's input scale; pool on int8 (monotonic)
        x_q = _quantize_tensor(y, qparams[f"{names[i + 1]}_xscale"])
        if name in c3d_model.POOLS:
            window, stride = c3d_model.POOLS[name]
            x_q = max_pool3d(x_q, window, stride, padding="SAME")
    raise AssertionError("unreachable")


def make_int8_c3d_forward(qparams: dict):
    """Returns `fn(_, clips) -> conv5b ndhwc features` matching the
    `c3d_forward` hook signature of `pipeline.extract_and_predict` (the
    quantized params are closed over; the ignored first argument keeps the
    (params, clips) calling convention)."""

    def fn(_unused_params, clips):
        return apply_int8(qparams, clips)

    return fn


def quantize_for_pipeline(c3d_params: dict, *,
                          calib_clips: Optional[jax.Array] = None,
                          seed: int = 0) -> dict:
    """One-call quantization for serving: calibrate (on provided clips or
    synthetic pixel statistics) and return int8 qparams."""
    if calib_clips is None:
        from ..utils.logging import log

        log.warn(
            "int8 calibration falling back to synthetic uniform-noise clips; "
            "deep-layer activation ranges under noise can differ from real "
            "video. Pass calib_clips (real decoded clips) for production "
            "bundles.")
        rng = np.random.RandomState(seed)
        raw = rng.randint(0, 255, (4, 16, 128, 171, 3)).astype(np.float32)
        calib_clips = c3d_model.preprocess_frames(jnp.asarray(raw))
    scales = calibrate_c3d(c3d_params, calib_clips)
    return quantize_c3d(c3d_params, scales)
