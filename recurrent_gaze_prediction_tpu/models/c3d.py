"""C3D — the Sports-1M 3-D ConvNet feature extractor, in-graph.

TPU-native replacement for the reference's offline C++/CUDA Caffe pipeline
(`/root/reference/.../extract_C3D_features.py:689-724` invokes
`extract_image_features.bin` as a subprocess; the network definition is the
generated prototxt at `extract_C3D_features.py:197-646`):

    input [N, 16, 112, 112, 3]  (NDHWC; 128x171 resize -> 112 center crop,
                                 mean subtraction, `extract_C3D_features.py:
                                 204-216` VIDEO_DATA params)
    conv1a(64)            + pool1 (1,2,2)
    conv2a(128)           + pool2 (2,2,2)
    conv3a(256) conv3b(256) + pool3
    conv4a(512) conv4b(512) + pool4
    conv5a(512) conv5b(512)           <- feature layer used by RGP
    [+ pool5, fc6(4096), fc7(4096), fc8(487) for full-network parity]

All convs are 3x3x3, pad 1 (prototxt CONVOLUTION3D layers). Features come
out of conv5b as [N, 2, 7, 7, 512] and are folded channel-major to
[N, 1024, 7, 7] exactly like the blob reshape the gaze models expect
(`models/gaze_rnn.py:494-497`).

Weight ingestion: `params_from_caffe_arrays` maps Caffe-layout weights
([out, in, kd, kh, kw], fc [out, in]) onto this model's DHWIO pytree, so a
converted Sports-1M checkpoint drops in. Caffe/OpenCV feed BGR — pass
`bgr=True` to `preprocess_frames` for bit-parity with the reference
pipeline.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import initializers as init
from ..ops.layers import conv3d, linear, max_pool3d

# (name, out_channels) per conv layer, prototxt order
CONV_LAYERS = (
    ("conv1a", 64),
    ("conv2a", 128),
    ("conv3a", 256), ("conv3b", 256),
    ("conv4a", 512), ("conv4b", 512),
    ("conv5a", 512), ("conv5b", 512),
)
# pools after these layers: (window, stride) in (depth, h, w)
POOLS = {
    "conv1a": ((1, 2, 2), (1, 2, 2)),
    "conv2a": ((2, 2, 2), (2, 2, 2)),
    "conv3b": ((2, 2, 2), (2, 2, 2)),
    "conv4b": ((2, 2, 2), (2, 2, 2)),
    "conv5b": ((2, 2, 2), (2, 2, 2)),  # pool5, only for the fc path
}
FC_LAYERS = (("fc6", 8192, 4096), ("fc7", 4096, 4096), ("fc8", 4096, 487))

FEATURE_LAYERS = ("conv5b", "pool5", "fc6", "fc7", "fc8", "prob")


def init_params(key: jax.Array) -> dict:
    """Random init per the prototxt fillers (gaussian 0.01 conv / 0.005 fc)."""
    params = {}
    keys = jax.random.split(key, len(CONV_LAYERS) + len(FC_LAYERS))
    in_ch = 3
    for i, (name, out_ch) in enumerate(CONV_LAYERS):
        params[f"{name}_w"] = 0.01 * jax.random.normal(
            keys[i], (3, 3, 3, in_ch, out_ch))
        params[f"{name}_b"] = init.zeros((out_ch,))
        in_ch = out_ch
    for j, (name, d_in, d_out) in enumerate(FC_LAYERS):
        params[f"{name}_w"] = 0.005 * jax.random.normal(
            keys[len(CONV_LAYERS) + j], (d_in, d_out))
        params[f"{name}_b"] = init.zeros((d_out,))
    return params


def apply(params: dict, clips: jax.Array, *, feature_layer: str = "conv5b",
          compute_dtype=None) -> jax.Array:
    """clips [N, 16, 112, 112, 3] (mean-subtracted) -> features.

    feature_layer 'conv5b' returns [N, 2, 7, 7, 512] (NDHWC); 'fc6'/'fc7'
    return [N, 4096]; 'prob' returns softmax over 487 classes.
    """
    if feature_layer not in FEATURE_LAYERS:
        raise ValueError(f"feature_layer must be one of {FEATURE_LAYERS}")
    x = clips
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    for name, _ in CONV_LAYERS:
        x = conv3d(x, params[f"{name}_w"], padding="SAME",
                   compute_dtype=compute_dtype,
                   out_dtype=compute_dtype) + params[f"{name}_b"].astype(
                       x.dtype if compute_dtype is None else compute_dtype)
        x = jax.nn.relu(x)
        if name == "conv5b" and feature_layer == "conv5b":
            return x.astype(jnp.float32)
        if name in POOLS and name != "conv5b":
            window, stride = POOLS[name]
            x = max_pool3d(x, window, stride, padding="SAME")
    # pool5 (VALID-ish: 2x7x7 -> 1x4x4 with SAME padding like Caffe's
    # ceil-mode pooling)
    window, stride = POOLS["conv5b"]
    x = max_pool3d(x, window, stride, padding="SAME")
    if feature_layer == "pool5":
        return x.astype(jnp.float32)
    x = x.reshape(x.shape[0], -1)
    for name, _, _ in FC_LAYERS:
        x = linear(x, params[f"{name}_w"], params[f"{name}_b"],
                   compute_dtype=compute_dtype, out_dtype=compute_dtype)
        if name != "fc8":
            x = jax.nn.relu(x)
        if feature_layer == name:
            return x.astype(jnp.float32)
    return jax.nn.softmax(x.astype(jnp.float32), axis=-1)  # 'prob'


def conv5b_to_rgp(features: jax.Array) -> jax.Array:
    """[N, 2, 7, 7, 512] NDHWC -> [N, 1024, 7, 7] with the blob's
    channel-major (c * 2 + l) fold (`models/gaze_rnn.py:497`)."""
    n = features.shape[0]
    # NDHWC -> N C D H W -> fold (C, D) -> 1024
    x = jnp.transpose(features, (0, 4, 1, 2, 3))
    return x.reshape(n, 1024, 7, 7)


# ------------------------------------------------------------ preprocessing

MEAN_PIXEL = 101.2  # fallback scalar mean when no mean cube is provided


def preprocess_frames(frames: jax.Array, mean_cube: Optional[jax.Array] = None,
                      bgr: bool = False) -> jax.Array:
    """[N, 16, H, W, 3] pixels (0..255) -> network input.

    Protocol (VIDEO_DATA layer, `extract_C3D_features.py:204-216`): resize
    to 128x171, center-crop 112x112, subtract the mean cube. Caffe reads
    frames as BGR; set bgr=True to reorder RGB inputs for checkpoint parity.
    """
    n, t = frames.shape[:2]
    x = frames.astype(jnp.float32)
    if bgr:
        x = x[..., ::-1]
    if x.shape[2:4] != (128, 171):
        x = jax.image.resize(x, (n, t, 128, 171, 3), method="bilinear")
    top = (128 - 112) // 2
    left = (171 - 112) // 2
    x = x[:, :, top:top + 112, left:left + 112, :]
    if mean_cube is not None:
        x = x - mean_cube
    else:
        x = x - MEAN_PIXEL
    return x


def fold_bgr_into_params(params: dict,
                         mean_cube: Optional[jax.Array] = None):
    """Permute conv1a's in-channel axis so BGR-trained weights (Caffe
    Sports-1M, `extract_C3D_features.py:695-701`) accept RGB frames and
    produce activations identical to the original weights fed BGR-swapped
    frames (exact up to in-channel reduction-order ULPs; pinned ≤1e-5
    through conv5b by `test_fold_bgr_into_params_bit_exact`).

    The fused pipeline (`models/pipeline.extract_and_predict` and every
    surface built on it: fused train/predict, serving export, temporal
    sharding, streaming) feeds decoded RGB with no per-frame channel
    swap — fold Caffe weights through this ONCE at load time instead of
    paying a per-frame reorder. The offline `cli/extract_features`
    surface keeps its runtime `--bgr` swap for blob-level reference
    parity; never apply both.

    A Caffe mean cube is stored in BGR order; pass it here to get the
    matching RGB-ordered cube (channel reverse). With the scalar
    MEAN_PIXEL fallback no cube is involved. Returns `folded_params` or
    `(folded_params, folded_mean_cube)` when a cube is given.
    """
    out = dict(params)
    w = np.asarray(params["conv1a_w"])  # DHWIO, I = 3
    out["conv1a_w"] = jnp.asarray(w[..., ::-1, :].copy())
    if mean_cube is None:
        return out
    return out, jnp.asarray(np.asarray(mean_cube)[..., ::-1].copy())


def clip_windows(num_frames: int, window: int = 16) -> list[int]:
    """Non-overlapping window start indices
    (`extract_C3D_features.py:866`: range(0, num_frames, 16))."""
    return list(range(0, num_frames, window))


# -------------------------------------------------------- weight ingestion

def params_from_caffe_arrays(arrays: dict) -> dict:
    """Map Caffe-layout weights onto this model's pytree.

    Caffe conv blobs are [out, in, kd, kh, kw] -> DHWIO [kd, kh, kw, in, out];
    fc blobs are [out, in] -> [in, out]. Accepts a dict keyed by layer name
    (conv1a, ..., fc8) with 'w'/'b' entries or (w, b) tuples.
    """
    params = {}
    for name, _ in CONV_LAYERS:
        w, b = _get_wb(arrays, name)
        if w.ndim != 5:
            raise ValueError(f"{name}: expected 5-D conv blob, got {w.shape}")
        params[f"{name}_w"] = jnp.asarray(
            np.transpose(w, (2, 3, 4, 1, 0)).copy())
        params[f"{name}_b"] = jnp.asarray(b)
    for name, _, _ in FC_LAYERS:
        if name not in arrays and f"{name}-1" in arrays:
            name_key = f"{name}-1"  # prototxt names them fc6-1 etc.
        else:
            name_key = name
        w, b = _get_wb(arrays, name_key)
        params[f"{name}_w"] = jnp.asarray(np.transpose(w, (1, 0)).copy())
        params[f"{name}_b"] = jnp.asarray(b)
    return params


def _get_wb(arrays: dict, name: str):
    entry = arrays[name]
    if isinstance(entry, dict):
        return np.asarray(entry["w"]), np.asarray(entry["b"])
    w, b = entry
    return np.asarray(w), np.asarray(b)
