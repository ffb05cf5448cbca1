"""Core NN ops: conv / deconv / pool / linear / maxout / dropout.

All ops are pure functions over explicit parameter arrays (pytree leaves),
NHWC layout, with a `compute_dtype` knob so convs/matmuls run in bfloat16 on
the MXU while parameters stay float32. Shapes mirror the reference exactly:

  * ShallowNet chain 98 -> 94 -> 47 -> 45 -> 23 -> 21 -> 11 with VALID convs
    and SAME max-pools (`/root/reference/models/saliency_shallownet.py:92-138`)
  * GRCN decoder deconvs 7 ->(k5,s3,VALID) 23 ->(k5,s2,VALID) 49 ->(k7,s1,SAME)
    49 (`/root/reference/models/gaze_grcn.py:326-358`)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_CONV_DIMS = ("NHWC", "HWIO", "NHWC")


def _cast(x: jax.Array, dtype) -> jax.Array:
    return x.astype(dtype) if dtype is not None and x.dtype != dtype else x


def conv2d(x: jax.Array, kernel: jax.Array, *, stride: int | tuple[int, int] = 1,
           padding: str = "SAME", compute_dtype=None,
           out_dtype=None) -> jax.Array:
    """2-D convolution, NHWC x HWIO -> NHWC, fp32 accumulation.

    `out_dtype` casts the (fp32-accumulated) result, e.g. back to bf16 to
    keep downstream layout ops cheap — fp32 tensors with small minor dims
    are pathologically slow to relayout on TPU.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    out = lax.conv_general_dilated(
        _cast(x, compute_dtype), _cast(kernel, compute_dtype),
        window_strides=stride, padding=padding,
        dimension_numbers=_CONV_DIMS,
        preferred_element_type=None if compute_dtype is not None
        else jnp.float32,
    )
    return _cast(out, out_dtype if out_dtype is not None else jnp.float32)


def conv2d_transpose(x: jax.Array, kernel: jax.Array, *,
                     stride: int | tuple[int, int],
                     padding: str = "VALID", compute_dtype=None,
                     out_dtype=None) -> jax.Array:
    """Fractionally-strided conv. kernel layout HWIO ([h, w, in_ch, out_ch]).

    With VALID padding the output spatial size is (in-1)*stride + k, matching
    `tf.nn.conv2d_transpose(..., padding='VALID')` as used in the GRCN decoder
    (7->23 with k=5,s=3; 23->49 with k=5,s=2; `models/gaze_grcn.py:326-343`).

    Parametrization note: lax.conv_transpose(transpose_kernel=False)
    scatters the SPATIALLY FLIPPED kernel (verified in
    tests/test_golden_network.py); TF scatters the unflipped kernel in
    [h, w, out, in] layout. Equivalent families when training from
    scratch — flip + transpose the last two axes to port TF checkpoints.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    out = lax.conv_transpose(
        _cast(x, compute_dtype), _cast(kernel, compute_dtype),
        strides=stride, padding=padding,
        dimension_numbers=_CONV_DIMS,
        preferred_element_type=None if compute_dtype is not None
        else jnp.float32,
    )
    return _cast(out, out_dtype if out_dtype is not None else jnp.float32)


def conv3d(x: jax.Array, kernel: jax.Array, *,
           stride: Sequence[int] = (1, 1, 1),
           padding: str = "SAME", compute_dtype=None,
           out_dtype=None) -> jax.Array:
    """3-D convolution, NDHWC x DHWIO -> NDHWC (C3D conv blocks).

    Mirrors CONVOLUTION3D layers with kernel 3x3x3, pad 1
    (`/root/reference/.../c3d_prototxt/feature_extration.prototxt`).
    """
    out = lax.conv_general_dilated(
        _cast(x, compute_dtype), _cast(kernel, compute_dtype),
        window_strides=tuple(stride), padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=None if compute_dtype is not None
        else jnp.float32,
    )
    return _cast(out, out_dtype if out_dtype is not None else jnp.float32)


def max_pool2d(x: jax.Array, window: int | tuple[int, int],
               stride: int | tuple[int, int], padding: str = "SAME") -> jax.Array:
    if isinstance(window, int):
        window = (window, window)
    if isinstance(stride, int):
        stride = (stride, stride)
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *stride, 1),
        padding=padding,
    )


def avg_pool2d(x: jax.Array, window: int | tuple[int, int],
               stride: int | tuple[int, int], padding: str = "VALID") -> jax.Array:
    if isinstance(window, int):
        window = (window, window)
    if isinstance(stride, int):
        stride = (stride, stride)
    summed = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *stride, 1),
        padding=padding,
    )
    if padding == "VALID":
        return summed / (window[0] * window[1])
    ones = jnp.ones_like(x)
    counts = lax.reduce_window(
        ones, 0.0, lax.add,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *stride, 1),
        padding=padding,
    )
    return summed / counts


def max_pool3d(x: jax.Array, window: Sequence[int],
               stride: Sequence[int], padding: str = "SAME") -> jax.Array:
    """3-D max pool over NDHWC (C3D POOLING3D)."""
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *stride, 1),
        padding=padding,
    )


def linear(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None, *,
           compute_dtype=None, out_dtype=None) -> jax.Array:
    """x @ w + b with fp32 accumulation (`tf.nn.xw_plus_b`)."""
    out = jnp.dot(_cast(x, compute_dtype), _cast(w, compute_dtype),
                  preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(out.dtype)
    return _cast(out, out_dtype)


def maxout2(x: jax.Array) -> jax.Array:
    """Split the last dim in two halves and take elementwise max
    (`models/saliency_shallownet.py:157-158,178-179`)."""
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.maximum(a, b)


def dropout(x: jax.Array, rate_keep: float, rng: Optional[jax.Array],
            deterministic: bool) -> jax.Array:
    """TF-style dropout: scale kept activations by 1/keep_prob.

    When keep_prob is an exact multiple of 1/256 (the reference default
    0.5 is 128/256), the mask is drawn from one uint8 of randomness per
    element instead of the f32 bernoulli compare — 4x less RNG bandwidth
    with an IDENTICAL Bernoulli(p) distribution (all 256 byte values are
    equiprobable). Measured 2.44 -> 1.61 ms on the projection activation
    (BENCHMARKS.md); dropout was ~9% of the gaze_grcn train step.
    """
    if deterministic or rate_keep >= 1.0:
        return x
    if rng is None:
        raise ValueError("dropout requires an rng in train mode")
    k256 = rate_keep * 256.0
    if abs(k256 - round(k256)) < 1e-9 and 0 < round(k256) < 256:
        mask = jax.random.bits(rng, x.shape, jnp.uint8) \
            < jnp.uint8(round(k256))
    else:
        mask = jax.random.bernoulli(rng, rate_keep, x.shape)
    return jnp.where(mask, x / rate_keep, 0.0).astype(x.dtype)


def frozen_batch_norm(x: jax.Array, scale: jax.Array, offset: jax.Array,
                      eps: float = 1e-3) -> jax.Array:
    """Batch norm in inference mode with untrained statistics (mean=0, var=1).

    The reference applies `tf.layers.batch_normalization` framewise inside the
    GRCN decoder with no training=True wiring and no update ops
    (`models/gaze_grcn.py:325`), so it always runs with the initial moving
    stats: y = scale * x / sqrt(1 + eps) + offset. We reproduce exactly that
    semantics (documented decision per SURVEY.md section 7).
    """
    inv = lax.rsqrt(jnp.asarray(1.0 + eps, x.dtype))
    return x * (scale.astype(x.dtype) * inv) + offset.astype(x.dtype)
