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


def conv2d_transpose_subpixel(x: jax.Array, kernel: jax.Array, *,
                              stride: int, compute_dtype=None,
                              out_dtype=None) -> jax.Array:
    """VALID transposed conv as ONE dense conv + depth-to-space.

    Computes the SAME linear map as `conv2d_transpose(padding="VALID")`
    (exact up to float reassociation; pinned in tests/test_ops.py), but
    MXU-shaped: a k x k, stride-s deconv with small Cout runs its MAC
    loop over only Cout lanes and its backward over dilated scatters —
    the phase decomposition instead runs one ceil(k/s)^2 conv producing
    s^2*Cout channels, then interleaves phases spatially. For the GRCN
    decoder (5x5/s3 128->64 and 5x5/s2 64->32, `gaze_grcn.py:326-343`)
    that turns 64/32-lane deconvs into 576/128-lane dense convs, forward
    AND backward. Measured on v5e: decoder f+b 22.2 -> ~8 ms at B*T=2352
    (BENCHMARKS.md round 3).

    Derivation: with lax.conv_transpose's scatter-flipped-kernel
    semantics, y[o] = sum_i x[i] * K[k-1-(o-s*i)]. Writing o = s*m + p
    per phase p in [0,s): y[s*m+p] = sum_u x[m-u] * K[k-1-s*u-p], a
    small causal conv per phase; all s^2 phases stack into one kernel
    [tau, tau, Cin, s*s*Cout] with tau = ceil(k/s), x zero-padded tau-1
    on every side, followed by depth-to-space and a crop to (in-1)*s+k.
    """
    s = int(stride)
    if s == 1:
        return conv2d_transpose(x, kernel, stride=1, padding="VALID",
                                compute_dtype=compute_dtype,
                                out_dtype=out_dtype)
    kh, kw, cin, cout = kernel.shape
    assert kh == kw, "square kernels only (decoder uses 5x5/7x7)"
    k = kh
    tau = -(-k // s)

    # constant phase-selection matrix: S[a, p, j] = 1 iff the conv tap at
    # (reversed) position a for phase p reads kernel row j = k-1-s*u-p
    # with u = tau-1-a
    sel = np.zeros((tau, s, k), np.float32)
    for a in range(tau):
        u = tau - 1 - a
        for p in range(s):
            j = k - 1 - s * u - p
            if 0 <= j < k:
                sel[a, p, j] = 1.0
    sel = jnp.asarray(sel, kernel.dtype)

    # fused kernel Q[a, b, cin, (p_r, p_c, cout)]
    t1 = jnp.tensordot(sel, kernel, axes=([2], [0]))   # [a, pr, w, i, o]
    t2 = jnp.tensordot(sel, t1, axes=([2], [2]))       # [b, pc, a, pr, i, o]
    q = jnp.transpose(t2, (2, 0, 4, 3, 1, 5))          # [a, b, i, pr, pc, o]
    q = q.reshape(tau, tau, cin, s * s * cout)

    n, h, w = x.shape[:3]
    xp = jnp.pad(x, ((0, 0), (tau - 1, tau - 1), (tau - 1, tau - 1),
                     (0, 0)))
    y = conv2d(xp, q, padding="VALID", compute_dtype=compute_dtype,
               out_dtype=out_dtype if out_dtype is not None
               else compute_dtype)
    hp, wp = y.shape[1:3]                               # h+tau-1, w+tau-1
    y = y.reshape(n, hp, wp, s, s, cout)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(n, hp * s, wp * s,
                                                     cout)
    y = y[:, :(h - 1) * s + k, :(w - 1) * s + k, :]
    if out_dtype is None:
        y = y.astype(jnp.float32)
    return y


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
