"""Exact-semantics image resizing (separable gathers, NHWC).

The reference relies on torch `F.interpolate` in three distinct flavours:
  * bilinear align_corners=True   (decoders: model/propainter.py:290,
    model/recurrent_flow_completion.py:158; RAFT upflow8:
    model/modules/RAFT/utils/utils.py:89-91)
  * bilinear align_corners=False  (flow downsampling: model/propainter.py:391-408)
  * nearest                       (mask downsampling: model/propainter.py:409-417)

`jax.image.resize` implements none of these conventions bit-exactly, so we
build the source index/weight tables host-side (static shapes) and lower to
two small dense matmuls — which XLA maps straight onto the MXU.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _linear_weights(in_size: int, out_size: int, align_corners: bool):
    """Dense [out_size, in_size] interpolation matrix (numpy, host-side)."""
    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = np.maximum((np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5, 0.0)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.clip(i0, 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = src - i0
    w0 = 1.0 - w1
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    np.add.at(mat, (np.arange(out_size), i0), w0)
    np.add.at(mat, (np.arange(out_size), i1), w1)
    return mat


@functools.lru_cache(maxsize=256)
def _linear_taps(in_size: int, out_size: int, align_corners: bool):
    """(i0, i1, w1) static tap tables for the 2-tap separable lerp."""
    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = np.maximum(
            (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5, 0.0
        )
    i0 = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    return i0, i1, w1


@functools.lru_cache(maxsize=256)
def _nearest_indices(in_size: int, out_size: int):
    """Torch 'nearest' source indices: floor(i * in/out)."""
    idx = np.floor(np.arange(out_size, dtype=np.float64) * (in_size / out_size))
    return np.clip(idx.astype(np.int64), 0, in_size - 1)


def resize_bilinear(
    x: jnp.ndarray, out_h: int, out_w: int, align_corners: bool = False
) -> jnp.ndarray:
    """Bilinear resize of [..., H, W, C] to [..., out_h, out_w, C]."""
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    dt = x.dtype

    # 2-tap separable lerp with STATIC index tables: two takes + one
    # fused blend per axis (~3 passes over the data). The previous dense
    # [out, in] matmul form multiplied every output row by the whole
    # input axis — ~35 TFLOP of structural zeros for one decoder 2x
    # upsample at pipeline shapes.
    def axis_lerp(v, size_in, size_out, axis):
        i0, i1, w1 = _linear_taps(size_in, size_out, align_corners)
        v0 = jnp.take(v, jnp.asarray(i0), axis=axis)
        v1 = jnp.take(v, jnp.asarray(i1), axis=axis)
        shape = [1] * v.ndim
        shape[axis] = size_out
        wt = jnp.asarray(w1, dt).reshape(shape)
        return v0 + (v1 - v0) * wt

    x = axis_lerp(x, h, out_h, x.ndim - 3)
    return axis_lerp(x, w, out_w, x.ndim - 2)


def resize_nearest(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest-neighbour resize of [..., H, W, C] (torch 'nearest' convention)."""
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    iy = jnp.asarray(_nearest_indices(h, out_h))
    ix = jnp.asarray(_nearest_indices(w, out_w))
    x = jnp.take(x, iy, axis=-3)
    x = jnp.take(x, ix, axis=-2)
    return x


def upflow8(flow: jnp.ndarray) -> jnp.ndarray:
    """8x convex-free flow upsampling (RAFT fallback path).

    flow: [N, H, W, 2] -> [N, 8H, 8W, 2], scaled by 8.
    Mirrors model/modules/RAFT/utils/utils.py:89-91 (bilinear,
    align_corners=True).
    """
    n, h, w, _ = flow.shape
    return 8.0 * resize_bilinear(flow, 8 * h, 8 * w, align_corners=True)
