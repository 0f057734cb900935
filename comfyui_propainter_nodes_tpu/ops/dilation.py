"""Binary mask morphology on device.

Replaces the reference's host-side `scipy.ndimage.binary_dilation` loop
(utils/image_utils.py:156-165): scipy's default structuring element is the
4-connected cross, and k "iterations" are k successive dilations — which is
exactly k rounds of a cross-shaped max-pool. Runs batched over all frames
on device instead of per-frame on host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cross_dilate(m: jnp.ndarray) -> jnp.ndarray:
    """One 4-connected binary dilation step. m: [..., H, W] float {0,1}."""
    up = jnp.pad(m[..., 1:, :], [(0, 0)] * (m.ndim - 2) + [(0, 1), (0, 0)])
    down = jnp.pad(m[..., :-1, :], [(0, 0)] * (m.ndim - 2) + [(1, 0), (0, 0)])
    left = jnp.pad(m[..., :, 1:], [(0, 0)] * (m.ndim - 2) + [(0, 0), (0, 1)])
    right = jnp.pad(m[..., :, :-1], [(0, 0)] * (m.ndim - 2) + [(0, 0), (1, 0)])
    return jnp.maximum(m, jnp.maximum(jnp.maximum(up, down), jnp.maximum(left, right)))


def binary_dilation(mask: jnp.ndarray, iterations: int) -> jnp.ndarray:
    """Iterated 4-connected dilation of a {0,1} mask. mask: [..., H, W]."""
    m = (mask > 0).astype(mask.dtype)
    for _ in range(iterations):
        m = _cross_dilate(m)
    return m


def binarize(mask: jnp.ndarray, threshold: float = 0.1) -> jnp.ndarray:
    """Threshold binarization (reference utils/image_utils.py:119-123)."""
    return (mask > threshold).astype(mask.dtype)
