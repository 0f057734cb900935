"""Pooling ops (NHWC) via lax.reduce_window — one XLA op each."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def max_pool2d(
    x: jnp.ndarray,
    kernel_size: tuple[int, int],
    stride: tuple[int, int],
    padding: tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    """torch.nn.MaxPool2d equivalent (ceil_mode=False, -inf padding).

    x: [..., H, W, C].
    """
    kh, kw = kernel_size
    sh, sw = stride
    ph, pw = padding
    nd = x.ndim
    window = (1,) * (nd - 3) + (kh, kw, 1)
    strides = (1,) * (nd - 3) + (sh, sw, 1)
    pads = ((0, 0),) * (nd - 3) + ((ph, ph), (pw, pw), (0, 0))
    if jnp.issubdtype(x.dtype, jnp.floating):
        init = -jnp.inf
    else:
        init = jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x, jnp.asarray(init, x.dtype), jax.lax.max, window, strides, pads
    )


def avg_pool2d(
    x: jnp.ndarray, kernel_size: tuple[int, int], stride: tuple[int, int]
) -> jnp.ndarray:
    """torch F.avg_pool2d (no padding), used for RAFT's corr pyramid
    (model/modules/RAFT/corr.py:26). x: [..., H, W, C]."""
    kh, kw = kernel_size
    sh, sw = stride
    nd = x.ndim
    window = (1,) * (nd - 3) + (kh, kw, 1)
    strides = (1,) * (nd - 3) + (sh, sw, 1)
    summed = jax.lax.reduce_window(
        x, jnp.asarray(0, x.dtype), jax.lax.add, window, strides, "VALID"
    )
    return summed / (kh * kw)
