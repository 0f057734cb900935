"""Modulated deformable convolution (DCNv2) as an XLA gather + MXU matmul.

TPU-native replacement for `torchvision.ops.deform_conv2d` as called by the
reference's alignment modules (model/propainter.py:73-82,
model/recurrent_flow_completion.py:44-53). Both call sites use 3x3 kernels,
stride 1, padding 1, dilation 1, 16 offset groups — we specialize for
stride 1 / dilation 1 and keep kernel size and group count generic.

Design: instead of translating the CUDA kernel's per-pixel loop, we build
all kh*kw*G sampling locations at once, do one batched bilinear gather
(4 taps), apply the modulation mask, and contract the (tap, channel) axis
against the reshaped weight in a single [N*H*W, K*Cin] x [K*Cin, Cout]
matmul — which is exactly the shape the MXU wants.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_USE_PALLAS: bool | None = None


def _pallas_enabled() -> bool:
    """Pallas kernel on TPU by default; PROPAINTER_TPU_PALLAS=0 disables."""
    global _USE_PALLAS
    if _USE_PALLAS is None:
        _USE_PALLAS = (
            os.environ.get("PROPAINTER_TPU_PALLAS", "1") != "0"
            and jax.default_backend() == "tpu"
        )
    return _USE_PALLAS


def deform_conv2d(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    padding: int = 1,
) -> jnp.ndarray:
    """Dispatch: Pallas MXU kernel on TPU, XLA gather elsewhere.

    See deform_conv2d_xla below for shapes/semantics.
    """
    if _pallas_enabled():
        from .pallas.deform_conv import deform_conv2d_pallas

        return deform_conv2d_pallas(x, offset, mask, weight, bias, padding=padding)
    return deform_conv2d_xla(x, offset, mask, weight, bias, padding)


def deform_conv2d_xla(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    padding: int = 1,
) -> jnp.ndarray:
    """Modulated deformable 2D convolution, stride 1 / dilation 1.

    x:      [N, H, W, Cin]
    offset: [N, H, W, G, K, 2]   (dy, dx) per offset-group per kernel tap,
                                 K = kh*kw in row-major (ki, kj) order
    mask:   [N, H, W, G, K]      modulation scalars (already sigmoided)
    weight: [kh, kw, Cin, Cout]  (HWIO; full conv, groups=1)
    Returns [N, H, W, Cout].
    """
    n, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    g = offset.shape[3]
    cg = cin // g
    dt = x.dtype

    # Sampling coords: out pixel (i, j), tap (ki, kj), group g:
    #   y = i + ki - pad + dy,  x = j + kj - pad + dx
    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=dt), jnp.arange(w, dtype=dt), indexing="ij"
    )
    ky, kx = jnp.meshgrid(
        jnp.arange(kh, dtype=dt) - padding,
        jnp.arange(kw, dtype=dt) - padding,
        indexing="ij",
    )
    base_y = gy[:, :, None] + ky.reshape(-1)  # [H, W, K]
    base_x = gx[:, :, None] + kx.reshape(-1)
    sy = base_y[None, :, :, None, :] + offset[..., 0]  # [N, H, W, G, K]
    sx = base_x[None, :, :, None, :] + offset[..., 1]

    # Bilinear gather with zeros padding. Gather per group so each group's
    # coords address only its Cg channels: x grouped [N, H*W, G, Cg].
    xg = x.reshape(n, h * w, g, cg)

    def tap(iy, ix, wgt):
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        idx = (iyc * w + ixc).reshape(n, h * w * k, g)  # [N, HW*K, G] (K inner)
        # transpose (G, K) -> (K,) inner so take_along_axis broadcast works:
        # sy is [N, H, W, G, K]; move K before G for the gather index.
        v = jnp.take_along_axis(xg, idx[..., None], axis=1)  # [N, HW*K, G, Cg]
        wv = (wgt * valid.astype(dt)).reshape(n, h * w * k, g)
        return v * wv[..., None]

    # reorder [N, H, W, G, K] -> [N, H, W, K, G] so flattening is (pixel, K, G)
    def kg(a):
        return jnp.swapaxes(a, 3, 4)

    sy_t, sx_t = kg(sy), kg(sx)
    y0_t, x0_t = jnp.floor(sy_t), jnp.floor(sx_t)
    wy1_t, wx1_t = sy_t - y0_t, sx_t - x0_t
    wy0_t, wx0_t = 1.0 - wy1_t, 1.0 - wx1_t

    samp = (
        tap(y0_t, x0_t, wy0_t * wx0_t)
        + tap(y0_t, x0_t + 1, wy0_t * wx1_t)
        + tap(y0_t + 1, x0_t, wy1_t * wx0_t)
        + tap(y0_t + 1, x0_t + 1, wy1_t * wx1_t)
    )  # [N, HW*K, G, Cg]

    samp = samp * kg(mask).reshape(n, h * w * k, g)[..., None].astype(dt)
    # -> [N*H*W, K*Cin] with (K outer, Cin inner) to match weight layout.
    samp = samp.reshape(n, h * w, k, cin).reshape(n * h * w, k * cin)

    wmat = weight.astype(dt).reshape(k, cin, cout).reshape(k * cin, cout)
    out = jnp.matmul(samp, wmat, preferred_element_type=dt)
    out = out.reshape(n, h, w, cout)
    if bias is not None:
        out = out + bias.astype(dt)
    return out
