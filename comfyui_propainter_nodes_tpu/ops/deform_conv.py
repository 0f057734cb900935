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
    """Dispatch: Pallas tent-contraction kernel on TPU
    (PROPAINTER_TPU_DEFORM=quad selects the gather formulation — measured
    13x SLOWER on v5e, kept as an instrumented alternative), plain XLA
    gather elsewhere.

    See deform_conv2d_xla below for shapes/semantics.
    """
    if _pallas_enabled():
        if os.environ.get("PROPAINTER_TPU_DEFORM", "pallas") == "quad":
            return deform_conv2d_quad(x, offset, mask, weight, bias, padding)
        from .pallas.deform_conv import deform_conv2d_pallas

        return deform_conv2d_pallas(
            x, offset, mask, weight, bias, padding=padding
        )
    return deform_conv2d_xla(x, offset, mask, weight, bias, padding)


def deform_conv2d_quad(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    padding: int = 1,
) -> jnp.ndarray:
    """deform_conv2d_xla's semantics via ONE flat row-gather per sample.

    TPUs have no vector gather, but XLA's `take_along_axis` on a flat
    [B, L, C] operand with a [B, P, 1] index lowers to an efficient
    row-DMA stream (the same pattern ops/warp.py uses). Two tricks make
    the bilinear deformable sample fit that exact pattern:

      * the four bilinear corners of a sample are QUAD-PACKED into one
        row — xq[y, x] = (xp[y, x], xp[y, x+1], xp[y+1, x], xp[y+1, x+1])
        over a zero-padded grid — so each (pixel, tap, group) needs ONE
        gathered row instead of four (and no per-corner validity fixup:
        out-of-range corners read exact zeros from the pad border);
      * the (batch, group) axes flatten into the gather batch so the
        index is a plain [B, P, 1] along one axis (a multi-axis index
        forces XLA's slow general-gather path).

    MEASURED RESULT (v5e): 13x SLOWER than the tent-contraction Pallas
    kernel at the featprop alignment shape (189 ms vs 14 ms at
    [5,90,160,128]x16 groups) — XLA's take_along_axis does NOT hit a
    vectorized path at this gather count (10.4M rows/call); the row-DMA
    stream the warp enjoys doesn't materialize here. Kept (with tests)
    as the measured alternative and for gather-capable backends; select
    with PROPAINTER_TPU_DEFORM=quad. Exact same tap arithmetic as
    deform_conv2d_xla.
    """
    n, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    g = offset.shape[3]
    cg = cin // g
    dt = x.dtype

    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    ky, kx = jnp.meshgrid(
        jnp.arange(kh, dtype=jnp.float32) - padding,
        jnp.arange(kw, dtype=jnp.float32) - padding,
        indexing="ij",
    )
    base_y = gy[:, :, None] + ky.reshape(-1)  # [H, W, K]
    base_x = gx[:, :, None] + kx.reshape(-1)
    sy = base_y[None, :, :, None, :] + offset[..., 0].astype(jnp.float32)
    sx = base_x[None, :, :, None, :] + offset[..., 1].astype(jnp.float32)

    # corner base (floor), clamped into the 1-px zero-pad border: any
    # corner outside [0, H) x [0, W) lands on an exact-zero padded row
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = (sy - y0).astype(dt)
    fx = (sx - x0).astype(dt)
    iy = jnp.clip(y0, -2.0, float(h)).astype(jnp.int32) + 2  # [0, H+2]
    ix = jnp.clip(x0, -2.0, float(w)).astype(jnp.int32) + 2
    # clamping kills the tent weight only for fully-OOB taps, where both
    # corners of that axis are outside; fy/fx still weight the quad, but
    # every corner value is zero, so the sample is exactly zero.

    # quad-packed operand: rows (y, x) of xq hold corners (y, x),
    # (y, x+1), (y+1, x), (y+1, x+1) of the zero-padded grid. A 2-px
    # zero border on every side gives each clamped corner base
    # (iy in [0, H+2]) a real xq row whose quad reads exact zeros for
    # every out-of-range corner — including bases clamped from far away,
    # where BOTH corners must be zero.
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))  # [N, H+4, W+4, C]
    hq, wq = h + 3, w + 3
    q00 = xp[:, :-1, :-1]
    q01 = xp[:, :-1, 1:]
    q10 = xp[:, 1:, :-1]
    q11 = xp[:, 1:, 1:]
    xq = jnp.stack([q00, q01, q10, q11], axis=3)  # [N, hq, wq, 4, C]
    xq = xq.reshape(n, hq * wq, 4, g, cg)
    xq = jnp.moveaxis(xq, 3, 1).reshape(n * g, hq * wq, 4 * cg)

    # flat gather index, (batch*group)-major like the operand
    idx = iy * wq + ix  # [N, H, W, G, K]
    idx = idx.transpose(0, 3, 1, 2, 4).reshape(n * g, h * w * k)
    rows = jnp.take_along_axis(xq, idx[:, :, None], axis=1)
    rows = rows.reshape(n, g, h * w, k, 4, cg)

    # bilinear weights per corner + modulation
    fy = fy.transpose(0, 3, 1, 2, 4).reshape(n, g, h * w, k)
    fx = fx.transpose(0, 3, 1, 2, 4).reshape(n, g, h * w, k)
    w00 = (1 - fy) * (1 - fx)
    w01 = (1 - fy) * fx
    w10 = fy * (1 - fx)
    w11 = fy * fx
    cw = jnp.stack([w00, w01, w10, w11], axis=-1)  # [N, G, HW, K, 4]
    mk = mask.astype(dt).transpose(0, 3, 1, 2, 4).reshape(n, g, h * w, k)
    cw = cw * mk[..., None]
    samp = jnp.einsum("ngpkq,ngpkqc->ngpkc", cw, rows)  # [N, G, HW, K, Cg]

    # -> [N*H*W, K*Cin] with (K outer, Cin inner) matching weight layout
    samp = samp.transpose(0, 2, 3, 1, 4).reshape(n * h * w, k * cin)
    wmat = weight.astype(dt).reshape(k, cin, cout).reshape(k * cin, cout)
    out = jnp.matmul(samp, wmat, preferred_element_type=dt)
    out = out.reshape(n, h, w, cout)
    if bias is not None:
        out = out + bias.astype(dt)
    return out


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
