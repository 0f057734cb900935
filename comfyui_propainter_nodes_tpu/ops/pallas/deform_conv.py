"""Pallas TPU kernel: modulated deformable convolution (DCNv2).

The XLA formulation in ops/deform_conv.py lowers its per-(group, tap)
bilinear gather to scalarized dynamic slices (~100 ms/frame at the
pipeline's 90x160x128 working shape). TPUs have no vector gather — but
they have an MXU. This kernel reformulates bilinear sampling as two
SEPARABLE ONE-HOT CONTRACTIONS:

    sample[p] = onehot_y[p, :] @ X @ onehot_x[p, :]^T

where onehot_y[p, h] carries the two bilinear row weights (zero
elsewhere — out-of-bounds taps vanish automatically, matching "zeros"
padding). Per (pixel-tile, group, tap) grid step:

    tmp[p, wc*cg] = oy[p, h] @ x_g[h, wc*cg]       (MXU, W chunked)
    s[p, cg]     += sum_w ox[p, wc] * tmp[p, wc, cg] (VPU)
    out[p, :]    += (s * mask) @ W[g, k]             (MXU)

The group image (H x W x Cg) stays in VMEM; `out` is revisited across
the (g, k) minor grid dims and accumulated in place. Pixel tiles are
8x128 = 1024 wide to satisfy Mosaic's (8, 128) block tiling.

Semantics identical to ops.deform_conv2d_xla (stride 1, dilation 1,
torchvision layout; reference call sites model/propainter.py:73-82,
model/recurrent_flow_completion.py:44-53).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024  # 8 sublanes x 128 lanes of pixels
W_CHUNK = 128  # width chunking bounds the tmp buffer in VMEM


def _kernel(sy_ref, sx_ref, mask_ref, x_ref, w_ref, out_ref, *, h, w, cg):
    g = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when((g == 0) & (k == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    sy = sy_ref[0, 0, 0]  # [TILE, 1]
    sx = sx_ref[0, 0, 0]
    m = mask_ref[0, 0, 0]

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy1 = sy - y0  # [TILE, 1] broadcasts over the lane dim
    wx1 = sx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE, h), 1)
    # two-hot bilinear row weights; indices outside [0, H) never match the
    # iota -> zeros padding for free
    oy = jnp.where(rows == y0i, 1.0 - wy1, 0.0) + jnp.where(
        rows == y0i + 1, wy1, 0.0
    )

    xg = x_ref[0]  # [h, w*cg], w-major: column j = (w_idx * cg + c)
    s = jnp.zeros((TILE, cg), jnp.float32)
    for wc in range(0, w, W_CHUNK):
        wcs = min(W_CHUNK, w - wc)
        xc = xg[:, wc * cg : (wc + wcs) * cg]  # [h, wcs*cg]
        tmp = jnp.dot(
            oy.astype(xc.dtype), xc, preferred_element_type=jnp.float32
        )  # [TILE, wcs*cg]
        # expanded column weights: column j belongs to width wc + j // cg
        cols_e = (
            jax.lax.broadcasted_iota(jnp.int32, (TILE, wcs * cg), 1) // cg + wc
        )
        ox_e = jnp.where(cols_e == x0i, 1.0 - wx1, 0.0) + jnp.where(
            cols_e == x0i + 1, wx1, 0.0
        )
        # per-channel segment sum over the w-major layout as a matmul with
        # a {0,1} selection matrix (avoids lane reshapes Mosaic rejects)
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (wcs * cg, cg), 0) % cg
            == jax.lax.broadcasted_iota(jnp.int32, (wcs * cg, cg), 1)
        ).astype(jnp.float32)
        s = s + jnp.dot(tmp * ox_e, sel, preferred_element_type=jnp.float32)

    s = s * m
    wk = w_ref[0, 0].astype(jnp.float32)  # [cg, cout]
    out_ref[:] += jnp.dot(s, wk, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("padding",))
def deform_conv2d_pallas(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    padding: int = 1,
) -> jnp.ndarray:
    """Drop-in for ops.deform_conv2d_xla (same shapes/layouts).

    x:      [N, H, W, Cin]
    offset: [N, H, W, G, K, 2] (dy, dx)
    mask:   [N, H, W, G, K]
    weight: [kh, kw, Cin, Cout]
    """
    n, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    g = offset.shape[3]
    cg = cin // g
    hw = h * w

    # sampling coords per (g, k, pixel): base grid + tap + offset
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
    # -> [N, G, K, HW]
    sy = sy.transpose(0, 3, 4, 1, 2).reshape(n, g, k, hw)
    sx = sx.transpose(0, 3, 4, 1, 2).reshape(n, g, k, hw)
    mk = mask.astype(jnp.float32).transpose(0, 3, 4, 1, 2).reshape(n, g, k, hw)

    n_tiles = -(-hw // TILE)
    hw_pad = n_tiles * TILE
    if hw_pad != hw:
        padp = ((0, 0), (0, 0), (0, 0), (0, hw_pad - hw))
        sy = jnp.pad(sy, padp, constant_values=-10.0)  # never matches iota
        sx = jnp.pad(sx, padp, constant_values=-10.0)
        mk = jnp.pad(mk, padp)
    # [TILE, 1] pixel layout: arrives in-kernel pre-shaped for sublane
    # broadcasting (Mosaic rejects lane-collapsing reshapes)
    sy = sy.reshape(n, g, k, n_tiles, TILE, 1)
    sx = sx.reshape(n, g, k, n_tiles, TILE, 1)
    mk = mk.reshape(n, g, k, n_tiles, TILE, 1)

    # x grouped + w-major flattened [N, G, H, W*Cg]; weight [G, K, Cg, Cout]
    xg = (
        x.reshape(n, h, w, g, cg)
        .transpose(0, 3, 1, 2, 4)
        .reshape(n, g, h, w * cg)
    )
    wg = weight.reshape(k, g, cg, cout).transpose(1, 0, 2, 3).astype(jnp.float32)

    grid = (n_tiles, g, k)
    kern = functools.partial(_kernel, h=h, w=w, cg=cg)

    def run_one(xg1, sy1, sx1, mk1):
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, 1, TILE, 1), lambda pt, gi, ki: (gi, ki, pt, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, 1, TILE, 1), lambda pt, gi, ki: (gi, ki, pt, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, 1, TILE, 1), lambda pt, gi, ki: (gi, ki, pt, 0, 0)
                ),
                pl.BlockSpec((1, h, w * cg), lambda pt, gi, ki: (gi, 0, 0)),
                pl.BlockSpec(
                    (1, 1, cg, cout), lambda pt, gi, ki: (gi, ki, 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec((TILE, cout), lambda pt, gi, ki: (pt, 0)),
            out_shape=jax.ShapeDtypeStruct((hw_pad, cout), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * hw_pad * g * k * (h * w * cg + cg * cout),
                bytes_accessed=hw_pad * g * k * 12 + g * h * w * cg * 2,
                transcendentals=0,
            ),
        )(sy1, sx1, mk1, xg1, wg)

    out = jax.vmap(run_one)(xg, sy, sx, mk)  # [N, hw_pad, Cout]
    out = out[:, :hw, :].reshape(n, h, w, cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)
