"""Pallas TPU kernel: modulated deformable convolution (DCNv2).

The XLA formulation in ops/deform_conv.py lowers its per-(group, tap)
bilinear gather to scalarized dynamic slices (~100 ms/frame at the
pipeline's 90x160x128 working shape). TPUs have no vector gather — but
they have an MXU. This kernel reformulates bilinear sampling as two
SEPARABLE ONE-HOT CONTRACTIONS, laid out pixel-on-LANES so the
per-(group, tap) pixel scalars are dense [1, TILE] row vectors (the
pixel-on-sublanes variant padded every scalar vector to 128 lanes and
blew VMEM once all 144 (g, k) pairs shared one grid step):

    for (g, k):                       # one grid step per pixel tile
      oyT[h, p]    = two-hot bilinear row weights      (iota compare)
      tmpT[wc, p]  = xgT[wc, h] @ oyT[h, p]            (MXU)
      sT[c, p]     = SELT[c, wc] @ (tmpT * oxT_rep)    (MXU segment sum)
      accT[co, p] += wkT[co, c] @ (sT * mask)          (MXU)

Out-of-bounds taps never match the iota -> exact "zeros" padding.
Semantics identical to ops.deform_conv2d_xla (stride 1, dilation 1,
torchvision layout; reference call sites model/propainter.py:73-82,
model/recurrent_flow_completion.py:44-53).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


TILE = 512  # pixels per grid step, on the lane axis


def _kernel(sy_ref, sx_ref, mask_ref, x_ref, w_ref, out_ref, *, h, w, cg, g, k):
    wcg = w * cg
    # tpu.iota is integer-only; build int then cast
    rows_t = jax.lax.broadcasted_iota(jnp.int32, (h, TILE), 0).astype(jnp.float32)
    colsr_t = (
        jax.lax.broadcasted_iota(jnp.int32, (wcg, TILE), 0) // cg
    ).astype(jnp.float32)
    # {0,1} per-channel segment-sum matrix over the w-major layout
    sel_t = (
        jax.lax.broadcasted_iota(jnp.int32, (cg, wcg), 1) % cg
        == jax.lax.broadcasted_iota(jnp.int32, (cg, wcg), 0)
    ).astype(jnp.float32)

    acc = jnp.zeros((out_ref.shape[0], TILE), jnp.float32)
    for gi in range(g):
        xg_t = x_ref[gi]  # [w*cg, h]
        for ki in range(k):
            sy = sy_ref[gi, ki, 0]  # [1, TILE]
            sx = sx_ref[gi, ki, 0]
            m = mask_ref[gi, ki, 0]
            # bilinear weights ARE the tent function: rows floor(s) and
            # floor(s)+1 get (1-frac, frac), everything else (incl. fully
            # out-of-bounds taps and the -10 pixel padding) gets exact 0 —
            # 3 VPU ops instead of the v1 iota-compare two-hot (which was
            # the kernel's VPU bottleneck)
            oy_t = jnp.maximum(1.0 - jnp.abs(rows_t - sy), 0.0)  # [h, TILE]
            ox_t = jnp.maximum(1.0 - jnp.abs(colsr_t - sx), 0.0)  # [w*cg, TILE]
            tmp_t = jnp.dot(
                xg_t, oy_t.astype(xg_t.dtype), preferred_element_type=jnp.float32
            )  # [w*cg, TILE]
            s_t = jnp.dot(
                sel_t, tmp_t * ox_t, preferred_element_type=jnp.float32
            )  # [cg, TILE]
            s_t = s_t * m
            wk_t = w_ref[gi, ki].astype(jnp.float32)  # [cout, cg]
            acc = acc + jnp.dot(wk_t, s_t, preferred_element_type=jnp.float32)
    out_ref[...] = acc


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
    # pixels on LANES: [N, G, K, n_tiles, 1, TILE]
    sy = sy.reshape(n, g, k, n_tiles, 1, TILE)
    sx = sx.reshape(n, g, k, n_tiles, 1, TILE)
    mk = mk.reshape(n, g, k, n_tiles, 1, TILE)

    # x grouped, w-major flattened, TRANSPOSED [N, G, W*Cg, H];
    # weight [G, K, Cout, Cg]
    xg = (
        x.reshape(n, h, w, g, cg)
        .transpose(0, 3, 2, 4, 1)
        .reshape(n, g, w * cg, h)
    )
    wg = weight.reshape(k, g, cg, cout).transpose(1, 0, 3, 2).astype(jnp.float32)

    grid = (n_tiles,)
    kern = functools.partial(_kernel, h=h, w=w, cg=cg, g=g, k=k)

    def run_one(xg1, sy1, sx1, mk1):
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((g, k, 1, 1, TILE), lambda pt: (0, 0, pt, 0, 0)),
                pl.BlockSpec((g, k, 1, 1, TILE), lambda pt: (0, 0, pt, 0, 0)),
                pl.BlockSpec((g, k, 1, 1, TILE), lambda pt: (0, 0, pt, 0, 0)),
                pl.BlockSpec((g, w * cg, h), lambda pt: (0, 0, 0)),
                pl.BlockSpec((g, k, cout, cg), lambda pt: (0, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((cout, TILE), lambda pt: (0, pt)),
            out_shape=jax.ShapeDtypeStruct((cout, hw_pad), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * hw_pad * g * k * (h * w * cg + cg * cout),
                bytes_accessed=hw_pad * g * k * 12 + g * h * w * cg * 2,
                transcendentals=0,
            ),
        )(sy1, sx1, mk1, xg1, wg)

    out = jax.vmap(run_one)(xg, sy, sx, mk)  # [N, Cout, hw_pad]
    out = out[:, :, :hw].transpose(0, 2, 1).reshape(n, h, w, cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)
