"""Pallas TPU kernel: modulated deformable convolution (DCNv2).

The XLA formulation in ops/deform_conv.py lowers its per-(group, tap)
bilinear gather to scalarized dynamic slices (~100 ms/frame at the
pipeline's 90x160x128 working shape). TPUs have no vector gather — but
they have an MXU. This kernel reformulates bilinear sampling as two
SEPARABLE TENT-WEIGHT CONTRACTIONS, laid out pixel-on-LANES:

    for y-band b (static, skipped unless sampled):   # BAND rows of x
      for (g, k):
        oxT[w, p]        = tent(cols - sx)                  (VPU)
        tmpT[b*cg, p]    = xgT[b*cg, w] @ oxT[w, p]         (MXU)
        sT[cg, p]        = sum_b tmpT[b, cg, p] * oyT[b, p] (VPU)
        outT[co, p]     += wkT[co, cg] @ (sT * mask)        (MXU)

Bilinear weights are tents, so a pixel's y-contribution lives entirely
in rows [floor(sy), floor(sy)+1] and the sum over y-bands is exact.
Both model call sites bound the learned offset residual with `A*tanh`
(our models/propainter.py:103, models/flow_completion.py:102), so the
rows sampled by one tile of 512 consecutive pixels span ~(tile rows +
taps + residual + local flow spread) — the kernel computes the exact
[min, max] row range per tile and `pl.when`-skips every y-band outside
it: typically 1-2 of ceil(h/BAND) bands execute. Out-of-bounds taps get
exact-zero tent weights -> torchvision "zeros" padding semantics.

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
BAND = 24  # y-rows per band


def _kernel(
    lo_ref, hi_ref, sy_ref, sx_ref, mask_ref, x_ref, w_ref, out_ref, *, h, w, cg, g, k,
    tile,
):
    """Grid: (n, n_tiles, n_gb) — gb (deform-group blocks) iterates
    FASTEST so the out block is revisited consecutively and accumulates
    in VMEM across group blocks (g-blocking halves the x block, which
    dominates the kernel's scoped-VMEM budget for f32 operands)."""
    cols_t = jax.lax.broadcasted_iota(jnp.int32, (w, tile), 0).astype(jnp.float32)
    n_bands = -(-h // BAND)
    ni = pl.program_id(0)
    pt = pl.program_id(1)
    gb = pl.program_id(2)

    def band_body(start, bsz):
        # single fori_loop body over (g, k): an unrolled loop would give
        # every iteration's MXU output its own VMEM stack slot (144 x
        # ~128 KB blows the 16 MB scoped-vmem limit)
        rows_t = (
            jax.lax.broadcasted_iota(jnp.int32, (bsz, tile), 0) + start
        ).astype(jnp.float32)

        def g_body(gi, acc):
            # k unrolled (9 iterations pipeline the MXU); g looped so the
            # per-iteration buffers don't multiply by 144
            xg_m = x_ref[0, 0, pl.ds(gi, 1), pl.ds(start, bsz)].reshape(
                bsz * cg, w
            )
            for ki in range(k):
                sy = sy_ref[0, 0, pl.ds(gi, 1), ki, 0].reshape(1, tile)
                sx = sx_ref[0, 0, pl.ds(gi, 1), ki, 0].reshape(1, tile)
                m = mask_ref[0, 0, pl.ds(gi, 1), ki, 0].reshape(1, tile)
                # tent weights ARE the bilinear kernel: rows/cols floor(s)
                # and floor(s)+1 get (1-frac, frac), everything else
                # (incl. fully out-of-bounds taps and the -10 pixel
                # padding) gets exact 0
                ox_t = jnp.maximum(1.0 - jnp.abs(cols_t - sx), 0.0)  # [w, tile]
                oy_t = jnp.maximum(1.0 - jnp.abs(rows_t - sy), 0.0)  # [bsz, tile]
                tmp_t = jnp.dot(
                    xg_m, ox_t.astype(xg_m.dtype), preferred_element_type=jnp.float32
                )  # [bsz*cg, tile]
                s_t = jnp.sum(
                    tmp_t.reshape(bsz, cg, tile) * oy_t[:, None, :], axis=0
                )  # [cg, tile]
                s_t = s_t * m
                wk_t = w_ref[0, pl.ds(gi, 1), ki].reshape(
                    out_ref.shape[1], cg
                ).astype(jnp.float32)
                acc = acc + jnp.dot(wk_t, s_t, preferred_element_type=jnp.float32)
            return acc

        acc = jax.lax.fori_loop(
            0, g, g_body, jnp.zeros((out_ref.shape[1], tile), jnp.float32)
        )
        out_ref[0] = out_ref[0] + acc

    @pl.when(gb == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    if n_bands == 1:
        band_body(0, h)
        return

    # row range actually sampled by this tile (reduced outside, in XLA);
    # iterate only the bands inside it — ONE loop body instance, so the
    # kernel's VMEM stack does not scale with the band count
    lo = lo_ref[ni, pt, 0]
    hi = hi_ref[ni, pt, 0]
    b0 = jnp.maximum(lo // BAND, 0)
    b1 = jnp.minimum(hi // BAND + 1, n_bands)

    def loop_body(b, carry):
        band_body(b * BAND, BAND)
        return carry

    jax.lax.fori_loop(b0, b1, loop_body, 0)


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
    # f32 operands double the kernel's per-iteration VMEM stack (the k=9
    # unrolled intermediates); halve the pixel tile to stay inside the
    # 16MB scoped-vmem limit
    tile = TILE if x.dtype == jnp.bfloat16 else TILE // 2

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

    n_tiles = -(-hw // tile)
    hw_pad = n_tiles * tile
    if hw_pad != hw:
        padp = ((0, 0), (0, 0), (0, 0), (0, hw_pad - hw))
        sy = jnp.pad(sy, padp, constant_values=-10.0)  # zero tent weight
        sx = jnp.pad(sx, padp, constant_values=-10.0)
        mk = jnp.pad(mk, padp)
    # pixels on LANES: [N, G, K, n_tiles, 1, TILE]
    sy = sy.reshape(n, g, k, n_tiles, 1, tile)
    sx = sx.reshape(n, g, k, n_tiles, 1, tile)
    mk = mk.reshape(n, g, k, n_tiles, 1, tile)

    # per-tile sampled row range (drives the kernel's y-band skipping);
    # -10 pixel padding excluded so it never drags lo below 0
    syv = jnp.where(sy > -5.0, sy, jnp.float32(1e9))
    lo_t = jnp.floor(jnp.min(syv, axis=(1, 2, 4, 5))).astype(jnp.int32)
    syv = jnp.where(sy > -5.0, sy, jnp.float32(-1e9))
    hi_t = jnp.floor(jnp.max(syv, axis=(1, 2, 4, 5))).astype(jnp.int32) + 1
    lo_t = lo_t.reshape(n, n_tiles, 1)  # [N, n_tiles, 1]
    hi_t = hi_t.reshape(n, n_tiles, 1)

    # x grouped, y-band sliceable: [N, G, Hpad, Cg, W]; weight [G, K, Cout, Cg].
    # h zero-padded to a band multiple: out-of-range tent rows then hit
    # exact zeros, preserving torchvision "zeros" padding semantics.
    h_pad = -(-h // BAND) * BAND if h > BAND else h
    xg = x.reshape(n, h, w, g, cg).transpose(0, 3, 1, 4, 2)
    if h_pad != h:
        xg = jnp.pad(xg, ((0, 0), (0, 0), (0, h_pad - h), (0, 0), (0, 0)))
    wg = weight.reshape(k, g, cg, cout).transpose(1, 0, 3, 2).astype(jnp.float32)

    # the batch is a GRID dimension (not vmap): vmapping the pallas_call
    # made XLA hold the whole [N, Cout, hw_pad] f32 result as a scoped
    # VMEM stack allocation, which blows the 16MB limit for N >= ~5 when
    # the call isn't consumed by a fusion (standalone jit, verify
    # scripts). As a grid dim each (image, tile) block streams to HBM.
    # f32 operands double both the x block and the per-iteration stack;
    # g-blocking (n_gb=2, gb iterating fastest with out-block
    # accumulation) halves the x block to compensate.
    n_gb = 1 if x.dtype == jnp.bfloat16 else 2
    g_blk = g // n_gb if g % n_gb == 0 else g
    n_gb = g // g_blk
    grid = (n, n_tiles, n_gb)
    kern = functools.partial(
        _kernel, h=h, w=w, cg=cg, g=g_blk, k=k, tile=tile
    )
    band = min(BAND, h)

    from jax.experimental.pallas import tpu as pltpu

    sy = sy.reshape(n, n_gb, g_blk, k, n_tiles, 1, tile)
    sx = sx.reshape(n, n_gb, g_blk, k, n_tiles, 1, tile)
    mk = mk.reshape(n, n_gb, g_blk, k, n_tiles, 1, tile)
    xg = xg.reshape(n, n_gb, g_blk, h_pad, cg, w)
    wg = wg.reshape(n_gb, g_blk, k, cout, cg)

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (n, n_tiles, 1),
                lambda ni, pt, gb: (0, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (n, n_tiles, 1),
                lambda ni, pt, gb: (0, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, g_blk, k, 1, 1, tile),
                lambda ni, pt, gb: (ni, gb, 0, 0, pt, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, g_blk, k, 1, 1, tile),
                lambda ni, pt, gb: (ni, gb, 0, 0, pt, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, g_blk, k, 1, 1, tile),
                lambda ni, pt, gb: (ni, gb, 0, 0, pt, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, g_blk, h_pad, cg, w),
                lambda ni, pt, gb: (ni, gb, 0, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, g_blk, k, cout, cg), lambda ni, pt, gb: (gb, 0, 0, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, cout, tile), lambda ni, pt, gb: (ni, 0, pt)
        ),
        out_shape=jax.ShapeDtypeStruct((n, cout, hw_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * hw_pad * g * k * (2 * band * cg * w + cg * cout),
            bytes_accessed=n * (hw_pad * g * k * 12 + g * h * w * cg * 2),
            transcendentals=0,
        ),
    )(lo_t, hi_t, sy, sx, mk, xg, wg)
    # barrier: without it XLA's scoped-vmem assignment tries to keep the
    # whole custom-call result on the VMEM stack when the call is a jit
    # entry (standalone use, verify scripts) and OOMs
    out = jax.lax.optimization_barrier(out)
    out = out[:, :, :hw].transpose(0, 2, 1).reshape(n, h, w, cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)
