"""Pallas TPU kernel: modulated deformable convolution (DCNv2).

The XLA formulation in ops/deform_conv.py lowers its per-(group, tap)
bilinear gather to scalarized dynamic slices (~100 ms/frame at the
pipeline's 90x160x128 working shape). TPUs have no vector gather — but
they have an MXU. This kernel reformulates bilinear sampling as two
SEPARABLE TENT-WEIGHT CONTRACTIONS, laid out pixel-on-LANES:

    for row-window j (dynamic, exactly the rows this tile samples):
      for (g, k):
        oxT[w, p]        = tent(cols - sx)                  (VPU)
        tmpT[RW*cg, p]   = xgT[RW*cg, w] @ oxT[w, p]        (MXU)
        sT[g,k,cg, p]   += sum_rw tmpT[rw, cg, p] * oyT     (VPU)
    outT[co, p] += wT[co, g*k*cg] @ (sT * mask)             (MXU, ONE dot)

Bilinear weights are tents, so a pixel's y-contribution lives entirely
in rows [floor(sy), floor(sy)+1] and the sum over row windows is exact.
Both model call sites bound the learned offset residual with `A*tanh`
(our models/propainter.py:103, models/flow_completion.py:102), so the
rows sampled by one tile of 512 consecutive pixels span ~(tile rows +
taps + residual + local flow spread): the kernel reads the exact
[min, max] sampled row range per tile (computed outside, in XLA) and
walks it in RW-row windows STARTING AT the range's first row — unlike
the round-4 static y-band grid, no band-quantization waste, and
RW*cg = 128 makes every tent matmul exactly one MXU M-tile
([128, w] @ [w, TILE]; the old kernel's 24-row bands were 192 sublanes
= 2 M-tiles covering rows the tile never sampled). The per-(g, k)
output dots ([cout, cg] @ [cg, TILE], 144 of them) are replaced by ONE
[cout, g*k*cg] contraction against a VMEM-resident sample buffer.
Together: ~3.4x fewer MXU tile-ops per pixel tile at the
[*, 90, 160, 128] g16 call-site shape. Out-of-bounds taps get exact-zero
tent weights -> torchvision "zeros" padding semantics.

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
RW = 16  # rows per dynamic row window (RW * cg == 128 at cg=8)


def _kernel(
    lo_ref, nw_ref, sy_ref, sx_ref, mask_ref, x_ref, w_ref, out_ref,
    s_ref, *, h, w, cg, g, k, tile, rw,
):
    """Grid: (n, n_tiles, n_gb) — gb (deform-group blocks) iterates
    FASTEST so the out block is revisited consecutively and accumulates
    in VMEM across group blocks (g-blocking halves the x block, which
    dominates the kernel's scoped-VMEM budget for f32 operands)."""
    cols_t = jax.lax.broadcasted_iota(jnp.int32, (w, tile), 0).astype(jnp.float32)
    ni = pl.program_id(0)
    pt = pl.program_id(1)
    gb = pl.program_id(2)
    cout = out_ref.shape[1]

    rlo = lo_ref[ni, pt, 0]
    nw = nw_ref[ni, pt, 0]

    def g_body(gi, carry):
        # single fori_loop body over g: an unrolled loop would give
        # every iteration's MXU output its own VMEM stack slot and blow
        # the 16 MB scoped-vmem limit. k is unrolled (9 iterations
        # pipeline the MXU); the row-window loop is innermost so the
        # x row slice happens once per (g, window).
        def win_body(j, accs):
            start = rlo + j * rw
            xg_w = x_ref[0, 0, pl.ds(gi, 1), pl.ds(start, rw)].reshape(
                rw * cg, w
            )
            rows_t = (
                jax.lax.broadcasted_iota(jnp.int32, (rw, tile), 0) + start
            ).astype(jnp.float32)
            out = []
            for ki in range(k):
                sy = sy_ref[0, 0, pl.ds(gi, 1), ki, 0].reshape(1, tile)
                sx = sx_ref[0, 0, pl.ds(gi, 1), ki, 0].reshape(1, tile)
                # tent weights ARE the bilinear kernel: rows/cols floor(s)
                # and floor(s)+1 get (1-frac, frac), everything else
                # (incl. fully out-of-bounds taps and the -10 pixel
                # padding) gets exact 0
                ox_t = jnp.maximum(1.0 - jnp.abs(cols_t - sx), 0.0)  # [w, tile]
                oy_t = jnp.maximum(1.0 - jnp.abs(rows_t - sy), 0.0)  # [rw, tile]
                tmp_t = jnp.dot(
                    xg_w, ox_t.astype(xg_w.dtype),
                    preferred_element_type=jnp.float32,
                )  # [rw*cg, tile]
                s_t = jnp.sum(
                    tmp_t.reshape(rw, cg, tile) * oy_t[:, None, :], axis=0
                )  # [cg, tile]
                out.append(accs[ki] + s_t)
            return tuple(out)

        accs = jax.lax.fori_loop(
            0, nw, win_body,
            tuple(jnp.zeros((cg, tile), jnp.float32) for _ in range(k)),
        )
        # modulation masks applied once per (g, k) after the window sum;
        # rows stacked in (k, cg) order to match the weight layout
        masked = [
            accs[ki] * mask_ref[0, 0, pl.ds(gi, 1), ki, 0].reshape(1, tile)
            for ki in range(k)
        ]
        s_ref[pl.ds(gi, 1)] = jnp.concatenate(masked, axis=0)[None]
        return carry

    jax.lax.fori_loop(0, g, g_body, 0)

    # ONE output contraction for the whole group block: [cout, g*k*cg]
    # @ [g*k*cg, tile] replaces g*k tiny [cout, cg] dots
    s_flat = s_ref[...].reshape(g * k * cg, tile)
    acc = jnp.dot(
        w_ref[0].reshape(cout, g * k * cg), s_flat,
        preferred_element_type=jnp.float32,
    )

    @pl.when(gb == 0)
    def _():
        out_ref[0] = acc

    @pl.when(gb > 0)
    def _():
        out_ref[0] = out_ref[0] + acc


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
    rw = RW

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

    # per-tile sampled row range (drives the kernel's dynamic row
    # windows). Rows outside [0, h-1] contribute exact zeros (zero tent
    # weight or zero-padded data), so the range is clamped there; the
    # -10 pixel padding maps all-padding tiles to an empty range.
    syv = jnp.where(sy > -5.0, sy, jnp.float32(1e9))
    lo_t = jnp.floor(jnp.min(syv, axis=(1, 2, 4, 5))).astype(jnp.int32)
    syv = jnp.where(sy > -5.0, sy, jnp.float32(-1e9))
    hi_t = jnp.floor(jnp.max(syv, axis=(1, 2, 4, 5))).astype(jnp.int32) + 1
    lo_t = jnp.clip(lo_t, 0, h - 1)
    hi_t = jnp.clip(hi_t, 0, h - 1)
    # window count; empty ranges (hi < lo, all-padding tiles) give <= 0
    # and the kernel's fori_loop runs zero iterations
    nw_t = jnp.where(hi_t >= lo_t, (hi_t - lo_t) // rw + 1, 0)
    lo_t = lo_t.reshape(n, n_tiles, 1)  # [N, n_tiles, 1]
    nw_t = nw_t.reshape(n, n_tiles, 1).astype(jnp.int32)

    # x grouped, row-window sliceable: [N, G, Hpad, Cg, W]. h zero-padded
    # by RW so the LAST window (start <= h-1) stays in bounds; its
    # padded rows hit exact zeros, preserving torchvision "zeros"
    # padding semantics.
    h_pad = h + rw
    xg = x.reshape(n, h, w, g, cg).transpose(0, 3, 1, 4, 2)
    xg = jnp.pad(xg, ((0, 0), (0, 0), (0, h_pad - h), (0, 0), (0, 0)))
    # weight for the fused output dot: [Cout, G*K*Cg] in (g, k, cg) row
    # order matching the kernel's sample buffer
    wg = (
        weight.reshape(k, g, cg, cout)
        .transpose(3, 1, 0, 2)  # [cout, g, k, cg]
        .reshape(cout, g * k * cg)
        .astype(jnp.float32)
    )

    # the batch is a GRID dimension (not vmap): vmapping the pallas_call
    # made XLA hold the whole [N, Cout, hw_pad] f32 result as a scoped
    # VMEM stack allocation, which blows the 16MB limit for N >= ~5 when
    # the call isn't consumed by a fusion (standalone jit, verify
    # scripts). As a grid dim each (image, tile) block streams to HBM.
    # f32 operands double both the x block and the per-iteration stack;
    # g-blocking (n_gb=2, gb iterating fastest with out-block
    # accumulation) halves the x block to compensate.
    import os

    n_gb = 1 if x.dtype == jnp.bfloat16 else 2
    n_gb = int(os.environ.get("PROPAINTER_TPU_DEFORM_GB", n_gb))
    g_blk = g // n_gb if g % n_gb == 0 else g
    n_gb = g // g_blk
    grid = (n, n_tiles, n_gb)
    kern = functools.partial(
        _kernel, h=h, w=w, cg=cg, g=g_blk, k=k, tile=tile, rw=rw
    )

    from jax.experimental.pallas import tpu as pltpu

    sy = sy.reshape(n, n_gb, g_blk, k, n_tiles, 1, tile)
    sx = sx.reshape(n, n_gb, g_blk, k, n_tiles, 1, tile)
    mk = mk.reshape(n, n_gb, g_blk, k, n_tiles, 1, tile)
    xg = xg.reshape(n, n_gb, g_blk, h_pad, cg, w)
    wg = wg.reshape(cout, n_gb, g_blk * k * cg).transpose(1, 0, 2)

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
                (1, cout, g_blk * k * cg), lambda ni, pt, gb: (gb, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, cout, tile), lambda ni, pt, gb: (ni, 0, pt)
        ),
        out_shape=jax.ShapeDtypeStruct((n, cout, hw_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((g_blk, k * cg, tile), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * hw_pad * g * k * (2 * rw * cg * w + cg * cout),
            bytes_accessed=n * (hw_pad * g * k * 12 + g * h * w * cg * 2),
            transcendentals=0,
        ),
        # XLA's scoped-vmem accounting of this call is batch-dependent
        # in ways the 16MB default doesn't survive (N=12 standalone jit
        # measured 17.69M while N=2 fits; NOTES_ROUND4 §7's non-monotone
        # lesson). v5e has 128MB VMEM — give the kernel real headroom.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(lo_t, nw_t, sy, sx, mk, xg, wg)
    # barrier: without it XLA's scoped-vmem assignment tries to keep the
    # whole custom-call result on the VMEM stack when the call is a jit
    # entry (standalone use, verify scripts) and OOMs
    out = jax.lax.optimization_barrier(out)
    out = out[:, :, :hw].transpose(0, 2, 1).reshape(n, h, w, cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)
