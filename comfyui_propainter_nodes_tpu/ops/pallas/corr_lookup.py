"""Pallas TPU kernel: RAFT correlation window gather via pipelined DMA.

The profiled bottleneck of the whole pipeline: fetching each pixel's
(2r+2)^2 window from its own correlation map, 4 levels x 20 iterations.
Every XLA gather formulation plateaus at ~20ns per INDEX (~0.4s per
iteration at 640x360 -> ~30s of pure gather per 24-frame video).

This kernel restructures the fetch around what the hardware does fast:

  * ONE async DMA per pixel moves window rows (1, 10, Wp_full) — a
    sublane slice with a full minor dim, which Mosaic's DMA alignment
    rules allow (partial minor-dim slices are rejected) — through a ring
    of semaphores, so transfers overlap issue and compute;
  * the column selection that would need a per-pixel lane gather becomes
    a per-pixel `pltpu.roll` (tpu.dynamic_rotate by a scalar) + static
    slice;
  * the shared-fraction bilinear combine runs vectorized over the tile.

~30x less gather-op overhead than the XLA path; DMA bandwidth is
~12 KB/pixel/iteration (~0.5 GB per iteration at 640x360).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256
NSEM = 16
WIN = 10  # 2r+2
# the fused 4-level kernel carries 4x the scratch and a (TILE,4,9,9)
# out block whose (9,9) minor dims pad to (16,128) vector tiles — a
# smaller pixel tile keeps it inside the 16MB VMEM budget
TILE4 = 128


def _kernel(
    sy_ref, sx_ref, fy_ref, fx_ref, corr_hbm, out_ref, rows, rolled, sems, *, m, wpp
):
    base = pl.program_id(0) * TILE

    def get_dma(i):
        pix = jnp.minimum(base + i, m - 1)  # grid padding re-reads map m-1
        return pltpu.make_async_copy(
            corr_hbm.at[pix, pl.ds(sy_ref[i, 0], WIN), :],
            rows.at[i],
            sems.at[i % NSEM],
        )

    def issue(i, _):
        @pl.when(i >= NSEM)
        def _():
            get_dma(i - NSEM).wait()
            # lane-align the finished window: rotate its columns so the
            # window starts at lane 0, then the extract is a static slice
            j = i - NSEM
            rolled[j] = pltpu.roll(rows[j], -sx_ref[j, 0], 1)

        get_dma(i).start()
        return 0

    jax.lax.fori_loop(0, TILE, issue, 0)

    def drain(k, _):
        i = TILE - NSEM + k
        get_dma(i).wait()
        rolled[i] = pltpu.roll(rows[i], -sx_ref[i, 0], 1)
        return 0

    jax.lax.fori_loop(0, NSEM, drain, 0)

    w = rolled[...].astype(jnp.float32)  # [TILE, 10, wpp] (cols 0..9 valid)
    fy = fy_ref[...]  # [TILE, 1]
    fx = fx_ref[...]
    vy = (
        w[:, : WIN - 1, :] * (1.0 - fy)[:, :, None]
        + w[:, 1:, :] * fy[:, :, None]
    )  # [TILE, 9, wpp]
    std = (
        vy[:, :, : WIN - 1] * (1.0 - fx)[:, :, None]
        + vy[:, :, 1:WIN] * fx[:, :, None]
    )  # [TILE, 9, 9] (dy, dx)
    out_ref[...] = std


def _kernel4_block(sp_ref, f_ref, cmap_ref, out_ref, rolled, *, offs, tpx):
    """Block-pipelined all-levels variant.

    The per-pixel-DMA formulation (round 1) was DMA-ISSUE bound: 4 copy
    descriptors per pixel at ~170ns each dominated RAFT. Here the four
    level maps arrive CONCATENATED along rows as one auto-pipelined input
    block per pixel tile — zero manual DMAs — and the kernel only does
    per-pixel sublane slices (free), lane rotates, and the vectorized
    bilinear combine. Trades ~4x more HBM bytes (full maps instead of
    10-row windows) for ~1000x fewer copy descriptors; measured win on
    the 640x360 ProPainter config is ~4x end-to-end on RAFT.

    sp_ref:   SMEM [tpx, 4] int32 packed (sy << 16 | sx), sy level-local
    f_ref:    VMEM [tpx, 8] f32 (fy per level | fx per level)
    cmap_ref: VMEM [tpx, HT, wp] pixel tile of the row-concatenated maps
    out_ref:  VMEM [tpx, 4, 9, 9] f32
    rolled:   VMEM scratch [tpx, 4, WIN, wp]
    """

    def body(k, _):
        for lvl in range(4):
            sp = sp_ref[k, lvl]
            sy = sp >> 16
            sx = sp & 0xFFFF
            rows = cmap_ref[k, pl.ds(offs[lvl] + sy, WIN), :]
            rolled[k, lvl] = pltpu.roll(rows, -sx, 1)
        return 0

    jax.lax.fori_loop(0, tpx, body, 0)

    for lvl in range(4):
        w = rolled[:, lvl].astype(jnp.float32)  # [tpx, 10, wp]
        fy = f_ref[:, lvl : lvl + 1]  # [tpx, 1]
        fx = f_ref[:, 4 + lvl : 5 + lvl]
        vy = (
            w[:, : WIN - 1, :] * (1.0 - fy)[:, :, None]
            + w[:, 1:, :] * fy[:, :, None]
        )
        std = (
            vy[:, :, : WIN - 1] * (1.0 - fx)[:, :, None]
            + vy[:, :, 1:WIN] * fx[:, :, None]
        )  # [tpx, 9, 9]
        out_ref[:, lvl] = std


def corr_window_lookup4_pallas(pyramid, sy, sx, fy, fx) -> jnp.ndarray:
    """Fused 4-level window lookup.

    pyramid: list of 4 zero-padded maps [M, Hp_l, Wp_l]
    sy/sx:   [4, M] int32 window starts per level (in-bounds, level-local)
    fy/fx:   [4, M] float32 fractional offsets
    Returns [M, 4, 9, 9] float32 tap grids in natural (dy, dx) order.
    """
    m = pyramid[0].shape[0]
    # one lane-padded width serves all levels; rows concatenate
    wp = max(-(-p.shape[2] // 128) * 128 for p in pyramid)
    heights = [p.shape[1] for p in pyramid]
    offs = tuple(int(x) for x in np.cumsum([0] + heights[:-1]))
    ht = sum(heights)

    # pixel tile sized so the pipelined block stays ~<=2.5 MB
    bytes_per_px = ht * wp * pyramid[0].dtype.itemsize
    tpx = max(8, min(TILE4, int(2.5e6 // bytes_per_px) or 8))
    tpx = 1 << (tpx.bit_length() - 1)  # floor to a power of two

    cmap = jnp.concatenate(
        [jnp.pad(p, ((0, 0), (0, 0), (0, wp - p.shape[2]))) for p in pyramid],
        axis=1,
    )  # [M, HT, wp] — loop-invariant, hoisted out of the RAFT scan

    m_pad = -(-m // tpx) * tpx
    if m_pad != m:
        cmap = jnp.pad(cmap, ((0, m_pad - m), (0, 0), (0, 0)))
        sy = jnp.pad(sy, ((0, 0), (0, m_pad - m)))
        sx = jnp.pad(sx, ((0, 0), (0, m_pad - m)))
        fy = jnp.pad(fy, ((0, 0), (0, m_pad - m)))
        fx = jnp.pad(fx, ((0, 0), (0, m_pad - m)))
    packed = ((sy.astype(jnp.int32) << 16) | sx.astype(jnp.int32)).T  # [M, 4]
    fr = jnp.concatenate(
        [fy.astype(jnp.float32).T, fx.astype(jnp.float32).T], axis=1
    )  # [M, 8]

    out = pl.pallas_call(
        functools.partial(_kernel4_block, offs=offs, tpx=tpx),
        grid=(m_pad // tpx,),
        in_specs=[
            pl.BlockSpec((tpx, 4), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tpx, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tpx, ht, wp), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (tpx, 4, WIN - 1, WIN - 1), lambda i: (i, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, 4, WIN - 1, WIN - 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tpx, 4, WIN, wp), cmap.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=12 * m_pad * 4 * WIN * WIN,
            bytes_accessed=m_pad * ht * wp * cmap.dtype.itemsize,
            transcendentals=0,
        ),
    )(packed, fr, cmap)
    return out[:m]


@jax.jit
def corr_window_lookup_pallas(
    corr_pad: jnp.ndarray,  # [M, Hp, Wp] zero-padded maps
    sy: jnp.ndarray,  # [M] int32 window row starts (in-bounds)
    sx: jnp.ndarray,  # [M] int32 window col starts (in-bounds)
    fy: jnp.ndarray,  # [M] float32 fractional offsets
    fx: jnp.ndarray,
) -> jnp.ndarray:
    """Returns [M, 9, 9] float32 tap grids in natural (dy, dx) order."""
    m, hp, wp = corr_pad.shape
    # lane-pad maps to a 128 multiple: Mosaic DMA/vector shapes need an
    # aligned minor dim; the pad is loop-invariant so XLA hoists it out
    # of the RAFT iteration scan
    wp_al = -(-wp // 128) * 128
    if wp_al != wp:
        corr_pad = jnp.pad(corr_pad, ((0, 0), (0, 0), (0, wp_al - wp)))
        wp = wp_al
    m_pad = -(-m // TILE) * TILE
    if m_pad != m:
        sy = jnp.pad(sy, (0, m_pad - m))
        sx = jnp.pad(sx, (0, m_pad - m))
        fy = jnp.pad(fy, (0, m_pad - m))
        fx = jnp.pad(fx, (0, m_pad - m))
    sy2 = sy.reshape(m_pad, 1)
    sx2 = sx.reshape(m_pad, 1)
    fy2 = fy.reshape(m_pad, 1).astype(jnp.float32)
    fx2 = fx.reshape(m_pad, 1).astype(jnp.float32)

    grid = (m_pad // TILE,)
    out = pl.pallas_call(
        functools.partial(_kernel, m=m, wpp=wp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # corr stays in HBM
        ],
        out_specs=pl.BlockSpec((TILE, WIN - 1, WIN - 1), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, WIN - 1, WIN - 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TILE, WIN, wp), corr_pad.dtype),
            pltpu.VMEM((TILE, WIN, wp), corr_pad.dtype),
            pltpu.SemaphoreType.DMA((NSEM,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(sy2, sx2, fy2, fx2, corr_pad)
    return out[:m]
