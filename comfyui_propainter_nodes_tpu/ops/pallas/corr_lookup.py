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


def _kernel4(
    sp_ref,
    fy0, fy1, fy2, fy3, fx0, fx1, fx2, fx3,
    m0, m1, m2, m3, out_ref, rows, sems, *, ms, pix0
):
    """All-4-levels variant: per pixel, one DMA per level through the same
    semaphore ring; the bilinear combine runs vectorized over (TILE4, 4).

    Window starts arrive PACKED (sy << 16 | sx) — SMEM inputs are fully
    resident (not windowed), and four levels of separate sy/sx arrays
    exceed the 1 MB SMEM budget."""
    base = pl.program_id(0) * TILE4
    maps = (m0, m1, m2, m3)

    def get_dma(i, lvl):
        pix = jnp.minimum(pix0 + base + i, ms[lvl] - 1)
        sy = sp_ref[lvl, i] >> 16
        return pltpu.make_async_copy(
            maps[lvl].at[pix, pl.ds(sy, WIN), :],
            rows.at[i, lvl],
            sems.at[(4 * i + lvl) % NSEM],
        )

    # NSEM is a multiple of 4, so the ring partner of (i, lvl) is
    # (i - NSEM//4, lvl) — the level stays STATIC (maps[] needs a python
    # index), only the pixel index is traced.
    lag = NSEM // 4

    def finish(j, lvl):
        get_dma(j, lvl).wait()
        # lane-align in place (the DMA into this slot has completed)
        sx = sp_ref[lvl, j] & 0xFFFF
        rows[j, lvl] = pltpu.roll(rows[j, lvl], -sx, 1)

    def issue(i, _):
        for lvl in range(4):

            @pl.when(i >= lag)
            def _():
                finish(i - lag, lvl)

            get_dma(i, lvl).start()
        return 0

    jax.lax.fori_loop(0, TILE4, issue, 0)

    for kk in range(lag):  # static drain
        for lvl in range(4):
            finish(TILE4 - lag + kk, lvl)

    fys = (fy0, fy1, fy2, fy3)
    fxs = (fx0, fx1, fx2, fx3)
    for lvl in range(4):
        w = rows[:, lvl].astype(jnp.float32)  # [TILE4, 10, wpp]
        fy = fys[lvl][...]  # [TILE4, 1]
        fx = fxs[lvl][...]
        vy = (
            w[:, : WIN - 1, :] * (1.0 - fy)[:, :, None]
            + w[:, 1:, :] * fy[:, :, None]
        )
        std = (
            vy[:, :, : WIN - 1] * (1.0 - fx)[:, :, None]
            + vy[:, :, 1:WIN] * fx[:, :, None]
        )  # [TILE4, 9, 9]
        out_ref[:, lvl] = std


def corr_window_lookup4_pallas(pyramid, sy, sx, fy, fx) -> jnp.ndarray:
    """Fused 4-level window lookup.

    pyramid: list of 4 zero-padded maps [M, Hp_l, Wp_l]
    sy/sx:   [4, M] int32 window starts per level (in-bounds)
    fy/fx:   [4, M] float32 fractional offsets
    Returns [M, 4, 9, 9] float32 tap grids in natural (dy, dx) order.
    """
    m = pyramid[0].shape[0]
    # common lane-padded width so one scratch serves all levels
    wp = max(-(-p.shape[2] // 128) * 128 for p in pyramid)
    maps = [
        jnp.pad(p, ((0, 0), (0, 0), (0, wp - p.shape[2]))) for p in pyramid
    ]
    m_pad = -(-m // TILE4) * TILE4
    if m_pad != m:
        sy = jnp.pad(sy, ((0, 0), (0, m_pad - m)))
        sx = jnp.pad(sx, ((0, 0), (0, m_pad - m)))
        fy = jnp.pad(fy, ((0, 0), (0, m_pad - m)))
        fx = jnp.pad(fx, ((0, 0), (0, m_pad - m)))
    packed = (sy.astype(jnp.int32) << 16) | sx.astype(jnp.int32)

    # SMEM inputs are fully resident (~1 MB budget): split the pixel range
    # into parts so each call's scalar arrays fit; the big maps are shared
    # across parts via a static pixel offset.
    n_parts = 1 if m_pad <= 24576 else -(-m_pad // (TILE4 * 96))
    part = -(-(m_pad // TILE4) // n_parts) * TILE4
    outs = []
    for pi in range(0, m_pad, part):
        pe = min(m_pad, pi + part)
        sp2 = packed[:, pi:pe]
        fy_l = [fy[i, pi:pe].astype(jnp.float32).reshape(-1, 1) for i in range(4)]
        fx_l = [fx[i, pi:pe].astype(jnp.float32).reshape(-1, 1) for i in range(4)]
        out = pl.pallas_call(
            functools.partial(
                _kernel4, ms=tuple(p.shape[0] for p in maps), pix0=pi
            ),
            grid=((pe - pi) // TILE4,),
            in_specs=[
                pl.BlockSpec((4, TILE4), lambda i: (0, i), memory_space=pltpu.SMEM),
            ]
            + [
                pl.BlockSpec((TILE4, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
                for _ in range(8)
            ]
            + [pl.BlockSpec(memory_space=pltpu.ANY) for _ in range(4)],
            out_specs=pl.BlockSpec(
                (TILE4, 4, WIN - 1, WIN - 1), lambda i: (i, 0, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct(
                (pe - pi, 4, WIN - 1, WIN - 1), jnp.float32
            ),
            scratch_shapes=[
                pltpu.VMEM((TILE4, 4, WIN, wp), maps[0].dtype),
                pltpu.SemaphoreType.DMA((NSEM,)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(sp2, *fy_l, *fx_l, *maps)
        outs.append(out)
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
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
            pl.BlockSpec(memory_space=pltpu.ANY),  # corr stays in HBM
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
