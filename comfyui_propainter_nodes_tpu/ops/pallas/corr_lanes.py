"""Pallas TPU kernel: RAFT correlation window lookup, pixels-on-LANES.

Replaces the XLA one-hot-contraction lookup (models/raft.py::
_window_lookup_einsum) on the RAFT hot loop. That form re-reads the
full [M, Hl, Wl] level volume every iteration and materializes
[M, 9, Wl] / [M, 9, Hl] weight intermediates in HBM; round 4's first
tiled kernel attempt kept per-pixel maps in VMEM ([TILE, H, W] layout)
and lost 6x to per-tap [128, 80] VPU shapes (NOTES_ROUND4.md §5.1).
This kernel fixes both axes of that failure:

  * the volume is stored PIXEL-MINOR, [img, Hl, Wl, hw] — for the
    bidirectional pyramid this is free: the forward pixel-minor volume
    is just `corr_b` reshaped and the backward one is `corr` reshaped
    (models/raft.py::build_corr_pyramid_bi_lanes), no extra transpose;
  * a block of PL=512 pixels rides the LANE axis, so every tent
    multiply-accumulate is a full-width [rows, Wl, 512] VPU op;
  * bilinear window weights are separable TENTS (the same trick as the
    deform-conv kernel): tap i's row weight is max(0, 1-|y-(cy+i)|),
    exactly (1-fy, fy) on rows (sy+i, sy+i+1) and exact 0 elsewhere —
    so out-of-range taps contribute exact zeros (the unpadded-pyramid
    semantics of the einsum path, corr.py:61-80 bilinear_sampler);
  * the kernel walks ONLY the y-blocks a tile actually samples: RAFT
    window rows span ~(10 + local flow spread), not Hl — per-tile
    [first, last] sampled-row blocks are computed outside (in XLA) and
    scalar-prefetched; skipped blocks pin their index so revisit
    caching elides the DMA. HBM read traffic per iteration drops to
    ~(10+spread)/Hl of the volume (~3.5x at level 0, 640x360).

Row pass (per executed y-block): acc[i] += sum_y vol[y] * tent_y(i),
9 taps. Column pass (once, on the last block): out[dx*9+dy] =
sum_x acc[dy] * tent_x(dx) — the (dy, dx) -> (dx, dy) channel quirk of
the reference (corr.py:37-43 stacks meshgrid onto (x, y)) is baked into
the output row index. f32 accumulation throughout (the einsum path sums
in the volume dtype, bf16 under fp16=enable; this kernel is strictly
more accurate).

Reference semantics: model/modules/RAFT/corr.py:29-50 (__call__ window
lookup), utils/utils.py:66-80 (bilinear_sampler, align_corners=True,
zeros padding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 9  # (2r+1) with r=4
PL_PIX = 512  # pixels per grid step, on the lane axis


def _kernel(
    b0_ref, nb_ref, cy_ref, cx_ref, vol_ref, out_ref, acc_ref, *, yw, wl, n_wmax
):
    im = pl.program_id(0)
    t = pl.program_id(1)
    w = pl.program_id(2)
    nb = nb_ref[im, t]

    @pl.when(w == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(w < nb)
    def _():
        y0 = (b0_ref[im, t] + w) * yw
        rows = (
            jax.lax.broadcasted_iota(jnp.int32, (yw, PL_PIX), 0) + y0
        ).astype(jnp.float32)
        cy = cy_ref[0, 0]  # [1, PL]
        v = vol_ref[0].astype(jnp.float32)  # [yw, wl, PL]
        for i in range(WIN):
            ty = jnp.maximum(1.0 - jnp.abs(rows - (cy + i)), 0.0)  # [yw, PL]
            acc_ref[i] = acc_ref[i] + jnp.sum(v * ty[:, None, :], axis=0)

    @pl.when(w == n_wmax - 1)
    def _():
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (wl, PL_PIX), 0
        ).astype(jnp.float32)
        cx = cx_ref[0, 0]
        for j in range(WIN):
            tx = jnp.maximum(1.0 - jnp.abs(cols - (cx + j)), 0.0)  # [wl, PL]
            for i in range(WIN):
                # output channel dx*9+dy: the reference's (dx, dy) quirk
                out_ref[0, j * WIN + i] = jnp.sum(acc_ref[i] * tx, axis=0)


@functools.partial(jax.jit, static_argnames=("yw",))
def _level_lookup(vol, cy0, cx0, b0, nb, *, yw):
    """vol: [IM, Hpad, Wl, PLpad] (pixel-minor, rows padded to yw mult);
    cy0/cx0: [IM, n_tiles, 1, PL] tap-0 window centers (c - r), padding
    pixels carry a +1e9 sentinel (zero tent weight); b0/nb: [IM, n_tiles]
    int32 first sampled y-block / block count. Returns [IM, 81, PLpad]
    f32."""
    im, h_pad, wl, pl_pad = vol.shape
    n_tiles = pl_pad // PL_PIX
    n_wmax = h_pad // yw

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(im, n_tiles, n_wmax),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, PL_PIX),
                lambda i, t, w, b0_, nb_: (i, t, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, 1, PL_PIX),
                lambda i, t, w, b0_, nb_: (i, t, 0, 0),
            ),
            pl.BlockSpec(
                (1, yw, wl, PL_PIX),
                # skipped blocks (w >= nb) pin to the last executed
                # block so their DMA is elided via revisit caching
                lambda i, t, w, b0_, nb_: (
                    i,
                    b0_[i, t] + jnp.minimum(w, nb_[i, t] - 1),
                    0,
                    t,
                ),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, WIN * WIN, PL_PIX), lambda i, t, w, b0_, nb_: (i, 0, t)
        ),
        scratch_shapes=[pltpu.VMEM((WIN, wl, PL_PIX), jnp.float32)],
    )
    kern = functools.partial(_kernel, yw=yw, wl=wl, n_wmax=n_wmax)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((im, WIN * WIN, pl_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=im * pl_pad * (2 * WIN * 2 * yw * wl + 2 * WIN * WIN * wl),
            bytes_accessed=im * pl_pad * 2 * yw * wl * 2
            + im * pl_pad * WIN * WIN * 4,
            transcendentals=0,
        ),
        # the [WIN, wl, PL_PIX] f32 scratch scales with the level width:
        # wl=160 (720p level 0) measured 17.77M of scoped vmem vs the
        # 16M default. v5e has 128MB VMEM — give headroom (same fix as
        # the deform kernel).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(b0, nb, cy0, cx0, vol)


def corr_lookup_lanes(pyramid, coords, radius: int = 4):
    """Full 4-level window lookup on a pixel-minor pyramid.

    pyramid: list of [IM, Hl(padded to yw), Wl, hw_pad] maps from
    build_corr_pyramid_bi_lanes; coords: [IM, H8, W8, 2] (x, y) pixel
    coords at 1/8 resolution. Returns [IM, H8, W8, LEVELS*81] f32 with
    the reference's (level, dx, dy) channel order.
    """
    im, h8, w8, _ = coords.shape
    hw = h8 * w8
    hw_pad = pyramid[0].shape[3]
    n_tiles = hw_pad // PL_PIX
    flat = coords.reshape(im, hw, 2)
    if hw_pad != hw:
        flat = jnp.pad(
            flat, ((0, 0), (0, hw_pad - hw), (0, 0)), constant_values=1e9
        )

    outs = []
    for lvl, vol in enumerate(pyramid):
        h_pad, wl = vol.shape[1], vol.shape[2]
        yw = _yw_for(h_pad)
        c = flat.astype(jnp.float32) / (2**lvl)
        cx0 = c[..., 0] - radius  # tap-0 window centers
        cy0 = c[..., 1] - radius
        tiles_y = cy0.reshape(im, n_tiles, PL_PIX)
        # conservative sampled-row range: tent of tap i covers
        # (cy0+i-1, cy0+i+1), i in [0, 8] -> rows in (cy0-1, cy0+9);
        # sentinel-padded pixels (1e9) are excluded by the min side and
        # clamp out on the max side
        real = tiles_y < 1e8
        lo = jnp.ceil(jnp.min(jnp.where(real, tiles_y, 1e9), axis=-1) - 1.0)
        hi = jnp.floor(jnp.max(jnp.where(real, tiles_y, -1e9), axis=-1) + 9.0)
        lo = jnp.clip(lo, 0, h_pad - 1).astype(jnp.int32)
        hi = jnp.clip(hi, 0, h_pad - 1).astype(jnp.int32)
        b0 = lo // yw
        nb = jnp.maximum(hi // yw - b0 + 1, 1).astype(jnp.int32)
        out = _level_lookup(
            vol,
            cy0.reshape(im, n_tiles, 1, PL_PIX),
            cx0.reshape(im, n_tiles, 1, PL_PIX),
            b0,
            nb,
            yw=yw,
        )  # [IM, 81, hw_pad]
        outs.append(out)

    stacked = jnp.concatenate(outs, axis=1)  # [IM, LEVELS*81, hw_pad]
    stacked = stacked[:, :, :hw].transpose(0, 2, 1)
    return stacked.reshape(im, h8, w8, len(pyramid) * WIN * WIN)


def _yw_for(h_pad: int) -> int:
    """y-block rows: small enough to bound wasted rows (the window spans
    ~10-12 rows), large enough to amortize DMA issue; h_pad is padded to
    a multiple by the pyramid builder."""
    for yw in (16, 8, 4, 2, 1):
        if h_pad % yw == 0:
            return yw
    return 1


def _pad_rows_to(m, mult):
    h = m.shape[1]
    h_pad = -(-h // mult) * mult
    if h_pad != h:
        m = jnp.pad(m, ((0, 0), (0, h_pad - h), (0, 0), (0, 0)))
    return m


def build_corr_pyramid_bi_lanes(fmap1, fmap2):
    """Both directions' 4-level pyramids in PIXEL-MINOR layout.

    fmap: [N, H8, W8, C]. Returns list of [2N, Hl_pad, Wl, hw_pad] maps,
    image-batch ordered [fwd pairs ++ bwd pairs] to match
    raft_bi_forward's context/coords batching. The forward pixel-minor
    volume is corr^T — i.e. exactly the backward pixel-MAJOR volume —
    so both layouts fall out of the one all-pairs einsum with two
    reshapes and a concat (same cost as the pixel-major builder's
    batch concat; corr.py:13-27).
    """
    pyr_f, pyr_b = build_corr_pyramids_lanes(fmap1, fmap2)
    return [
        jnp.concatenate([a, b], axis=0) for a, b in zip(pyr_f, pyr_b)
    ]


def build_corr_pyramid_dir_lanes(fq, fp):
    """ONE direction's pixel-minor pyramid: vol[img, qy, qx, p] =
    <fq at map coord q, fp at flat pixel p> / sqrt(C).

    The naive bidirectional form (one einsum -> swapaxes -> concat ->
    pad minor -> pad rows) materializes ~4 full copies of the ~600MB
    level-0 volume; measured 149ms on-chip for 23 pairs where the
    matmul itself is <1ms of MXU. Here each direction is its own einsum
    against feature maps PRE-PADDED on each axis: zero feature vectors
    yield exact zero correlations, so the minor-axis pixel pad and the
    level-0 row pad fall out of the matmul itself instead of costing
    full-volume copy passes — and keeping directions separate halves
    the peak footprint (no [2N, ...] concat copy; the lookup outputs,
    ~1/100 the volume size, are concatenated instead)."""
    n, h8, w8, c = fq.shape
    hw = h8 * w8
    hw_pad = -(-hw // PL_PIX) * PL_PIX
    yw0 = _yw_for_h(h8)
    h0 = -(-h8 // yw0) * yw0  # level-0 row-padded height

    fp = fp.reshape(n, hw, c)
    if hw_pad != hw:  # pixel side: flat pixels zero-padded
        fp = jnp.pad(fp, ((0, 0), (0, hw_pad - hw), (0, 0)))
    if h0 != h8:  # map side: rows zero-padded
        fq = jnp.pad(fq, ((0, 0), (0, h0 - h8), (0, 0), (0, 0)))
    fq = fq.reshape(n, h0 * w8, c)

    inv_s = 1.0 / jnp.sqrt(jnp.asarray(c, jnp.float32))
    vol = (
        jnp.einsum("nqc,npc->nqp", fq, fp, preferred_element_type=jnp.float32)
        * inv_s
    ).astype(fp.dtype).reshape(n, h0, w8, hw_pad)

    pyramid = [vol]
    m = vol[:, :h8]  # pool from TRUE rows only (padding rows are zero)
    for lvl in range(1, 4):
        h2, w2 = m.shape[1] // 2, m.shape[2] // 2
        # 2x2/2 avg pool over the LEADING map dims: strided slices +
        # adds, full lane utilization (the pixel axis is untouched)
        mr = m[:, 0 : 2 * h2 : 2] + m[:, 1 : 2 * h2 : 2]
        m = (
            mr[:, :, 0 : 2 * w2 : 2] + mr[:, :, 1 : 2 * w2 : 2]
        ) * jnp.asarray(0.25, m.dtype)
        pyramid.append(_pad_rows_to(m, _yw_for_h(m.shape[1])))
    return pyramid


def build_corr_pyramids_lanes(fmap1, fmap2):
    """(forward, backward) pixel-minor pyramids as SEPARATE lists.
    fwd[img, qy, qx, p] = <fmap2_q, fmap1_p>; bwd swaps the roles."""
    return (
        build_corr_pyramid_dir_lanes(fmap2, fmap1),
        build_corr_pyramid_dir_lanes(fmap1, fmap2),
    )


def _yw_for_h(h: int) -> int:
    """Row padding target: pad level heights to a multiple of the
    y-block size the lookup will pick."""
    if h >= 16:
        return 16
    if h >= 8:
        return 8
    return max(h, 1)
