"""Pallas TPU kernel: window attention with FUSED partitioning (halo form).

NOTES_ROUND4 §8's conclusion: at bench shapes the attention layer is
bound by data movement that lives OUTSIDE the round-4 kernel — the
window partitioning of q/k/v, the four rolled K/V copies, and the
output un-partition. This kernel consumes the raw TOKEN GRID
[B, T, Hp, Wp, C] directly (the named-but-unbuilt round-4 lever):

  * window q/k/v arrive as (1, T, wh, ww, C) BlockSpec blocks — no
    partition pass, and the output block writes the token grid back,
    so the un-partition pass disappears too;
  * the rolled-K/V expansion (reference sparse_transformer.py:184-197:
    4 diagonal rolls, keep the 148 out-of-window survivors) is
    replaced by ONE conditional DMA of the window's (wh+2eh, ww+2ew)
    HALO region from a circularly padded K/V grid, plus a STATIC
    0/-1e9 bias over the halo positions. The survivor multiset maps
    1:1 onto halo positions (148 of 209; no duplicates — verified
    numerically), so masked attention over the halo region is EXACTLY
    attention over the reference's rolled key set. Clean windows skip
    the DMA entirely (it is issued under @pl.when) — halo traffic
    scales with the number of OCCUPIED windows;
  * pooled global tokens ride per-batch-row blocks as before.

Semantics identical to ops.attention.sparse_window_attention's XLA
both-branch+select formulation (reference sparse_transformer.py:
201-393).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


@functools.lru_cache(maxsize=8)
def halo_bias_static(window_size: tuple[int, int]) -> np.ndarray:
    """[hh*hw] f32: 0 where a halo position is a rolled survivor,
    -1e9 elsewhere (including the never-reached src-row/col bands and
    the window interior). Built from the same corner masks as
    ops.attention._valid_rolled_indices."""
    wh, ww = window_size
    eh, ew = (wh + 1) // 2, (ww + 1) // 2
    count = np.zeros((wh + 2 * eh, ww + 2 * ew), np.int64)
    corners = (
        ("tl", (-eh, -ew)), ("tr", (-eh, ew)),
        ("bl", (eh, -ew)), ("br", (eh, ew)),
    )
    for corner, (sy, sx) in corners:
        m = np.ones((wh, ww), np.bool_)
        hs = slice(None, -eh) if corner in ("tl", "tr") else slice(eh, None)
        ws = slice(None, -ew) if corner in ("tl", "bl") else slice(ew, None)
        m[hs, ws] = False
        rr, cc = np.nonzero(m)
        np.add.at(count, (rr - sy + eh, cc - sx + ew), 1)
    # duplicates would need +ln(count); the (5,9)/(3,5) geometry has none
    with np.errstate(divide="ignore"):
        bias = np.where(count > 0, np.log(count.astype(np.float64)), NEG)
    return bias.reshape(-1).astype(np.float32)


def _kernel(
    occ_ref,    # [B, nwh, nww] int32 (scalar prefetch)
    q_ref,      # [1, T, 1, wh, 1, ww, C] (7-D window view: the last two
    k_ref,      #   block dims equal the full array dims, satisfying the
    v_ref,      #   Mosaic tiling rule a 5-D (.., wh, ww, C) block cannot)
    bw_ref,     # [1, 1, QT] f32
    bh_ref,     # [1, T_sel, hh*hw] f32 (static survivor mask + validity)
    bp_ref,     # [1, 1, PLpad] f32
    khalo_ref,  # [B, T_sel, Hp+2eh, Wp+2ew, C] (HBM, manual DMA)
    vhalo_ref,
    pk_ref,     # [B, n_head, PLpad, ch] (HBM, chunked manual DMA)
    pv_ref,
    out_ref,    # [1, T, 1, wh, 1, ww, C]
    hk_scr,     # [T_sel, hh, hw, C] VMEM
    hv_scr,
    pk_scr,     # [n_head, pt_tile, ch] VMEM
    pv_scr,
    sems,       # DMA((2,))
    *,
    t, t_sel, wh, ww, eh, ew, n_head, ch, k_tile, pt_tile,
):
    b_i = pl.program_id(0)
    wy = pl.program_id(1)
    wx = pl.program_id(2)
    occupied = occ_ref[b_i, wy, wx] > 0
    wsz = wh * ww
    qt = t * wsz
    hh, hw = wh + 2 * eh, ww + 2 * ew
    c = n_head * ch
    scale = 1.0 / math.sqrt(ch)

    q_all = q_ref[0].reshape(qt, c)
    k_all = k_ref[0].reshape(qt, c)
    v_all = v_ref[0].reshape(qt, c)

    @pl.when(occupied)
    def _():
        cp_k = pltpu.make_async_copy(
            khalo_ref.at[b_i, :, pl.ds(wy * wh, hh), pl.ds(wx * ww, hw), :],
            hk_scr, sems.at[0],
        )
        cp_v = pltpu.make_async_copy(
            vhalo_ref.at[b_i, :, pl.ds(wy * wh, hh), pl.ds(wx * ww, hw), :],
            hv_scr, sems.at[1],
        )
        cp_k.start()
        cp_v.start()
        cp_k.wait()
        cp_v.wait()

        hk = hk_scr[...].reshape(t_sel * hh * hw, c)
        hv = hv_scr[...].reshape(t_sel * hh * hw, c)
        bias_h = bh_ref[0].reshape(1, t_sel * hh * hw)
        bias_w = bw_ref[0, 0][None, :]  # [1, QT]

        def flash(h, state, ks, vs, bias, seg_len):
            m, l, acc = state
            sl = slice(h * ch, (h + 1) * ch)
            q = q_all[:, sl]
            for s0 in range(0, seg_len, k_tile):
                slen = min(k_tile, seg_len - s0)
                kk = ks[s0 : s0 + slen, :]
                vv = vs[s0 : s0 + slen, :]
                s = (
                    jax.lax.dot_general(
                        q, kk, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * scale
                    + bias[:, s0 : s0 + slen]
                )
                m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
                alpha = jnp.exp(m - m_new)
                p = jnp.exp(s - m_new)
                l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
                acc = acc * alpha + jax.lax.dot_general(
                    p.astype(vv.dtype), vv, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                m = m_new
            return m, l, acc

        # VMEM-resident segments first (window keys + halo) per head
        states = []
        for h in range(n_head):
            st = (
                jnp.full((qt, 1), NEG, jnp.float32),
                jnp.zeros((qt, 1), jnp.float32),
                jnp.zeros((qt, ch), jnp.float32),
            )
            sl = slice(h * ch, (h + 1) * ch)
            st = flash(h, st, k_all[:, sl], v_all[:, sl], bias_w, qt)
            st = flash(h, st, hk[:, sl], hv[:, sl], bias_h, t_sel * hh * hw)
            states.append(st)

        # pooled segment: DMA'd in bounded chunks (its size grows with
        # the pooled grid — resolution-dependent — so it cannot be a
        # resident block at 720p+); chunk loop OUTSIDE the head loop so
        # each chunk is fetched once
        pl_pad = pk_ref.shape[2]
        n_pt = pl_pad // pt_tile
        for i in range(n_pt):
            cpk = pltpu.make_async_copy(
                pk_ref.at[b_i, :, pl.ds(i * pt_tile, pt_tile), :],
                pk_scr, sems.at[0],
            )
            cpv = pltpu.make_async_copy(
                pv_ref.at[b_i, :, pl.ds(i * pt_tile, pt_tile), :],
                pv_scr, sems.at[1],
            )
            cpk.start()
            cpv.start()
            cpk.wait()
            cpv.wait()
            bias_pc = bp_ref[0, 0][None, i * pt_tile : (i + 1) * pt_tile]
            for h in range(n_head):
                states[h] = flash(
                    h, states[h], pk_scr[h], pv_scr[h], bias_pc, pt_tile
                )

        out = jnp.concatenate(
            [acc / l for (m, l, acc) in states], axis=1
        ).astype(out_ref.dtype)
        out_ref[0] = out.reshape(t, 1, wh, 1, ww, c)

    @pl.when(jnp.logical_not(occupied))
    def _():
        # per-frame within-window attention as ONE block-diagonal-masked
        # [QT, QT] dot per head (the batched-small-matmul trap otherwise;
        # see window_attention.py clean branch)
        fid = jax.lax.broadcasted_iota(jnp.int32, (qt, 1), 0) // wsz
        bias_bd = (fid != fid.reshape(1, qt)).astype(jnp.float32) * NEG
        outs = []
        for h in range(n_head):
            sl = slice(h * ch, (h + 1) * ch)
            q = q_all[:, sl]
            kk = k_all[:, sl]
            vv = v_all[:, sl]
            s = (
                jax.lax.dot_general(
                    q, kk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
                + bias_bd
            )
            s = s - jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=1, keepdims=True)
            outs.append(
                jax.lax.dot_general(
                    p.astype(vv.dtype), vv, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        out = jnp.concatenate(outs, axis=1).astype(out_ref.dtype)
        out_ref[0] = out.reshape(t, 1, wh, 1, ww, c)


@functools.partial(
    jax.jit, static_argnames=("window_size", "n_head", "k_tile")
)
def window_attention_halo(
    q,        # [B, T, Hp, Wp, C] window-padded token grids
    k,
    v,
    khalo,    # [B, T_sel, Hp+2eh, Wp+2ew, C] circularly padded, t_ind-sel
    vhalo,
    pool_k,   # [B, n_head, PL, ch]
    pool_v,
    occ,      # [B, nwh, nww] int32
    bias_w,   # [B, T*wsz] f32
    bias_hv,  # [B, T_sel] f32
    bias_p,   # [B, PL] f32
    *,
    window_size: tuple[int, int],
    n_head: int,
    k_tile: int = 512,
):
    """Returns [B, T, Hp, Wp, C] in q's dtype."""
    b, t, hp, wp, c = q.shape
    wh, ww = window_size
    eh, ew = (wh + 1) // 2, (ww + 1) // 2
    nwh, nww = hp // wh, wp // ww
    t_sel = khalo.shape[1]
    ch = c // n_head
    hh, hw = wh + 2 * eh, ww + 2 * ew
    hbias = halo_bias_static(window_size)

    # pooled segment rides bounded DMA chunks (its length grows with
    # resolution); pad it to a chunk multiple with -1e9-bias keys
    pl_len = pool_k.shape[2]
    pt_tile = min(1024, -(-pl_len // 128) * 128)
    pl_pad = -(-pl_len // pt_tile) * pt_tile
    bias_p = bias_p.astype(jnp.float32)
    if pl_pad != pl_len:
        padp = ((0, 0), (0, 0), (0, pl_pad - pl_len), (0, 0))
        pool_k = jnp.pad(pool_k, padp)
        pool_v = jnp.pad(pool_v, padp)
        bias_p = jnp.pad(
            bias_p, ((0, 0), (0, pl_pad - pl_len)), constant_values=NEG
        )

    kern = functools.partial(
        _kernel, t=t, t_sel=t_sel, wh=wh, ww=ww, eh=eh, ew=ew,
        n_head=n_head, ch=ch, k_tile=k_tile, pt_tile=pt_tile,
    )
    # q/k/v ride a FREE 7-D window view [B, T, nwh, wh, nww, ww, C]
    # (contiguous-axis split, no data movement): its (1,t,1,wh,1,ww,c)
    # blocks have last-two dims equal to the full array dims, which the
    # 5-D (.., wh, ww, c) block shape cannot satisfy under Mosaic's
    # divisible-by-(8,128)-or-full tiling rule.
    win_spec = pl.BlockSpec(
        (1, t, 1, wh, 1, ww, c),
        lambda bi, wy, wx, occ_: (bi, 0, wy, 0, wx, 0, 0),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nwh, nww),
        in_specs=[
            win_spec,
            win_spec,
            win_spec,
            pl.BlockSpec(
                (1, 1, t * wh * ww), lambda bi, wy, wx, occ_: (bi, 0, 0)
            ),
            pl.BlockSpec(
                (1, t_sel, hh * hw), lambda bi, wy, wx, occ_: (bi, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, pl_pad), lambda bi, wy, wx, occ_: (bi, 0, 0)
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # khalo stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),  # pooled K/V chunked DMA
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, t, 1, wh, 1, ww, c),
            lambda bi, wy, wx, occ_: (bi, 0, wy, 0, wx, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((t_sel, hh, hw, c), q.dtype),
            pltpu.VMEM((t_sel, hh, hw, c), q.dtype),
            pltpu.VMEM((n_head, pt_tile, ch), pool_k.dtype),
            pltpu.VMEM((n_head, pt_tile, ch), pool_k.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    qt = t * wh * ww
    kk_tot = qt + t_sel * hh * hw + pl_pad
    win7 = (b, t, nwh, wh, nww, ww, c)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(win7, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nwh * nww * n_head * qt * kk_tot * ch,
            bytes_accessed=b * nwh * nww * n_head * qt * ch * 8,
            transcendentals=b * nwh * nww * n_head * qt * kk_tot,
        ),
    )(
        occ.astype(jnp.int32),
        q.reshape(win7), k.reshape(win7), v.reshape(win7),
        bias_w.astype(jnp.float32)[:, None],
        (
            jnp.asarray(hbias)[None, None, :]
            + bias_hv.astype(jnp.float32)[:, :, None]
        ),
        bias_p[:, None],
        khalo, vhalo, pool_k, pool_v,
    )
    return out.reshape(q.shape)
