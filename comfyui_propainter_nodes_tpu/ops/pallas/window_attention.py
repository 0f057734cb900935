"""Pallas TPU kernel: occupancy-sparse window attention, fused K/V.

The XLA path (ops/attention.py) computes BOTH branches of the
reference's masked/unmasked window dichotomy for every window and
selects by occupancy — paying the expensive all-frames branch
(~100+ GFLOP per transformer layer at 640x360) even for windows the
sparsity map says are clean, which is most of them for typical object
masks. Worse, its key tensor materializes the POOLED global tokens
broadcast to every window: the pooled segment is most of the keys and
identical across windows — gigabytes of HBM traffic per layer.

This kernel keeps the key set SEGMENTED (reference
sparse_transformer.py:327-345 builds it as [window | rolled | pooled])
and streams it through a (window, segment-tile) grid:

  * grid dim 0 = windows; grid dim 1 = key-segment tiles: tile 0 is the
    window's own keys, then the rolled tiles, then the pooled tiles.
    The flash running stats (m, l, acc) live in VMEM scratch and carry
    across the segment tiles of a window; the output block flushes on
    the last tile. Per-step VMEM is therefore BOUNDED regardless of
    resolution (the pooled segment at 720p is 4050 keys — as one block
    it blows the 16MB scoped-VMEM budget that sank round-4's first
    720p run);
  * window q/k/v blocks are indexed by the window only — Pallas's
    same-index revisit caching fetches them once per window;
  * pooled tiles arrive UNbroadcast (indexed per batch row);
  * rolled tiles are read ONLY by the occupied branch; for clean
    windows the occupancy-dependent index map pins their block index,
    so their DMAs are skipped via revisit caching — rolled traffic
    scales with the number of OCCUPIED windows;
  * the cheap per-frame branch for clean windows runs on segment-tile 0
    as ONE block-diagonal-masked [QT, QT] dot (t tiny per-frame dots
    hit Mosaic's per-dot latency — the batched-small-matmul trap).

Semantics identical to the XLA both-branch+select formulation.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9
SEG_TILE = 256  # rolled/pooled keys per segment tile (VMEM-budgeted)


def _kernel_single(
    occ_ref,      # [nW] int32 (scalar prefetch)
    lo_ref,       # [nW] int32 (scalar prefetch): latest occupied id <= w
    q_ref,        # [1, n_head, QT, ch]    QT = T*wsz
    wk_ref,       # [1, n_head, QT, ch]    window keys, all T
    wv_ref,       # [1, n_head, QT, ch]
    rk_ref,       # [1, n_head, RL, ch]    rolled keys (t_ind-selected)
    rv_ref,       # [1, n_head, RL, ch]
    pk_ref,       # [1, n_head, PL, ch]    pooled keys (per batch)
    pv_ref,       # [1, n_head, PL, ch]
    bw_ref,       # [1, 1, QT] f32 additive bias for win keys in branch A
    br_ref,       # [1, 1, RL]
    bp_ref,       # [1, 1, PL]
    out_ref,      # [1, n_head, QT, ch] f32
    *,
    qt: int,
    rl: int,
    pl_len: int,
    ch: int,
    wsz: int,
    k_tile: int,
    n_head: int,
):
    # ALL heads of one window per grid step: the per-step fixed cost
    # (grid sequencing + DMA issue) dominated the old (head, window)
    # grid — 720 tiny steps at the 640x360 shapes; n_head-batching cuts
    # the step count 4x for the same FLOPs.
    iw = pl.program_id(0)
    occupied = occ_ref[iw] > 0
    scale = 1.0 / math.sqrt(ch)

    @pl.when(occupied)
    def _():
        # dot inputs stay in the model compute dtype (bf16 on TPU) with
        # f32 MXU accumulation — same contract as the XLA-fallback
        # einsums; the flash running stats stay f32. Heads run in ONE
        # fori_loop body (an unrolled head loop would give every head's
        # MXU intermediates their own VMEM stack slot and blow the 16MB
        # scoped-vmem limit, like the deform kernel's g-loop).
        def head_body(h, carry):
            q = q_ref[0, h]  # [QT, ch]
            m = jnp.full((qt, 1), NEG, jnp.float32)
            l = jnp.zeros((qt, 1), jnp.float32)
            acc = jnp.zeros((qt, ch), jnp.float32)

            def tile(kref, vref, bref, s0, sl, m, l, acc):
                ks = kref[0, h, s0 : s0 + sl, :]
                vs = vref[0, h, s0 : s0 + sl, :]
                bias = bref[0, 0, s0 : s0 + sl]
                s = (
                    jax.lax.dot_general(
                        q, ks, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * scale
                    + bias[None, :]
                )  # [QT, sl]
                m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
                alpha = jnp.exp(m - m_new)
                p = jnp.exp(s - m_new)
                l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
                acc = acc * alpha + jax.lax.dot_general(
                    p.astype(vs.dtype), vs, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return m_new, l, acc

            for kref, vref, bref, seg_len in (
                (wk_ref, wv_ref, bw_ref, qt),
                (rk_ref, rv_ref, br_ref, rl),
                (pk_ref, pv_ref, bp_ref, pl_len),
            ):
                for s0 in range(0, seg_len, k_tile):
                    sl = min(k_tile, seg_len - s0)
                    m, l, acc = tile(kref, vref, bref, s0, sl, m, l, acc)
            out_ref[0, h] = (acc / l).astype(out_ref.dtype)
            return carry

        jax.lax.fori_loop(0, n_head, head_body, 0)

    @pl.when(jnp.logical_not(occupied))
    def _():
        # per-frame within-window attention: queries of frame t attend
        # the wsz window keys of the SAME frame only — computed as ONE
        # [QT, QT] dot with a block-diagonal -inf mask. The batched
        # per-frame [wsz, wsz] form has 13x fewer FLOPs but decomposes
        # into t tiny Mosaic dots whose per-dot latency dominates (the
        # same batched-small-matmul trap as the corr lookup); the single
        # 585x585 dot is FLOP-heavier and several times faster.
        # INVARIANT: rk_ref/rv_ref MUST NOT be read in this branch — the
        # lo_[w] index map deliberately left them holding the last
        # OCCUPIED window's blocks (possibly another batch row) so their
        # DMA is skipped for clean windows.
        t = qt // wsz
        fid = jax.lax.broadcasted_iota(jnp.int32, (qt, 1), 0) // wsz
        blockdiag = (fid == fid.reshape(1, qt)).astype(jnp.float32)
        bias_bd = (1.0 - blockdiag) * NEG  # 0 on-diagonal, -1e9 off

        def head_body(h, carry):
            q = q_ref[0, h]   # [QT, ch]
            kk = wk_ref[0, h]
            vv = wv_ref[0, h]
            s = (
                jax.lax.dot_general(
                    q, kk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
                + bias_bd
            )  # [QT, QT]
            s = s - jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=1, keepdims=True)
            out_ref[0, h] = jax.lax.dot_general(
                p.astype(vv.dtype), vv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)
            return carry

        jax.lax.fori_loop(0, n_head, head_body, 0)




def _kernel(
    occ_ref,      # [nW] int32 (scalar prefetch)
    lo_ref,       # [nW] int32 (scalar prefetch): latest occupied id <= w
    q_ref,        # [1, n_head, QT, ch]    QT = T*wsz
    wk_ref,       # [1, n_head, QT, ch]    window keys, all T
    wv_ref,       # [1, n_head, QT, ch]
    rk_ref,       # [1, n_head, RT, ch]    one rolled tile
    rv_ref,       # [1, n_head, RT, ch]
    pk_ref,       # [1, n_head, PT, ch]    one pooled tile (per batch row)
    pv_ref,       # [1, n_head, PT, ch]
    bw_ref,       # [1, 1, QT] f32 additive bias for win keys in branch A
    br_ref,       # [1, 1, RT]
    bp_ref,       # [1, 1, PT]
    out_ref,      # [1, n_head, QT, ch]
    m_ref,        # [n_head, QT, 1] f32 scratch (flash running max)
    l_ref,        # [n_head, QT, 1] f32 scratch (flash running sum)
    acc_ref,      # [n_head, QT, ch] f32 scratch
    *,
    qt: int,
    n_rt: int,
    n_pt: int,
    ch: int,
    wsz: int,
    k_tile: int,
    n_head: int,
):
    iw = pl.program_id(0)
    seg = pl.program_id(1)  # 0: window keys; 1..n_rt: rolled; then pooled
    n_seg = 1 + n_rt + n_pt
    occupied = occ_ref[iw] > 0
    scale = 1.0 / math.sqrt(ch)

    def flash_tiles(h, kref, vref, bref, seg_len):
        """Continue the flash accumulation of head h over one segment."""
        q = q_ref[0, h]  # [QT, ch]
        m = m_ref[h]
        l = l_ref[h]
        acc = acc_ref[h]
        for s0 in range(0, seg_len, k_tile):
            sl = min(k_tile, seg_len - s0)
            ks = kref[0, h, s0 : s0 + sl, :]
            vs = vref[0, h, s0 : s0 + sl, :]
            bias = bref[0, 0, s0 : s0 + sl]
            s = (
                jax.lax.dot_general(
                    q, ks, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
                + bias[None, :]
            )  # [QT, sl]
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(vs.dtype), vs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = m_new
        m_ref[h] = m
        l_ref[h] = l
        acc_ref[h] = acc

    @pl.when(occupied & (seg == 0))
    def _():
        # init flash stats, then the window's own keys (the t_ind subset
        # of the masked branch is the additive bias bw)
        m_ref[...] = jnp.full_like(m_ref, NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

        def head0(h, c):
            flash_tiles(h, wk_ref, wv_ref, bw_ref, qt)
            return c

        jax.lax.fori_loop(0, n_head, head0, 0)

    @pl.when(occupied & (seg > 0) & (seg <= n_rt))
    def _():
        def headr(h, c):
            flash_tiles(h, rk_ref, rv_ref, br_ref, rk_ref.shape[2])
            return c

        jax.lax.fori_loop(0, n_head, headr, 0)

    @pl.when(occupied & (seg > n_rt))
    def _():
        def headp(h, c):
            flash_tiles(h, pk_ref, pv_ref, bp_ref, pk_ref.shape[2])
            return c

        jax.lax.fori_loop(0, n_head, headp, 0)

    @pl.when(occupied & (seg == n_seg - 1))
    def _():
        def headw(h, c):
            out_ref[0, h] = (acc_ref[h] / l_ref[h]).astype(out_ref.dtype)
            return c

        jax.lax.fori_loop(0, n_head, headw, 0)

    @pl.when(jnp.logical_not(occupied) & (seg == 0))
    def _():
        # per-frame within-window attention: queries of frame t attend
        # the wsz window keys of the SAME frame only — a block-diagonal
        # -inf-masked dot, computed in QUERY ROW TILES so the f32 score
        # intermediate stays bounded ([qt, qt] f32 at qt=855 is 2.9MB;
        # several live instances blew the scoped-VMEM budget at 720p).
        # INVARIANT: rk_ref/rv_ref/pk_ref/pv_ref MUST NOT be read in this
        # branch — their index maps deliberately left them holding other
        # windows'/tiles' data so their DMAs are skipped.
        fid_k = jax.lax.broadcasted_iota(jnp.int32, (1, qt), 1) // wsz
        q_tile = min(qt, 256)

        def head_body(h, carry):
            kk = wk_ref[0, h]
            vv = wv_ref[0, h]
            for q0 in range(0, qt, q_tile):
                ql = min(q_tile, qt - q0)
                q = q_ref[0, h, q0 : q0 + ql, :]
                fid_q = (
                    jax.lax.broadcasted_iota(jnp.int32, (ql, 1), 0) + q0
                ) // wsz
                bias_bd = (fid_q != fid_k).astype(jnp.float32) * NEG
                s = (
                    jax.lax.dot_general(
                        q, kk, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * scale
                    + bias_bd
                )  # [ql, QT]
                s = s - jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp(s)
                p = p / jnp.sum(p, axis=1, keepdims=True)
                out_ref[0, h, q0 : q0 + ql, :] = jax.lax.dot_general(
                    p.astype(vv.dtype), vv, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(out_ref.dtype)
            return carry

        jax.lax.fori_loop(0, n_head, head_body, 0)


@functools.partial(jax.jit, static_argnames=("n_win_per_b", "k_tile"))
def _window_attention_single(
    win_q: jnp.ndarray,     # [W, head, T, wsz, ch]   W = B * n_win_per_b
    win_k: jnp.ndarray,     # [W, head, T, wsz, ch]
    win_v: jnp.ndarray,
    rolled_k: jnp.ndarray,  # [W, head, RL, ch]  (t_ind-selected, flattened)
    rolled_v: jnp.ndarray,
    pool_k: jnp.ndarray,    # [B, head, PL, ch]  (t_ind-selected, UNbroadcast)
    pool_v: jnp.ndarray,
    occ: jnp.ndarray,       # [W] bool/int
    bias_w: jnp.ndarray,    # [B, T*wsz] f32 branch-A bias on window keys
    bias_r: jnp.ndarray,    # [B, RL] f32
    bias_p: jnp.ndarray,    # [B, PL] f32
    *,
    n_win_per_b: int,
    k_tile: int = 512,
) -> jnp.ndarray:
    """Single-pass form: whole rolled/pooled segments as one block each.

    Faster than the tiled form at shapes whose blocks fit the scoped
    VMEM budget (640x360: measured ~19ms vs ~25ms per attention layer
    in the 5-window group) — fewer grid steps, pooled block resident
    across a batch row. The wrapper picks per shape."""
    n_win, n_head, t, wsz, ch = win_q.shape
    qt = t * wsz
    rl = rolled_k.shape[2]
    pl_len = pool_k.shape[2]

    q2 = win_q.reshape(n_win, n_head, qt, ch)
    wk2 = win_k.reshape(n_win, n_head, qt, ch)
    wv2 = win_v.reshape(n_win, n_head, qt, ch)
    occ_i = occ.astype(jnp.int32)

    kern = functools.partial(
        _kernel_single, qt=qt, rl=rl, pl_len=pl_len, ch=ch, wsz=wsz, k_tile=k_tile,
        n_head=n_head,
    )
    # rolled K/V are read ONLY by the occupied branch; for clean windows
    # the occupancy-dependent index map pins their block index in place,
    # so Pallas's same-index revisit caching skips the DMA entirely.
    # Rolled traffic then scales with the number of OCCUPIED windows
    # (typically a small fraction for localized object masks) instead of
    # all of them.
    last_occ = jnp.maximum(
        jax.lax.associative_scan(
            jnp.maximum, jnp.where(occ_i > 0, jnp.arange(n_win), -1)
        ),
        0,
    ).astype(jnp.int32)  # [nW]: latest occupied window id <= w

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_win,),
        in_specs=[
            pl.BlockSpec((1, n_head, qt, ch), lambda w, occ_, lo_: (w, 0, 0, 0)),
            pl.BlockSpec((1, n_head, qt, ch), lambda w, occ_, lo_: (w, 0, 0, 0)),
            pl.BlockSpec((1, n_head, qt, ch), lambda w, occ_, lo_: (w, 0, 0, 0)),
            pl.BlockSpec(
                (1, n_head, rl, ch), lambda w, occ_, lo_: (lo_[w], 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, n_head, rl, ch), lambda w, occ_, lo_: (lo_[w], 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, n_head, pl_len, ch),
                lambda w, occ_, lo_: (w // n_win_per_b, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, n_head, pl_len, ch),
                lambda w, occ_, lo_: (w // n_win_per_b, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, qt), lambda w, occ_, lo_: (w // n_win_per_b, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, rl), lambda w, occ_, lo_: (w // n_win_per_b, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, pl_len), lambda w, occ_, lo_: (w // n_win_per_b, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n_head, qt, ch), lambda w, occ_, lo_: (w, 0, 0, 0)
        ),
    )
    kk = qt + rl + pl_len
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_win, n_head, qt, ch), win_q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_win * n_head * qt * kk * ch,
            bytes_accessed=n_win * n_head * (2 * qt + 2 * rl) * ch * 4,
            transcendentals=n_win * n_head * qt * kk,
        ),
    )(
        occ_i, last_occ, q2, wk2, wv2, rolled_k, rolled_v, pool_k, pool_v,
        bias_w.astype(jnp.float32)[:, None],
        bias_r.astype(jnp.float32)[:, None],
        bias_p.astype(jnp.float32)[:, None],
    )
    return out.reshape(n_win, n_head, t, wsz, ch)


@functools.partial(jax.jit, static_argnames=("n_win_per_b", "k_tile"))
def _window_attention_tiled(
    win_q: jnp.ndarray,     # [W, head, T, wsz, ch]   W = B * n_win_per_b
    win_k: jnp.ndarray,     # [W, head, T, wsz, ch]
    win_v: jnp.ndarray,
    rolled_k: jnp.ndarray,  # [W, head, RL, ch]  (t_ind-selected, flattened)
    rolled_v: jnp.ndarray,
    pool_k: jnp.ndarray,    # [B, head, PL, ch]  (t_ind-selected, UNbroadcast)
    pool_v: jnp.ndarray,
    occ: jnp.ndarray,       # [W] bool/int
    bias_w: jnp.ndarray,    # [B, T*wsz] f32 branch-A bias on window keys
    bias_r: jnp.ndarray,    # [B, RL] f32
    bias_p: jnp.ndarray,    # [B, PL] f32
    *,
    n_win_per_b: int,
    k_tile: int = 256,
) -> jnp.ndarray:
    """Returns [W, head, T, wsz, ch] in win_q's dtype (f32 accumulation)."""
    n_win, n_head, t, wsz, ch = win_q.shape
    qt = t * wsz
    rl = rolled_k.shape[2]
    pl_len = pool_k.shape[2]

    def pad_seg(kv, bias, length):
        """Pad a key segment to a SEG_TILE multiple; padded keys carry a
        -1e9 bias, so their exp underflows to an exact 0 contribution."""
        n_tiles = max(1, -(-length // SEG_TILE))
        padded = n_tiles * SEG_TILE
        if padded != length:
            kv = [
                jnp.pad(a, ((0, 0), (0, 0), (0, padded - length), (0, 0)))
                for a in kv
            ]
            bias = jnp.pad(
                bias, ((0, 0), (0, padded - length)), constant_values=NEG
            )
        return kv, bias, n_tiles

    (rolled_k, rolled_v), bias_r, n_rt = pad_seg(
        [rolled_k, rolled_v], bias_r.astype(jnp.float32), rl
    )
    (pool_k, pool_v), bias_p, n_pt = pad_seg(
        [pool_k, pool_v], bias_p.astype(jnp.float32), pl_len
    )

    q2 = win_q.reshape(n_win, n_head, qt, ch)
    wk2 = win_k.reshape(n_win, n_head, qt, ch)
    wv2 = win_v.reshape(n_win, n_head, qt, ch)
    occ_i = occ.astype(jnp.int32)

    kern = functools.partial(
        _kernel, qt=qt, n_rt=n_rt, n_pt=n_pt, ch=ch, wsz=wsz,
        k_tile=k_tile, n_head=n_head,
    )
    last_occ = jnp.maximum(
        jax.lax.associative_scan(
            jnp.maximum, jnp.where(occ_i > 0, jnp.arange(n_win), -1)
        ),
        0,
    ).astype(jnp.int32)  # [nW]: latest occupied window id <= w

    n_seg = 1 + n_rt + n_pt

    def rt_of(s, occ_, w):
        # clean windows pin the rolled tile (and batch row via lo_) so
        # revisit caching skips the DMA
        live = jnp.clip(s - 1, 0, n_rt - 1)
        return jnp.where(occ_[w] > 0, live, 0)

    def pt_of(s, occ_, w):
        # same pinning for the pooled tile: clean windows hold tile 0 so
        # the per-segment pooled DMAs are skipped (they are never read in
        # the clean branch)
        live = jnp.clip(s - 1 - n_rt, 0, n_pt - 1)
        return jnp.where(occ_[w] > 0, live, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_win, n_seg),
        in_specs=[
            pl.BlockSpec(
                (1, n_head, qt, ch), lambda w, s, occ_, lo_: (w, 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, n_head, qt, ch), lambda w, s, occ_, lo_: (w, 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, n_head, qt, ch), lambda w, s, occ_, lo_: (w, 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, n_head, SEG_TILE, ch),
                lambda w, s, occ_, lo_: (lo_[w], 0, rt_of(s, occ_, w), 0),
            ),
            pl.BlockSpec(
                (1, n_head, SEG_TILE, ch),
                lambda w, s, occ_, lo_: (lo_[w], 0, rt_of(s, occ_, w), 0),
            ),
            pl.BlockSpec(
                (1, n_head, SEG_TILE, ch),
                lambda w, s, occ_, lo_: (w // n_win_per_b, 0, pt_of(s, occ_, w), 0),
            ),
            pl.BlockSpec(
                (1, n_head, SEG_TILE, ch),
                lambda w, s, occ_, lo_: (w // n_win_per_b, 0, pt_of(s, occ_, w), 0),
            ),
            pl.BlockSpec(
                (1, 1, qt), lambda w, s, occ_, lo_: (w // n_win_per_b, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, SEG_TILE),
                lambda w, s, occ_, lo_: (
                    w // n_win_per_b, 0, rt_of(s, occ_, w)
                ),
            ),
            pl.BlockSpec(
                (1, 1, SEG_TILE),
                lambda w, s, occ_, lo_: (w // n_win_per_b, 0, pt_of(s, occ_, w)),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n_head, qt, ch), lambda w, s, occ_, lo_: (w, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((n_head, qt, 1), jnp.float32),
            pltpu.VMEM((n_head, qt, 1), jnp.float32),
            pltpu.VMEM((n_head, qt, ch), jnp.float32),
        ],
    )
    kk = qt + n_rt * SEG_TILE + n_pt * SEG_TILE
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_win, n_head, qt, ch), win_q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_win * n_head * qt * kk * ch,
            bytes_accessed=n_win * n_head * (2 * qt + 2 * n_rt * SEG_TILE)
            * ch * 4,
            transcendentals=n_win * n_head * qt * kk,
        ),
    )(
        occ_i, last_occ, q2, wk2, wv2, rolled_k, rolled_v, pool_k, pool_v,
        bias_w.astype(jnp.float32)[:, None],
        bias_r[:, None],
        bias_p[:, None],
    )
    return out.reshape(n_win, n_head, t, wsz, ch)


def window_attention_pallas(
    win_q, win_k, win_v, rolled_k, rolled_v, pool_k, pool_v, occ,
    bias_w, bias_r, bias_p, *, n_win_per_b, k_tile=None,
):
    """Dispatch: single-pass kernel when its blocks fit the scoped-VMEM
    budget (fewer grid steps, pooled block resident per batch row),
    segment-tiled kernel otherwise (bounded VMEM at any resolution)."""
    n_win, n_head, t, wsz, ch = win_q.shape
    qt = t * wsz
    rl = rolled_k.shape[2]
    pl_len = pool_k.shape[2]
    esz = 2 if win_q.dtype == jnp.bfloat16 else 4
    est = (
        (3 * qt + 2 * rl) * n_head * ch * esz * 2
        + 2 * pl_len * n_head * ch * esz
        + qt * n_head * ch * 4
    )
    if est < 12e6:
        return _window_attention_single(
            win_q, win_k, win_v, rolled_k, rolled_v, pool_k, pool_v, occ,
            bias_w, bias_r, bias_p, n_win_per_b=n_win_per_b,
            **({} if k_tile is None else {"k_tile": k_tile}),
        )
    return _window_attention_tiled(
        win_q, win_k, win_v, rolled_k, rolled_v, pool_k, pool_v, occ,
        bias_w, bias_r, bias_p, n_win_per_b=n_win_per_b,
        **({} if k_tile is None else {"k_tile": k_tile}),
    )
