"""Pallas TPU kernel: occupancy-sparse window attention, fused K/V.

The XLA path (ops/attention.py) computes BOTH branches of the
reference's masked/unmasked window dichotomy for every window and
selects by occupancy — paying the expensive all-frames branch
(~100+ GFLOP per transformer layer at 640x360) even for windows the
sparsity map says are clean, which is most of them for typical object
masks. Worse, its key tensor materializes the POOLED global tokens
broadcast to every window: at 640x360 the pooled segment is ~80% of the
keys and is identical across the 324 windows — gigabytes of HBM traffic
per layer for bytes the kernel re-reads anyway.

This kernel keeps the key set SEGMENTED (reference
sparse_transformer.py:327-345 builds it as [window | rolled | pooled]):

  * window keys arrive per-window (they double as the cheap branch's
    keys; the temporal-dilation t_ind subset of the masked branch is an
    additive -1e9 bias instead of a gather);
  * rolled keys arrive per-window, pre-selected to the t_ind frames;
  * pooled keys arrive ONCE per (batch, head) — the grid iterates
    windows fastest, so the block stays VMEM-resident across all the
    windows of a batch row instead of being re-materialized per window.

Per grid step (head, window) the occupancy bit (scalar prefetch) picks:

  * flash-style attention of the window's queries [T*45, ch] against
    the three segments (tiled, running max/sum, no materialized
    logits) — only for occupied windows; OR
  * the cheap per-frame within-window attention (reference
    sparse_transformer.py:366-380) for clean windows.

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


def _kernel(
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


@functools.partial(jax.jit, static_argnames=("n_win_per_b", "k_tile"))
def window_attention_pallas(
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
    """Returns [W, head, T, wsz, ch] in win_q's dtype (f32 accumulation)."""
    n_win, n_head, t, wsz, ch = win_q.shape
    qt = t * wsz
    rl = rolled_k.shape[2]
    pl_len = pool_k.shape[2]

    q2 = win_q.reshape(n_win, n_head, qt, ch)
    wk2 = win_k.reshape(n_win, n_head, qt, ch)
    wv2 = win_v.reshape(n_win, n_head, qt, ch)
    occ_i = occ.astype(jnp.int32)

    kern = functools.partial(
        _kernel, qt=qt, rl=rl, pl_len=pl_len, ch=ch, wsz=wsz, k_tile=k_tile,
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
