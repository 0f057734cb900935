"""Pallas TPU kernel: occupancy-sparse window attention.

The XLA path (ops/attention.py) computes BOTH branches of the
reference's masked/unmasked window dichotomy for every window and
selects by occupancy — paying the expensive all-frames branch
(~100+ GFLOP per transformer layer at 640x360) even for windows the
sparsity map says are clean, which is most of them for typical object
masks.

This kernel makes the sparsity real: one grid step per (window, head)
reads the window's occupancy bit (scalar prefetch) and EITHER

  * runs flash-style attention of the window's queries [T*45, ch]
    against the full key set [K, ch] (K-tiled, running max/sum, no
    materialized logits), with additive key masking for padded frames —
    only for occupied windows; OR

  * runs the cheap per-frame within-window attention [T, 45, 45]
    (reference sparse_transformer.py:366-380) for clean windows.

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
    q_ref,        # [1, 1, QT, ch]   QT = T*45
    ka_ref,       # [1, 1, K, ch]    branch-A keys (t_ind-selected, concat)
    va_ref,       # [1, 1, K, ch]
    kb_ref,       # [1, 1, QT, ch]   branch-B keys: win keys per frame
    vb_ref,       # [1, 1, QT, ch]
    kvalid_ref,   # [1, K] float32 additive bias (0 or NEG) for padded frames
    out_ref,      # [QT, ch] float32
    *,
    qt: int,
    kk: int,
    ch: int,
    t: int,
    wsz: int,
    k_tile: int,
):
    iw = pl.program_id(0)
    occupied = occ_ref[iw] > 0
    scale = 1.0 / math.sqrt(ch)

    @pl.when(occupied)
    def _():
        q = q_ref[0, 0].astype(jnp.float32) * scale  # [QT, ch]
        m = jnp.full((qt, 1), NEG, jnp.float32)
        l = jnp.zeros((qt, 1), jnp.float32)
        acc = jnp.zeros((qt, ch), jnp.float32)
        n_tiles = kk // k_tile
        for i in range(n_tiles):
            ks = ka_ref[0, 0, i * k_tile : (i + 1) * k_tile, :].astype(jnp.float32)
            vs = va_ref[0, 0, i * k_tile : (i + 1) * k_tile, :].astype(jnp.float32)
            bias = kvalid_ref[0, i * k_tile : (i + 1) * k_tile]
            s = (
                jax.lax.dot_general(
                    q, ks, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + bias[None, :]
            )  # [QT, k_tile]
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p, vs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = m_new
        out_ref[0, 0] = acc / l

    @pl.when(jnp.logical_not(occupied))
    def _():
        # per-frame within-window attention: queries of frame t attend the
        # 45 window keys of the SAME frame only
        qb = q_ref[0, 0].astype(jnp.float32) * scale
        kb = kb_ref[0, 0].astype(jnp.float32)
        vb = vb_ref[0, 0].astype(jnp.float32)
        s_full = jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [QT, QT]
        rows = jax.lax.broadcasted_iota(jnp.int32, (qt, qt), 0) // wsz
        cols = jax.lax.broadcasted_iota(jnp.int32, (qt, qt), 1) // wsz
        s_full = jnp.where(rows == cols, s_full, NEG)
        p = jax.nn.softmax(s_full, axis=-1)
        out_ref[0, 0] = jax.lax.dot_general(
            p, vb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )


@functools.partial(jax.jit, static_argnames=("k_tile",))
def window_attention_pallas(
    win_q: jnp.ndarray,   # [nW, head, T, 45, ch]
    k_sel: jnp.ndarray,   # [nW, head, Ksel, ch]  (t_ind-selected, flattened)
    v_sel: jnp.ndarray,
    win_k: jnp.ndarray,   # [nW, head, T, 45, ch]
    win_v: jnp.ndarray,
    occ: jnp.ndarray,     # [nW] bool/int
    key_bias: jnp.ndarray,  # [Ksel] float32 (0 or -1e9)
    k_tile: int = 512,
) -> jnp.ndarray:
    """Returns [nW, head, T, 45, ch] float32."""
    n_win, n_head, t, wsz, ch = win_q.shape
    qt = t * wsz
    kk = k_sel.shape[2]
    kk_pad = -(-kk // k_tile) * k_tile
    if kk_pad != kk:
        padk = ((0, 0), (0, 0), (0, kk_pad - kk), (0, 0))
        k_sel = jnp.pad(k_sel, padk)
        v_sel = jnp.pad(v_sel, padk)
        key_bias = jnp.pad(key_bias, (0, kk_pad - kk), constant_values=NEG)

    q2 = win_q.reshape(n_win, n_head, qt, ch)
    kb2 = win_k.reshape(n_win, n_head, qt, ch)
    vb2 = win_v.reshape(n_win, n_head, qt, ch)
    occ_i = occ.astype(jnp.int32)
    bias2 = key_bias.astype(jnp.float32)[None, :]

    kern = functools.partial(
        _kernel, qt=qt, kk=kk_pad, ch=ch, t=t, wsz=wsz, k_tile=k_tile
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_win, n_head),
        in_specs=[
            pl.BlockSpec((1, 1, qt, ch), lambda i, j, occ_: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, kk_pad, ch), lambda i, j, occ_: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, kk_pad, ch), lambda i, j, occ_: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, qt, ch), lambda i, j, occ_: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, qt, ch), lambda i, j, occ_: (i, j, 0, 0)),
            pl.BlockSpec((1, kk_pad), lambda i, j, occ_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, qt, ch), lambda i, j, occ_: (i, j, 0, 0)),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_win, n_head, qt, ch), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_win * n_head * qt * kk_pad * ch,
            bytes_accessed=n_win * n_head * (qt + 2 * kk_pad) * ch * 2,
            transcendentals=n_win * n_head * qt * kk_pad,
        ),
    )(occ_i, q2, k_sel, v_sel, kb2, vb2, bias2)
    return out.reshape(n_win, n_head, t, wsz, ch)
