"""Temporal sparse window attention + token (de)composition, TPU-native.

Re-design of the reference sparse transformer internals
(model/modules/sparse_transformer.py) for XLA's static-shape world.

The reference splits windows into "masked" (attend over all frames with
window+rolled+pooled keys) and "unmasked" (attend within the window per
frame) using data-dependent `nonzero()` index sets inside a Python loop
over the batch (sparse_transformer.py:327-380) — unjittable and
MXU-hostile. Here both branches are computed batched for every window with
one big attention each, and the per-window occupancy bit selects the
result. The masked branch dominates FLOPs either way; a Pallas kernel
with occupancy-based block skipping is the planned upgrade
(ops/pallas/window_attention.py).

Window geometry (defaults): window (5, 9) = 45 tokens over an
(f_h, f_w) = (H/4 tokens) grid, 4 rolled copies of K/V masked to the 148
out-of-window positions, and a 4x4 depthwise-pooled global token grid.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from .conv import conv2d, linear, layer_norm
from .pool import max_pool2d

Params = Mapping[str, jnp.ndarray]


# ------------------------------------------------------- token (de)compose
#
# SoftSplit / SoftComp / FusionFeedForward are all (linear ∘ unfold) or
# (fold ∘ linear) with kernel (7,7), stride (3,3), padding (3,3). On TPU
# those compose into CONVOLUTIONS — the MXU's native op — instead of
# materializing patch tensors / overlap-added canvases:
#
#   linear ∘ unfold  ==  conv2d(x, W reshaped [7,7,C,out], stride 3)
#   fold ∘ linear    ==  a 3x3 conv over the TOKEN grid producing all
#                        sh*sw=9 stride-phases as stacked channels
#                        (canvas pixel 3q+a only ever receives taps
#                        ki = a+3d, so phase a of the padded canvas is a
#                        3-tap correlation along the token axis), followed
#                        by one interleave reshape when pixel layout is
#                        actually needed.
#
# A ones-channel appended to the input with the layer bias as an extra
# kernel row reproduces fold's border behavior exactly (bias taps only
# where a covering token exists).

_T2T = {"kernel": (7, 7), "stride": (3, 3), "padding": (3, 3)}


def _phase_geometry(fh: int, fw: int):
    (kh, kw), (sh, sw) = _T2T["kernel"], _T2T["stride"]
    dh, dw = -(-kh // sh), -(-kw // sw)
    return dh, dw, fh - 1 + dh, fw - 1 + dw


def _phase_kernel(wmat: jnp.ndarray, bias: jnp.ndarray, c_out: int, flip: bool):
    """[in, c_out*49] linear weight -> [dh, dw, in+1, sh*sw*c_out] conv
    kernel over the token grid; the +1 input row carries the bias."""
    (kh, kw), (sh, sw) = _T2T["kernel"], _T2T["stride"]
    dh, dw = -(-kh // sh), -(-kw // sw)
    cin = wmat.shape[0]
    k = wmat.reshape(cin, c_out, kh, kw)
    b = bias.reshape(1, c_out, kh, kw)
    k = jnp.concatenate([k, b], axis=0)  # ones-channel row
    k = jnp.pad(k, ((0, 0), (0, 0), (0, sh * dh - kh), (0, sw * dw - kw)))
    # ki = sh*d1 + a  ->  reshape (dh, sh); likewise kj
    k = k.reshape(cin + 1, c_out, dh, sh, dw, sw)
    k = k.transpose(2, 4, 0, 3, 5, 1)  # [d1, d2, in+1, a, b, c_out]
    if flip:  # fold direction: phase[q] += token[q - d]
        k = k[::-1, ::-1]
    return k.reshape(dh, dw, cin + 1, sh * sw * c_out)


def _with_ones(x: jnp.ndarray) -> jnp.ndarray:
    n, fh, fw, _ = x.shape
    return jnp.concatenate([x, jnp.ones((n, fh, fw, 1), x.dtype)], axis=-1)


def _phase_fold_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Token grid [N, fh, fw, in] -> stacked phase canvases
    [N, qh, qw, sh*sw*c_out] (q spans the padded canvas in stride units)."""
    dh, dw = kernel.shape[0], kernel.shape[1]
    return jax.lax.conv_general_dilated(
        _with_ones(x),
        kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding=((dh - 1, dh - 1), (dw - 1, dw - 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _interleave_phases(
    ph_canvas: jnp.ndarray, c_out: int, output_size: tuple[int, int]
) -> jnp.ndarray:
    """[N, qh, qw, sh*sw*c_out] -> cropped pixel canvas [N, H, W, c_out]."""
    (sh, sw), (ph, pw) = _T2T["stride"], _T2T["padding"]
    h, w = output_size
    n, qh, qw, _ = ph_canvas.shape
    out = ph_canvas.reshape(n, qh, qw, sh, sw, c_out)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(n, qh * sh, qw * sw, c_out)
    pad_h = max(0, ph + h - qh * sh)
    pad_w = max(0, pw + w - qw * sw)
    if pad_h or pad_w:
        out = jnp.pad(out, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    return out[:, ph : ph + h, pw : pw + w, :]


@functools.lru_cache(maxsize=32)
def _phase_mult(fh: int, fw: int, h: int, w: int) -> np.ndarray:
    """Static per-phase multiplier [qh, qw, sh*sw]: 1/overlap-count inside
    the cropped canvas, 0 outside (fold writes into the pad border are
    discarded by the crop, and unfold reads zeros there)."""
    (kh, kw), (sh, sw), (ph, pw) = (
        _T2T["kernel"], _T2T["stride"], _T2T["padding"],
    )

    def axis(f, size, k, s, pad):
        d_n = -(-k // s)
        q = f - 1 + d_n
        count = np.zeros((q, s))
        for a in range(s):
            for d in range(d_n):
                if a + s * d >= k:
                    continue
                qs = np.arange(q)
                count[(qs - d >= 0) & (qs - d < f), a] += 1
        pix = np.arange(q)[:, None] * s + np.arange(s)[None]
        mask = (pix >= pad) & (pix < pad + size)
        return mask / np.maximum(count, 1)

    my = axis(fh, h, kh, sh, ph)  # [qh, sh]
    mx = axis(fw, w, kw, sw, pw)  # [qw, sw]
    m = my[:, None, :, None] * mx[None, :, None, :]  # [qh, qw, sh, sw]
    return m.reshape(m.shape[0], m.shape[1], sh * sw).astype(np.float32)


def soft_split(p: Params, pre: str, x: jnp.ndarray) -> jnp.ndarray:
    """SoftSplit (sparse_transformer.py:8-36): overlapping-patch tokenize.

    x: [N, H, W, C] -> [N, f_h, f_w, hidden]. linear∘unfold == one strided
    conv (the torch Linear weight's (C, kh, kw)-major vector ordering maps
    straight onto an HWIO kernel)."""
    w = p[pre + ".embedding.weight"]  # [C*49, hidden]
    b = p[pre + ".embedding.bias"]
    (kh, kw), stride, padding = _T2T["kernel"], _T2T["stride"], _T2T["padding"]
    c = w.shape[0] // (kh * kw)
    kernel = w.reshape(c, kh, kw, -1).transpose(1, 2, 0, 3)
    return conv2d(x, kernel, b, stride=stride, padding=padding)


def soft_comp(
    p: Params, pre: str, tokens: jnp.ndarray, output_size: tuple[int, int]
) -> jnp.ndarray:
    """SoftComp (sparse_transformer.py:39-64): overlap-add de-tokenize.

    tokens: [N, f_h, f_w, hidden] -> [N, H, W, C] (+ 3x3 bias conv).
    fold∘linear as the 3x3 phase conv + one interleave."""
    w = p[pre + ".embedding.weight"]  # [hidden, C*49]
    b = p[pre + ".embedding.bias"]
    c = b.shape[0] // 49
    kernel = _phase_kernel(w, b, c, flip=True)
    out = _interleave_phases(_phase_fold_conv(tokens, kernel), c, output_size)
    return conv2d(
        out, p[pre + ".bias_conv.weight"], p[pre + ".bias_conv.bias"], padding=(1, 1)
    )


# ----------------------------------------------------------- window helpers


@functools.lru_cache(maxsize=8)
def _valid_rolled_indices(window_size: tuple[int, int]) -> np.ndarray:
    """Static index set for the 4 rolled K/V copies
    (sparse_transformer.py:184-197): positions outside the un-rolled
    window survive, concatenated over (tl, tr, bl, br)."""
    wh, ww = window_size
    eh, ew = (wh + 1) // 2, (ww + 1) // 2
    masks = []
    for corner in ("tl", "tr", "bl", "br"):
        m = np.ones((wh, ww), np.bool_)
        hs = slice(None, -eh) if corner in ("tl", "tr") else slice(eh, None)
        ws = slice(None, -ew) if corner in ("tl", "bl") else slice(ew, None)
        m[hs, ws] = False
        masks.append(m)
    flat = np.stack(masks, 0).reshape(-1)
    return np.nonzero(flat)[0]


def _window_partition(x: jnp.ndarray, window: tuple[int, int], n_head: int):
    """[B, T, H, W, C] -> [B, nW, head, T, wh*ww, C/head]
    (sparse_transformer.py:126-145)."""
    b, t, h, w, c = x.shape
    wh, ww = window
    nh, nw = h // wh, w // ww
    x = x.reshape(b, t, nh, wh, nw, ww, n_head, c // n_head)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)  # b, nh, nw, head, t, wh, ww, ch
    return x.reshape(b, nh * nw, n_head, t, wh * ww, c // n_head)


def sparse_window_attention(
    p: Params,
    pre: str,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    t_ind: np.ndarray | None,
    n_head: int = 4,
    window_size: tuple[int, int] = (5, 9),
    pool_size: tuple[int, int] = (4, 4),
    t_valid_mask: jnp.ndarray | None = None,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """SparseWindowAttention.forward (sparse_transformer.py:201-393).

    x:    [B, T, H, W, C] tokens (post-LN)
    mask: [B, l_t, H, W, 1] local-frame sparsity mask (pre-pad token grid)
    t_ind: static frame subset for the masked branch (temporal dilation),
           or None for all frames.
    t_valid_mask: [T] or [B, T] bool (traced ok) — keys of padded frames
           are masked out of the all-frames branch so padded token
           sequences give bit-exact results for real frames.
    axis_name: sequence parallelism (SURVEY §2.4b). Inside shard_map with
           T sharded over `axis_name`, queries stay local and the masked
           branch's K/V segments are all-gathered over the T shards
           (n_head=4 makes Ulysses head-scatter a poor fit; gathered-KV
           rides one ICI collective per segment). `mask`, `t_ind`, and
           `t_valid_mask` must then be GLOBAL (replicated / full-T).
    """
    b, t, h, w, c = x.shape
    wh, ww = window_size
    ch = c // n_head
    n_wh = -(-h // wh)
    n_ww = -(-w // ww)
    new_h, new_w = n_wh * wh, n_ww * ww
    pad_b, pad_r = new_h - h, new_w - w
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    n_win = n_wh * n_ww

    q = linear(p, pre + ".query", x)
    k = linear(p, pre + ".key", x)
    v = linear(p, pre + ".value", x)

    win_q = _window_partition(q, window_size, n_head)  # [B,nW,hd,T,45,ch]
    win_k = _window_partition(k, window_size, n_head)
    win_v = _window_partition(v, window_size, n_head)

    # rolled K/V: 4 diagonal shifts, keep out-of-window survivors.
    # `frames` restricts the build to a static frame subset: the fused
    # kernel consumes rolled keys only at the t_ind frames, and the
    # rolled tensors are the attention layer's largest intermediates
    # (~3x the k field after the 148/45 survivor expansion), so building
    # the frames that get dropped is pure HBM burn.
    eh, ew = (wh + 1) // 2, (ww + 1) // 2
    shifts = [(-eh, -ew), (-eh, ew), (eh, -ew), (eh, ew)]
    idx = jnp.asarray(_valid_rolled_indices(window_size))

    def build_rolled(a, frames=None):
        # partition-of-roll == shifted-origin partition of ONE circularly
        # padded tensor: roll(a, -s)[r] = a[(r+s) mod] = ap[r + s + pad].
        # The four jnp.roll copies (full-tensor materializations, the
        # attention layer's dominant HBM cost per NOTES_ROUND4 §8) become
        # four window-partition reads of the same padded buffer.
        if frames is not None:
            a = a[:, frames]
        ap = jnp.concatenate([a[:, :, -eh:], a, a[:, :, :eh]], axis=2)
        ap = jnp.concatenate(
            [ap[:, :, :, -ew:], ap, ap[:, :, :, :ew]], axis=3
        )
        parts = []
        for s_y, s_x in shifts:
            oy = eh - s_y  # 2*eh for the -eh roll, 0 for +eh
            ox = ew - s_x
            sl = jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(ap, oy, oy + new_h, axis=2),
                ox, ox + new_w, axis=3,
            )
            parts.append(_window_partition(sl, window_size, n_head))
        return jnp.concatenate(parts, axis=4)[:, :, :, :, idx]

    # pooled global tokens: depthwise avg conv (weights from checkpoint)
    bt = b * t
    pool_x = conv2d(
        x.reshape(bt, new_h, new_w, c),
        p[pre + ".pool_layer.weight"],
        p[pre + ".pool_layer.bias"],
        stride=pool_size,
        groups=c,
    )
    p_h, p_w = pool_x.shape[1], pool_x.shape[2]
    pool_x = pool_x.reshape(b, t, p_h, p_w, c)
    pool_k = linear(p, pre + ".key", pool_x)
    pool_v = linear(p, pre + ".value", pool_x)

    def heads_of(a):  # [B,T,ph,pw,C] -> [B,head,T,ph*pw,ch]
        return a.reshape(b, t, p_h * p_w, n_head, ch).transpose(0, 3, 1, 2, 4)

    pool_k_h = heads_of(pool_k)
    pool_v_h = heads_of(pool_v)

    # sequence parallelism: queries stay local to this T shard; gather the
    # key/value segments to the full T (one collective per segment)
    if axis_name is not None:
        ag = lambda a, ax: jax.lax.all_gather(a, axis_name, axis=ax, tiled=True)
        win_k_g, win_v_g = ag(win_k, 3), ag(win_v, 3)
        rolled_k_g = ag(build_rolled(k), 3)
        rolled_v_g = ag(build_rolled(v), 3)
        pool_k_g, pool_v_g = ag(pool_k_h, 2), ag(pool_v_h, 2)
        t_glob = win_k_g.shape[3]
    else:
        win_k_g, win_v_g = win_k, win_v
        rolled_k_g = rolled_v_g = None  # built on demand per branch
        pool_k_g, pool_v_g = pool_k_h, pool_v_h
        t_glob = t

    scale = 1.0 / math.sqrt(ch)

    # ---- occupancy map (sparse_transformer.py:322-326)
    l_t = mask.shape[1]
    occ = max_pool2d(
        mask.reshape(b * l_t, new_h, new_w, 1), window_size, window_size
    )
    occ = occ.reshape(b, l_t, n_win).sum(axis=1) > 0  # [B, nW]

    # ---- branch-A temporal subset (t_ind) + padded-frame validity
    # (frame indices are GLOBAL-T under sequence parallelism)
    ti = jnp.asarray(np.asarray(t_ind)) if t_ind is not None else None
    t_sel = len(t_ind) if t_ind is not None else t_glob
    # validity normalizes to [B, T]: scalar-per-batch padding counts give
    # each batched window its own valid frame set
    tv = (
        jnp.broadcast_to(jnp.atleast_2d(t_valid_mask), (b, t_glob))
        if t_valid_mask is not None
        else jnp.ones((b, t_glob), jnp.bool_)
    )
    tv_sel = tv[:, ti] if ti is not None else tv

    from .deform_conv import _pallas_enabled

    # single-pass kernel VMEM estimate (whole rolled/pooled segments as
    # blocks): past ~12MB Mosaic's scoped-vmem limit rejects it and the
    # attention streams through the window-chunked XLA path below. (A
    # segment-tiled kernel variant with bounded blocks exists —
    # ops/pallas/window_attention.py::_window_attention_tiled, equality-
    # tested — but Mosaic's scoped-vmem accounting of its multi-tile
    # grid is non-monotone in tile size and rejected every tiling tried
    # at 720p token shapes; see NOTES_ROUND4.md.)
    # the estimate must agree exactly with the dispatcher's
    # (pallas/window_attention.py::window_attention_pallas) or shapes this
    # gate accepts could route into the tiled kernel, which Mosaic rejects
    # at large token shapes: use the REAL rolled-survivor count for this
    # window_size and the REAL compute element size (not (5,9)/bf16
    # constants).
    _t_sel_est = len(t_ind) if t_ind is not None else t_glob
    _rl_est = _t_sel_est * int(_valid_rolled_indices(window_size).size)
    _pl_est = _t_sel_est * (-(-new_h // pool_size[0])) * (
        -(-new_w // pool_size[1])
    )
    _qt = t_glob * wh * ww
    _esz = 2 if q.dtype == jnp.bfloat16 else 4
    _vmem_est = (
        (3 * _qt + 2 * _rl_est) * n_head * ch * _esz * 2
        + 2 * _pl_est * n_head * ch * _esz
        + _qt * n_head * ch * 4
    )
    _kernel_fits = _vmem_est < 12e6

    attn_mode = os.environ.get("PROPAINTER_TPU_ATTN", "segmented")

    # the halo kernel's per-window VMEM is resolution-INDEPENDENT: the
    # halo block is per-window and the pooled segment is DMA'd in
    # bounded chunks — no size gate needed
    if _pallas_enabled() and axis_name is None and attn_mode == "halo":
        # fully fused form: the kernel consumes the raw token grids
        # (window partitioning via BlockSpecs), replaces the rolled-K/V
        # copies with a conditional halo DMA + static survivor bias, and
        # writes the token grid back (no un-partition pass). See
        # ops/pallas/window_attention_halo.py.
        from .pallas.window_attention_halo import window_attention_halo

        k_src = k[:, ti] if ti is not None else k
        v_src = v[:, ti] if ti is not None else v

        def cpad(a):
            a2 = jnp.concatenate([a[:, :, -eh:], a, a[:, :, :eh]], axis=2)
            return jnp.concatenate(
                [a2[:, :, :, -ew:], a2, a2[:, :, :, :ew]], axis=3
            )

        pk = pool_k_h[:, :, ti] if ti is not None else pool_k_h
        pv = pool_v_h[:, :, ti] if ti is not None else pool_v_h

        in_tind = np.zeros(t, np.bool_)
        in_tind[np.asarray(t_ind) if t_ind is not None else slice(None)] = True
        bias_w = jnp.repeat(
            jnp.where(jnp.asarray(in_tind)[None] & tv, 0.0, -1e9),
            wh * ww, axis=1,
        )  # [B, T*wsz]
        bias_sel = jnp.where(tv_sel, 0.0, -1e9)  # [B, T_sel]
        bias_p = jnp.repeat(bias_sel, p_h * p_w, axis=1)

        out = window_attention_halo(
            q, k, v, cpad(k_src), cpad(v_src),
            pk.reshape(b, n_head, t_sel * p_h * p_w, ch),
            pv.reshape(b, n_head, t_sel * p_h * p_w, ch),
            occ.reshape(b, n_wh, n_ww),
            bias_w, bias_sel, bias_p,
            window_size=window_size, n_head=n_head,
        )
        out = out[:, :, :h, :w]
        return linear(p, pre + ".proj", out)

    if _pallas_enabled() and axis_name is None and _kernel_fits:
        # fused occupancy-sparse kernel: clean windows skip the big
        # branch; pooled K/V go in UNbroadcast (resident per batch row);
        # the t_ind subset on window keys is an additive bias, rolled and
        # pooled keys are pre-selected
        from .pallas.window_attention import window_attention_pallas

        rk = build_rolled(k, ti)
        rv = build_rolled(v, ti)
        n_rolled = rk.shape[4]
        pk = pool_k_h[:, :, ti] if ti is not None else pool_k_h
        pv = pool_v_h[:, :, ti] if ti is not None else pool_v_h

        in_tind = np.zeros(t, np.bool_)
        in_tind[np.asarray(t_ind) if t_ind is not None else slice(None)] = True
        bias_w = jnp.repeat(
            jnp.where(jnp.asarray(in_tind)[None] & tv, 0.0, -1e9),
            wh * ww, axis=1,
        )  # [B, T*wsz]
        bias_sel = jnp.where(tv_sel, 0.0, -1e9)
        bias_r = jnp.repeat(bias_sel, n_rolled, axis=1)
        bias_p = jnp.repeat(bias_sel, p_h * p_w, axis=1)

        out = window_attention_pallas(
            win_q.reshape(b * n_win, n_head, t, wh * ww, ch),
            win_k.reshape(b * n_win, n_head, t, wh * ww, ch),
            win_v.reshape(b * n_win, n_head, t, wh * ww, ch),
            rk.reshape(b * n_win, n_head, t_sel * n_rolled, ch),
            rv.reshape(b * n_win, n_head, t_sel * n_rolled, ch),
            pk.reshape(b, n_head, t_sel * p_h * p_w, ch),
            pv.reshape(b, n_head, t_sel * p_h * p_w, ch),
            occ.reshape(b * n_win),
            bias_w,
            bias_r,
            bias_p,
            n_win_per_b=n_win,
        )
        out = out.reshape(b, n_win, n_head, t, wh * ww, ch).astype(x.dtype)
    else:
        # XLA fallback: both branches batched, select by occupancy
        if rolled_k_g is None:
            rolled_k_g = build_rolled(k)
            rolled_v_g = build_rolled(v)
        k_per_t = wh * ww + rolled_k_g.shape[4] + p_h * p_w
        key_bias = jnp.where(
            jnp.repeat(tv_sel, k_per_t, axis=1), 0.0, -1e9
        )  # [B, Ksel]
        pk_sel = pool_k_g[:, :, ti] if ti is not None else pool_k_g
        pv_sel = pool_v_g[:, :, ti] if ti is not None else pool_v_g

        def branch_a(wq_c, wk_c, wv_c, rk_c, rv_c):
            """All-frames branch for a chunk of windows [B, Cw, ...]."""
            cw_n = wq_c.shape[1]
            wk_s = wk_c[:, :, :, ti] if ti is not None else wk_c
            wv_s = wv_c[:, :, :, ti] if ti is not None else wv_c
            rk_s = rk_c[:, :, :, ti] if ti is not None else rk_c
            rv_s = rv_c[:, :, :, ti] if ti is not None else rv_c
            pk_b = jnp.broadcast_to(
                pk_sel[:, None], (b, cw_n, n_head, t_sel, p_h * p_w, ch)
            )
            pv_b = jnp.broadcast_to(
                pv_sel[:, None], (b, cw_n, n_head, t_sel, p_h * p_w, ch)
            )
            ka = jnp.concatenate([wk_s, rk_s, pk_b], axis=4).reshape(
                b, cw_n, n_head, t_sel * k_per_t, ch
            )
            va = jnp.concatenate([wv_s, rv_s, pv_b], axis=4).reshape(
                b, cw_n, n_head, t_sel * k_per_t, ch
            )
            qa = wq_c.reshape(b, cw_n, n_head, t * wh * ww, ch)
            att_a = jnp.einsum("bwhqc,bwhkc->bwhqk", qa, ka) * scale
            att_a = att_a + key_bias[:, None, None, None, :].astype(
                att_a.dtype
            )
            att_a = jax.nn.softmax(att_a, axis=-1)
            out_a = jnp.einsum("bwhqk,bwhkc->bwhqc", att_a, va)
            return out_a.reshape(b, cw_n, n_head, t, wh * ww, ch)

        # window-chunk the all-frames branch when its logits would not
        # fit comfortably in HBM (720p streaming: [144, 4, 855, 6385]
        # f32 logits are 12.6GB unchunked)
        logits_bytes = b * n_win * n_head * (t * wh * ww) * (
            t_sel * k_per_t
        ) * 4
        if logits_bytes > 1.2e9:
            cw = max(1, int(6e8 // (logits_bytes // n_win)))
            nc = -(-n_win // cw)
            pad_w = nc * cw - n_win

            def pad_chunk(a):
                if pad_w:
                    a = jnp.concatenate(
                        [a, jnp.repeat(a[:, -1:], pad_w, axis=1)], axis=1
                    )
                return jnp.moveaxis(
                    a.reshape((b, nc, cw) + a.shape[2:]), 1, 0
                )

            stacked = tuple(
                pad_chunk(a)
                for a in (win_q, win_k_g, win_v_g, rolled_k_g, rolled_v_g)
            )
            out_a = jax.lax.map(lambda ch_args: branch_a(*ch_args), stacked)
            out_a = jnp.moveaxis(out_a, 0, 1).reshape(
                (b, nc * cw) + out_a.shape[3:]
            )[:, :n_win]
        else:
            out_a = branch_a(
                win_q, win_k_g, win_v_g, rolled_k_g, rolled_v_g
            )

        att_b = jnp.einsum("bwhtqc,bwhtkc->bwhtqk", win_q, win_k) * scale
        att_b = jax.nn.softmax(att_b, axis=-1)
        out_b = jnp.einsum("bwhtqk,bwhtkc->bwhtqc", att_b, win_v)

        out = jnp.where(occ[:, :, None, None, None, None], out_a, out_b)

    # re-assemble [B,nW,hd,T,45,ch] -> [B,T,new_h,new_w,C]
    out = out.reshape(b, n_wh, n_ww, n_head, t, wh, ww, ch)
    out = out.transpose(0, 4, 1, 5, 2, 6, 3, 7).reshape(b, t, new_h, new_w, c)
    out = out[:, :, :h, :w]
    return linear(p, pre + ".proj", out)


# -------------------------------------------------------------- FFN + block


def fusion_feed_forward(
    p: Params, pre: str, x: jnp.ndarray, output_size: tuple[int, int]
) -> jnp.ndarray:
    """FusionFeedForward (sparse_transformer.py:67-123): MLP with fold/
    unfold overlap re-normalization in a 40-dim bottleneck space.

    x: [N_frames, f_h, f_w, dim].

    Entirely in phase space — the pixel canvas never materializes:
      fold∘fc1     == 3x3 token-grid conv  [dim+1 -> 9*40]
      /norm, crop  == one static per-phase multiplier map
      GELU         == elementwise here (unfold is a gather and GELU(0)=0,
                      so GELU commutes with it; the reference applies it
                      after unfold, sparse_transformer.py:72,118)
      fc2∘unfold   == 3x3 VALID conv       [9*40 -> dim]
    Two MXU convs + one fused elementwise instead of ~50 canvas passes.
    """
    n, fh, fw, _ = x.shape
    b1 = p[pre + ".fc1.0.bias"]
    c_mid = b1.shape[0] // 49  # 40
    k1 = _phase_kernel(p[pre + ".fc1.0.weight"], b1, c_mid, flip=True)
    y = _phase_fold_conv(x, k1)  # [N, qh, qw, 9*c_mid]

    mult = jnp.asarray(_phase_mult(fh, fw, *output_size))  # [qh, qw, 9]
    qh, qw = y.shape[1], y.shape[2]
    y = y.reshape(n, qh, qw, 9, c_mid) * mult[..., None].astype(y.dtype)
    y = jax.nn.gelu(y.reshape(n, qh, qw, 9 * c_mid), approximate=False)

    # fc2∘unfold: patches[t', ki, kj] = phase[(ki%3, kj%3)][t' + ki//3, ...]
    (kh, kw), (sh, sw) = _T2T["kernel"], _T2T["stride"]
    dh, dw = -(-kh // sh), -(-kw // sw)
    w2 = p[pre + ".fc2.1.weight"]  # [c_mid*49, dim]
    dim = w2.shape[1]
    k2 = w2.reshape(c_mid, kh, kw, dim)
    k2 = jnp.pad(k2, ((0, 0), (0, sh * dh - kh), (0, sw * dw - kw), (0, 0)))
    k2 = k2.reshape(c_mid, dh, sh, dw, sw, dim)
    k2 = k2.transpose(1, 3, 2, 4, 0, 5)  # [d1, d2, a, b, c_mid, dim]
    k2 = k2.reshape(dh, dw, sh * sw * c_mid, dim)
    out = jax.lax.conv_general_dilated(
        y,
        k2.astype(y.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p[pre + ".fc2.1.bias"].astype(out.dtype)


def transformer_block(
    p: Params,
    pre: str,
    x: jnp.ndarray,
    fold_size: tuple[int, int],
    mask: jnp.ndarray,
    t_ind: np.ndarray | None,
    t_valid_mask: jnp.ndarray | None = None,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """TemporalSparseTransformer (sparse_transformer.py:396-433).

    x: [B, T, f_h, f_w, C] tokens.
    """
    b, t, fh, fw, c = x.shape
    shortcut = x
    xn = layer_norm(p, pre + ".norm1", x)
    att = sparse_window_attention(
        p, pre + ".attention", xn, mask, t_ind, t_valid_mask=t_valid_mask,
        axis_name=axis_name,
    )
    x = shortcut + att
    y = layer_norm(p, pre + ".norm2", x)
    mlp = fusion_feed_forward(
        p, pre + ".mlp", y.reshape(b * t, fh, fw, c), fold_size
    ).reshape(b, t, fh, fw, c)
    return x + mlp


def transformer_stack(
    p: Params,
    pre: str,
    x: jnp.ndarray,
    fold_size: tuple[int, int],
    mask: jnp.ndarray,
    depths: int = 8,
    t_dilation: int = 2,
    t_valid_mask: jnp.ndarray | None = None,
    axis_name: str | None = None,
    t_total: int | None = None,
) -> jnp.ndarray:
    """TemporalSparseTransformerBlock (sparse_transformer.py:436-467).

    The reference runs `depths` structurally-identical blocks whose only
    static difference is the temporal-dilation phase cycling with period
    `t_dilation` (:460-466). Instead of tracing/compiling 8 copies, the
    per-depth params are stacked [depths/t_dilation, t_dilation, ...] and
    scanned — one compiled group of t_dilation blocks, 4x less XLA work.

    axis_name/t_total: sequence-parallel mode (inside shard_map with T
    sharded over axis_name); t_total is the GLOBAL frame count for the
    temporal-dilation key subsets.
    """
    t = t_total if t_total is not None else x.shape[1]
    assert depths % t_dilation == 0
    groups = depths // t_dilation

    prefix = f"{pre}.transformer.0."
    suffixes = [k[len(prefix) :] for k in p if k.startswith(prefix)]
    t_inds_all = [np.arange(d % t_dilation, t, t_dilation) for d in range(depths)]

    # Under GSPMD spatial (H) sharding the scan-over-stacked-params form
    # computes measurably different values (XLA SPMD partitions the while
    # body with involuntary full rematerializations; params passed as
    # plain jit args are exact, scan-carried params are not — see
    # tests/test_spatial.py). Unroll the depth loop there: 8 traced
    # blocks, each reading its params directly from the arg pytree.
    from ..parallel.spatial import spatial_active

    if spatial_active():
        for i in range(depths):
            pd = {
                "blk." + s: p[f"{pre}.transformer.{i}.{s}"] for s in suffixes
            }
            x = transformer_block(
                pd, "blk", x, fold_size, mask, t_inds_all[i], t_valid_mask,
                axis_name=axis_name,
            )
        return x

    # stack params: "...transformer.{i}.<suffix>" -> [groups, t_dilation, ...]
    stacked = {
        "blk." + s: jnp.stack(
            [
                jnp.stack(
                    [
                        p[f"{pre}.transformer.{g * t_dilation + d}.{s}"]
                        for d in range(t_dilation)
                    ]
                )
                for g in range(groups)
            ]
        )
        for s in suffixes
    }
    t_inds = [np.arange(d, t, t_dilation) for d in range(t_dilation)]

    def body(x, group_params):
        for d in range(t_dilation):
            pd = {k: v[d] for k, v in group_params.items()}
            x = transformer_block(
                pd, "blk", x, fold_size, mask, t_inds[d], t_valid_mask,
                axis_name=axis_name,
            )
        return x, None

    x, _ = jax.lax.scan(body, x, stacked)
    return x
