"""Recurrent flow completion network, TPU-native.

Re-design of the reference RecurrentFlowCompleteNet
(model/recurrent_flow_completion.py) for XLA:

  * P3D encoder / mid-dilation as NDHWC conv3d (T stays a conv axis — no
    per-frame Python loop);
  * the second-order bidirectional propagation (reference :56-143, a
    sequential Python loop over frames with a 2-deep cache) becomes a
    `lax.scan` with carry (prev1, prev2); the backward pass is the same
    scan over the time-flipped sequence;
  * both temporal directions of `forward_bidirect_flow` (:356-387) are
    batched into ONE network invocation (batch = [fwd, time-flipped bwd]),
    doubling MXU utilization;
  * decoders run on (b*t) batched 2D convs.

Param names follow the torch state dict (utils/checkpoint.py layouts).
"""

from __future__ import annotations

import os
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (
    deform_conv2d,
    leaky_relu,
    pconv2d,
    pconv3d,
    resize_bilinear,
)

Params = Mapping[str, jnp.ndarray]

CHANNEL = 128
DEFORM_GROUPS = 16


# ------------------------------------------------------------- P3D blocks


def _valid_tmask(t: int, t_valid, dtype, t_first=None):
    """Mask of real frames: [1, T] for a scalar count, [B, T] for per-clip
    [B] counts (clip-parallel chunk batching). `t_first` (scalar) marks
    leading synthetic-padding frames invalid too (temporal halo chunks)."""
    tv = jnp.asarray(t_valid)
    ar = jnp.arange(t)
    if tv.ndim == 0:
        m = (ar < tv).astype(dtype)[None]
    else:
        m = (ar[None] < tv[:, None]).astype(dtype)
    if t_first is not None:
        m = m * (ar >= jnp.asarray(t_first)).astype(dtype)[None]
    return m


def _p3d(
    p: Params, pre: str, x: jnp.ndarray, stride: int, t_valid=None,
    t_first=None,
) -> jnp.ndarray:
    """P3DBlock (reference :162-205): (1,k,k) spatial conv + LeakyReLU,
    then (3,1,1) dilated-2 temporal conv. x: [N, T, H, W, C].

    t_valid/t_first: frames outside [t_first, t_valid) are re-zeroed
    before the TEMPORAL conv — spatial convs with biases make padding
    nonzero, and zeroing restores the reference's zero temporal padding
    exactly (end-padded sequences AND the leading synthetic halo of
    temporal chunks)."""
    y = pconv3d(
        p, pre + ".conv1.0", x, stride=(1, stride, stride), padding=(0, 1, 1)
    )
    y = leaky_relu(y, 0.2)
    if t_valid is not None or t_first is not None:
        tv = y.shape[1] if t_valid is None else t_valid
        tmask = _valid_tmask(y.shape[1], tv, y.dtype, t_first)
        y = y * tmask[:, :, None, None, None]
    y = pconv3d(
        p, pre + ".conv2.0", y, padding=(2, 0, 0), dilation=(2, 1, 1)
    )
    return y


def _deconv(p: Params, pre: str, x: jnp.ndarray) -> jnp.ndarray:
    """deconv (reference :146-159): 2x bilinear (align_corners=True) + conv."""
    n, h, w, c = x.shape
    x = resize_bilinear(x, 2 * h, 2 * w, align_corners=True)
    return pconv2d(p, pre + ".conv", x, padding=(1, 1))


# ------------------------------------------- second-order deform alignment


def _second_order_align(
    p: Params, pre: str, x: jnp.ndarray, extra_feat: jnp.ndarray
) -> jnp.ndarray:
    """SecondOrderDeformableAlignment (reference :10-53).

    x: [N, H, W, 2C] (feat_prop ++ feat_n2); extra_feat: [N, H, W, 3C].
    """
    n, h, w, _ = x.shape
    o = pconv2d(p, pre + ".conv_offset.0", extra_feat, padding=(1, 1))
    o = leaky_relu(o, 0.1)
    o = pconv2d(p, pre + ".conv_offset.2", o, padding=(1, 1))
    o = leaky_relu(o, 0.1)
    o = pconv2d(p, pre + ".conv_offset.4", o, padding=(1, 1))
    o = leaky_relu(o, 0.1)
    o = pconv2d(p, pre + ".conv_offset.6", o, padding=(1, 1))  # 27*G

    g9 = DEFORM_GROUPS * 9
    o1, o2, mask = o[..., :g9], o[..., g9 : 2 * g9], o[..., 2 * g9 :]
    offset = 5.0 * jnp.tanh(jnp.concatenate([o1, o2], axis=-1))
    # torchvision channel layout: pairs (dy, dx) per (group, tap)
    offset = offset.reshape(n, h, w, DEFORM_GROUPS, 9, 2)
    mask = jax.nn.sigmoid(mask).reshape(n, h, w, DEFORM_GROUPS, 9)
    return deform_conv2d(
        x, offset, mask, p[pre + ".weight"], p[pre + ".bias"], padding=1
    )


# ------------------------------------------------ bidirectional propagation


def _propagate_direction(
    p: Params,
    module: str,
    x_seq: jnp.ndarray,
    extra_seq: jnp.ndarray | None,
    first_index=0,
) -> jnp.ndarray:
    """One direction of BidirectionalPropagation (reference :85-132).

    x_seq: [T, N, H, W, C] in propagation order; extra_seq: features from
    the already-completed direction (forward pass only), same shape.
    first_index: scan step (traced ok) where propagation restarts — used
    when end-padded sequences put padding at the scan front (backward
    pass); results for real frames stay bit-exact.
    Returns [T, N, H, W, C] in the same order.
    """
    t, n, h, w, c = x_seq.shape
    da = f"feat_prop_module.deform_align.{module}"
    bb = f"feat_prop_module.backbone.{module}"

    def backbone(feat):
        y = pconv2d(p, bb + ".0", feat, padding=(1, 1))
        y = leaky_relu(y, 0.1)
        return pconv2d(p, bb + ".2", y, padding=(1, 1))

    zeros = jnp.zeros((n, h, w, c), x_seq.dtype)

    def fuse_inputs(feat_current, extra, feat_prop):
        parts = [feat_current]
        if extra is not None:
            parts.append(extra)
        parts.append(feat_prop)
        return jnp.concatenate(parts, axis=-1)

    fi = jnp.asarray(first_index)
    first_flags = (
        jnp.arange(t) == fi
        if fi.ndim == 0
        else jnp.arange(t)[:, None] == fi[None, :]  # [T, N] per-clip restarts
    )

    def step(carry, inputs):
        prev1, prev2 = carry
        if extra_seq is not None:
            feat_current, extra, first = inputs
        else:
            (feat_current, first), extra = inputs, None
        firstb = first.reshape(first.shape + (1,) * (4 - first.ndim))
        cond = jnp.concatenate([prev1, feat_current, prev2], axis=-1)
        feat_prop = _second_order_align(
            p, da, jnp.concatenate([prev1, prev2], axis=-1), cond
        )
        # the reference skips alignment entirely on the first frame
        # (recurrent_flow_completion.py:96-114: feat_prop starts at zeros)
        feat_prop = jnp.where(firstb, zeros, feat_prop)
        out = feat_prop + backbone(fuse_inputs(feat_current, extra, feat_prop))
        new_prev2 = jnp.where(firstb, zeros, prev1)
        return (out, new_prev2), out

    xs = (
        (x_seq, extra_seq, first_flags)
        if extra_seq is not None
        else (x_seq, first_flags)
    )
    _, outs = jax.lax.scan(step, (zeros, zeros), xs)
    return outs


def _bidirectional_propagation(p: Params, x: jnp.ndarray, t_valid=None) -> jnp.ndarray:
    """reference :77-143. x: [N, T, H, W, C] -> [N, T, H, W, C]."""
    x_t = jnp.moveaxis(x, 1, 0)  # [T, N, H, W, C]
    bwd_first = 0 if t_valid is None else x.shape[1] - t_valid

    bwd = _propagate_direction(p, "backward_", x_t[::-1], None, bwd_first)[::-1]
    fwd = _propagate_direction(p, "forward_", x_t, bwd)

    fused = jnp.concatenate([bwd, fwd], axis=-1)
    t, n, h, w, c2 = fused.shape
    out = pconv2d(p, "feat_prop_module.fusion", fused.reshape(t * n, h, w, c2))
    out = out.reshape(t, n, h, w, c2 // 2)
    return jnp.moveaxis(out, 0, 1) + x


# ------------------------------------------------------------------ forward


def flow_complete_forward(
    p: Params, masked_flows: jnp.ndarray, masks: jnp.ndarray, t_valid=None
):
    """reference :315-354 forward (inference; no edge head).

    masked_flows: [B, T, H, W, 2]; masks: [B, T, H, W, 1].
    t_valid: number of real leading frames when T is zero-padded at the
    end (traced ok). Zero padding matches the temporal convs' own zero
    padding, and the propagation scans reset at the first real frame, so
    real outputs are exact. Returns completed flow [B, T, H, W, 2].
    """
    b, t, h, w, _ = masked_flows.shape
    inputs = jnp.concatenate([masked_flows, masks], axis=-1)  # [B,T,H,W,3]

    # frame-chunked execution past a full-res-area gate: the conv stacks
    # hold [B*T, H, W, 32] activations — 10GB bf16 for one 80-frame 720p
    # subvideo (both directions batched), far past HBM. The encoder's
    # only cross-frame coupling is its four dilated-2 temporal convs
    # (RF +-8), so temporal chunks with an 8-frame halo are EXACT; the
    # decoder is per-frame pure. The propagation core runs un-chunked at
    # 1/8 res (it is globally recurrent but small).
    big = h * w > int(
        os.environ.get("PROPAINTER_TPU_FC_CHUNK_AREA", "400000")
    ) and (t_valid is None or jnp.asarray(t_valid).ndim == 0)

    if big:
        e1p, e2 = _encode_chunked(p, inputs, t_valid)
    else:
        e1, e2 = _encode(p, inputs, t_valid)
    mid = _mid(p, e2)

    prop = _bidirectional_propagation(p, mid, t_valid)  # [B, T, H/8, W/8, 128]

    bt = b * t
    prop2 = prop.reshape(bt, h // 8, w // 8, CHANNEL)
    if big:
        e1_2p = e1p.reshape(bt, h // 4, w // 8, 128)
        flow = _decode_chunked(p, prop2, e1_2p)
    else:
        flow = _decode(p, prop2, e1.reshape(bt, h // 4, w // 4, 64))
    return flow.reshape(b, t, h, w, 2)


def _encode_core(p: Params, xp, t_valid, t_first=None):
    """downsample + P3D encoders on a PRE-PADDED input (H and W already
    edge-padded by 2): [B,T,H+4,W+4,3] -> (e1 [B,T,H/4,W/4,64],
    e2 [B,T,H/8,W/8,128])."""
    x = pconv3d(p, "downsample.0", xp, stride=(1, 2, 2))
    x = leaky_relu(x, 0.2)  # 2x down, 32ch

    e1 = _p3d(p, "encoder1.0", x, 1, t_valid, t_first)
    e1 = leaky_relu(e1, 0.2)
    e1 = _p3d(p, "encoder1.2", e1, 2, t_valid, t_first)
    e1 = leaky_relu(e1, 0.2)  # 4x, 64ch

    e2 = _p3d(p, "encoder2.0", e1, 1, t_valid, t_first)
    e2 = leaky_relu(e2, 0.2)
    e2 = _p3d(p, "encoder2.2", e2, 2, t_valid, t_first)
    e2 = leaky_relu(e2, 0.2)  # 8x, 128ch
    return e1, e2


def _encode(p: Params, inputs, t_valid, t_first=None):
    """downsample + P3D encoders: [B,T,H,W,3] ->
    (e1 [B,T,H/4,W/4,64], e2 [B,T,H/8,W/8,128])."""
    # downsample: (1,5,5) s(1,2,2) conv with REPLICATE spatial padding
    xp = jnp.pad(inputs, ((0, 0), (0, 0), (2, 2), (2, 2), (0, 0)), mode="edge")
    return _encode_core(p, xp, t_valid, t_first)


def _slab_plan(h8: int, nb: int):
    """Row-slab geometry for _encode_slabbed: list of
    (xe_start, xe_len, keep8_lo, keep4_lo, nb_i) with every xe_start a
    multiple of 8 (so slab-local /2, /4, /8 rows align to global rows at
    fixed offsets) and a 2-(/8-row) halo (16 input rows) that covers the
    encoder's spatial receptive field: a /8 row reads /4 rows +-2, /2
    rows +-6, padded-input rows [-12, +16] around its 8-row footprint.
    The first/last slab starts/ends at the frame edge, where the conv
    stack's own zero/edge padding reproduces the global computation
    exactly; interior kept rows sit >= the receptive field away from
    slab edges, so slab-edge padding is never read."""
    plan = []
    a = 0
    h_xe = 8 * h8 + 4
    while a < h8:
        nb_i = min(nb, h8 - a)
        last = a + nb_i == h8
        if a == 0:
            s, length = 0, 8 * nb_i + 16
            k8 = k4 = 0
        else:
            s = 8 * (a - 2)
            length = (h_xe - s) if last else 8 * (nb_i + 4)
            k8, k4 = 2, 4
        length = min(length, h_xe - s)
        plan.append((s, length, k8, k4, nb_i))
        a += nb_i
    return plan


def _encode_slabbed(p: Params, inputs, t_valid, t_first, nb: int):
    """_encode with the row dimension processed in slabs (exact): the
    temporal convs are spatially pointwise and the spatial convs' row
    receptive field is absorbed by the slab halo (_slab_plan). Bounds
    the half-res 32-channel activations — which lane-pad 4x and at 1080p
    dominate the completion program's HBM (the config-5 OOM) — to one
    slab's rows at a time."""
    b, tc, h, w, _ = inputs.shape
    h8 = h // 8
    xe = jnp.pad(inputs, ((0, 0), (0, 0), (2, 2), (2, 2), (0, 0)), mode="edge")
    e1s, e2s = [], []
    for s, length, k8, k4, nb_i in _slab_plan(h8, nb):
        e1c, e2c = _encode_core(
            p, jax.lax.slice_in_dim(xe, s, s + length, axis=2),
            t_valid, t_first,
        )
        e1s.append(jax.lax.slice_in_dim(e1c, k4, k4 + 2 * nb_i, axis=2))
        e2s.append(jax.lax.slice_in_dim(e2c, k8, k8 + nb_i, axis=2))
    return jnp.concatenate(e1s, axis=2), jnp.concatenate(e2s, axis=2)


def _mid(p: Params, e2):
    """mid dilation (reference :264-277): three dilated SPATIAL convs —
    per-frame pure (kt=1), so it runs OUTSIDE the temporal-halo chunking
    on the full sequence at 1/8 res (the previous in-chunk placement
    recomputed it on every halo frame, ~2x redundant at the default
    chunk shape). Frame-chunked past the 1080p area gate (exact)."""

    def run(a):
        mid = pconv3d(p, "mid_dilation.0", a, padding=(0, 3, 3), dilation=(1, 3, 3))
        mid = leaky_relu(mid, 0.2)
        mid = pconv3d(p, "mid_dilation.2", mid, padding=(0, 2, 2), dilation=(1, 2, 2))
        mid = leaky_relu(mid, 0.2)
        mid = pconv3d(p, "mid_dilation.4", mid, padding=(0, 1, 1), dilation=(1, 1, 1))
        return leaky_relu(mid, 0.2)

    b, t, h8, w8, _ = e2.shape
    big = 64 * h8 * w8 > int(
        os.environ.get("PROPAINTER_TPU_FC_BIGAREA", "1600000")
    )
    cn = 16
    if not big or t <= cn:
        return run(e2)
    n_ch = -(-t // cn)
    pad = n_ch * cn - t
    ep = jnp.concatenate([e2, e2[:, :pad]], axis=1) if pad else e2
    ec = jnp.moveaxis(
        ep.reshape(b, n_ch, cn, h8, w8, ep.shape[-1]), 1, 0
    )
    out = jax.lax.map(run, ec)
    out = jnp.moveaxis(out, 0, 1).reshape(
        b, n_ch * cn, h8, w8, out.shape[-1]
    )
    return out[:, :t]


_FC_CHUNK_T = 16
_FC_HALO = 8  # four dilated-2 temporal convs: receptive field +-8


def _fc_slab_nb(h: int, w: int, chunk_t: int, esz: int) -> int | None:
    """Row-slab size (in /8 rows) for the chunked encoder, or None below
    the area gate. Sized so one slab's half-res 32-channel activation —
    which lane-pads 4x (C=32 rounds to the 128-lane tile) — stays near
    ~1GB: at 1080p that is ~30 /8-rows -> 5 slabs per temporal chunk.
    720p and below run un-slabbed (single-slab plan == _encode)."""
    if h * w <= int(os.environ.get("PROPAINTER_TPU_FC_BIGAREA", "1600000")):
        return None
    env = os.environ.get("PROPAINTER_TPU_FC_SLAB_NB")
    if env is not None:
        return int(env)
    budget = float(os.environ.get("PROPAINTER_TPU_FC_SLAB_BYTES", 8e8))
    rows2 = budget / (chunk_t * (w // 2) * 128 * esz)
    return max(8, min(h // 8, int((rows2 - 16) // 4)))


def _pack_w2(a):
    """[..., W, C] -> [..., W/2, 2C] by folding W-phase into channels —
    pure reshape (row-major adjacency), inverted by _unpack_w2. Packed
    64-channel skip features fill the 128-lane tile exactly instead of
    padding 2x (the resident e1 is ~3GB at 90 frames 1080p unpacked)."""
    return a.reshape(a.shape[:-2] + (a.shape[-2] // 2, 2 * a.shape[-1]))


def _unpack_w2(a):
    return a.reshape(a.shape[:-2] + (2 * a.shape[-2], a.shape[-1] // 2))


def _encode_chunked(p: Params, inputs, t_valid):
    """_encode over temporal chunks with +-_FC_HALO halo frames (exact:
    interior frames see the same taps as the global computation; the
    halo absorbs the 4 temporal convs' receptive field, and synthetic
    halo/padding positions are re-zeroed before every temporal conv).

    Chunks are gathered by dynamic slice per map step (a stacked
    [n_ch, ...] copy of the padded input is 2.2GB at 1080p); e1 chunks
    leave the map W-phase-packed (_pack_w2)."""
    b, t, h, w, _ = inputs.shape
    F, HALO = _FC_CHUNK_T, _FC_HALO
    n_ch = -(-t // F)
    t_pad = n_ch * F
    gv = jnp.asarray(t if t_valid is None else t_valid)
    xg = jnp.pad(
        inputs, ((0, 0), (HALO, t_pad - t + HALO), (0, 0), (0, 0), (0, 0))
    )
    starts = np.arange(n_ch) * F
    firsts = jnp.maximum(HALO - jnp.asarray(starts), 0)
    valids = jnp.clip(gv + HALO - jnp.asarray(starts), 0, F + 2 * HALO)
    slab_nb = _fc_slab_nb(
        h, w, F + 2 * HALO, jnp.dtype(inputs.dtype).itemsize
    )

    def enc_one(args):
        s, tf, tvld = args
        ck = jax.lax.dynamic_slice_in_dim(xg, s, F + 2 * HALO, axis=1)
        if slab_nb is not None:
            e1c, e2c = _encode_slabbed(p, ck, tvld, tf, slab_nb)
        else:
            e1c, e2c = _encode(p, ck, tvld, tf)
        return (
            _pack_w2(e1c[:, HALO : HALO + F]),
            e2c[:, HALO : HALO + F],
        )

    e1s, e2s = jax.lax.map(
        enc_one, (jnp.asarray(starts), firsts, valids)
    )
    # [n_ch, B, F, ...] -> [B, n_ch*F, ...] -> [:, :t]
    def unchunk(a):
        a = jnp.moveaxis(a, 0, 1)
        return a.reshape((b, t_pad) + a.shape[3:])[:, :t]

    return unchunk(e1s), unchunk(e2s)


def _decode(p: Params, prop2, e1_2):
    """decoder2/decoder1/upsample: per-frame pure.
    prop2 [BT, H/8, W/8, 128], e1_2 [BT, H/4, W/4, 64] -> [BT, H, W, 2]."""
    d2 = pconv2d(p, "decoder2.0", prop2, padding=(1, 1))
    d2 = leaky_relu(d2, 0.2)
    d2 = _deconv(p, "decoder2.2", d2)
    d2 = leaky_relu(d2, 0.2)
    d2 = d2 + e1_2

    d1 = pconv2d(p, "decoder1.0", d2, padding=(1, 1))
    d1 = leaky_relu(d1, 0.2)
    d1 = _deconv(p, "decoder1.2", d1)
    d1 = leaky_relu(d1, 0.2)

    up = pconv2d(p, "upsample.0", d1, padding=(1, 1))
    up = leaky_relu(up, 0.2)
    return _deconv(p, "upsample.2", up)


def _decode_chunked(p: Params, prop2, e1_2p, chunk: int = 8):
    """_decode over frame chunks (exact — it is per-frame pure); bounds
    the full-res activation footprint to `chunk` frames. e1_2p arrives
    W-phase-packed (_pack_w2) and is unpacked per chunk.

    chunk shrinks past the 1080p area gate: the decoder's full-res
    16/32-channel stages lane-pad 8x/4x, so even an 8-frame chunk holds
    multiple ~4GB buffers at 1080p."""
    h8, w8 = prop2.shape[1], prop2.shape[2]
    if 64 * h8 * w8 > int(
        os.environ.get("PROPAINTER_TPU_FC_BIGAREA", "1600000")
    ):
        chunk = int(os.environ.get("PROPAINTER_TPU_FC_DECODE_CHUNK", "2"))
    bt = prop2.shape[0]
    n_ch = -(-bt // chunk)
    pad = n_ch * chunk - bt
    if pad:
        prop2 = jnp.concatenate([prop2, prop2[:pad]])
        e1_2p = jnp.concatenate([e1_2p, e1_2p[:pad]])
    pc = prop2.reshape((n_ch, chunk) + prop2.shape[1:])
    ec = e1_2p.reshape((n_ch, chunk) + e1_2p.shape[1:])
    out = jax.lax.map(lambda a: _decode(p, a[0], _unpack_w2(a[1])), (pc, ec))
    return out.reshape((n_ch * chunk,) + out.shape[2:])[:bt]


def forward_bidirect_flow(
    p: Params,
    flows_f: jnp.ndarray,
    flows_b: jnp.ndarray,
    masks: jnp.ndarray,
    t_valid=None,
):
    """reference :356-387: complete both directions. The backward pass runs
    on the time-flipped sequence; we batch both through one forward call.

    flows_f/flows_b: [B, T-1, H, W, 2]; masks: [B, T, H, W, 1].
    t_valid: number of real flows when T-1 is zero-padded at the end; the
    backward stream flips only the real prefix (padding stays at the end)
    so one compiled program serves any real length.
    Returns (pred_flows_f, pred_flows_b).
    """
    masks_fwd = masks[:, :-1]
    masks_bwd = masks[:, 1:]
    mf = flows_f * (1 - masks_fwd)
    mb = flows_b * (1 - masks_bwd)

    t = flows_f.shape[1]
    if t_valid is None:
        flip = lambda a: a[:, ::-1]
        tv2 = None
    else:
        tv = jnp.asarray(t_valid)
        ar = jnp.arange(t)
        if tv.ndim == 0:
            idx = jnp.where(ar < tv, tv - 1 - ar, ar)
            flip = lambda a: jnp.take(a, idx, axis=1)
            tv2 = tv
        else:  # per-clip counts: flip each clip's real prefix
            idx = jnp.where(ar[None] < tv[:, None], tv[:, None] - 1 - ar[None], ar[None])
            flip = lambda a: jnp.take_along_axis(
                a, idx.reshape(idx.shape + (1,) * (a.ndim - 2)), axis=1
            )
            tv2 = jnp.concatenate([tv, tv])

    # past the same full-res-area gate as the chunked encoder, the two
    # directions run SEQUENTIALLY (exact: the network has no cross-batch
    # coupling) — batching them doubles every activation at a resolution
    # where even one direction is GBs
    h_, w_ = flows_f.shape[2], flows_f.shape[3]
    seq_dirs = h_ * w_ > int(
        os.environ.get("PROPAINTER_TPU_FC_CHUNK_AREA", "400000")
    ) and (t_valid is None or jnp.asarray(t_valid).ndim == 0)
    tvv = tv2 if t_valid is not None else None
    if seq_dirs:
        tv1 = jnp.asarray(t_valid) if t_valid is not None else None
        pred_f = flow_complete_forward(p, mf, masks_fwd, tv1)
        pred_b = flip(
            flow_complete_forward(p, flip(mb), flip(masks_bwd), tv1)
        )
        return pred_f, pred_b

    batch_flows = jnp.concatenate([mf, flip(mb)], axis=0)
    batch_masks = jnp.concatenate([masks_fwd, flip(masks_bwd)], axis=0)
    pred = flow_complete_forward(p, batch_flows, batch_masks, tvv)

    b = flows_f.shape[0]
    pred_f = pred[:b]
    pred_b = flip(pred[b:])
    return pred_f, pred_b


def combine_flow(
    flows_f: jnp.ndarray,
    flows_b: jnp.ndarray,
    pred_f: jnp.ndarray,
    pred_b: jnp.ndarray,
    masks: jnp.ndarray,
):
    """reference :389-400: keep observed flow outside the mask."""
    masks_fwd = masks[:, :-1]
    masks_bwd = masks[:, 1:]
    out_f = pred_f * masks_fwd + flows_f * (1 - masks_fwd)
    out_b = pred_b * masks_bwd + flows_b * (1 - masks_bwd)
    return out_f, out_b
