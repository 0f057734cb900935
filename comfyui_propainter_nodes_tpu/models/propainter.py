"""ProPainter InpaintGenerator, TPU-native.

Re-design of the reference InpaintGenerator (model/propainter.py:294-453)
for XLA:

  * encoder with the grouped feature-fusion trick (:234-275) on NHWC;
  * image propagation (:85-231, learnable=False) — pure warp/mask algebra
    — and feature propagation (learnable=True, deformable alignment) both
    as `lax.scan` over frames;
  * soft split/comp + 8 temporal-sparse-transformer blocks from
    ops/attention.py (static both-branch window attention);
  * decoder only over local frames (:450-451).

Params: flat torch-named dict (utils/checkpoint.py layouts).
"""

from __future__ import annotations

import os
from typing import Mapping

import jax
import jax.numpy as jnp

from ..ops import (
    binarize,
    deform_conv2d,
    flow_warp,
    leaky_relu,
    max_pool2d,
    pconv2d,
    resize_2x_window,
    resize_bilinear,
    resize_nearest,
)
from ..ops.attention import soft_comp, soft_split, transformer_stack

Params = Mapping[str, jnp.ndarray]

CHANNEL = 128
HIDDEN = 512
DEFORM_GROUPS = 16


# ----------------------------------------------------------------- encoder

_ENC_GROUPS = {10: 2, 12: 4, 14: 8, 16: 1}


def encoder(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Encoder (model/propainter.py:234-275). x: [N, H, W, 5] -> 1/4-res
    [N, H/4, W/4, 128] with grouped fusion of the layer-7 activation."""
    out = x
    x0 = None
    for i in range(0, 18, 2):
        if i == 8:
            x0 = out  # 256ch activation saved for group fusion
        if i > 8:
            g = _ENC_GROUPS[i]
            n, h, w, _ = out.shape
            xg = x0.reshape(n, h, w, g, -1)
            og = out.reshape(n, h, w, g, -1)
            out = jnp.concatenate([xg, og], axis=-1).reshape(n, h, w, -1)
        stride = (2, 2) if i in (0, 4) else (1, 1)
        groups = _ENC_GROUPS.get(i, 1)
        out = pconv2d(
            p, f"encoder.layers.{i}", out, stride=stride, padding=(1, 1), groups=groups
        )
        out = leaky_relu(out, 0.2)
    return out


def decoder(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """decoder (model/propainter.py:304-312): two 2x (bilinear
    align_corners=True) deconvs back to full res, 3 channels.

    Frame-chunked past a full-res-area gate (per-frame pure): the
    full-res intermediates are [N, 4h, 4w, 64] — several GB for one
    720p window batched."""
    n, h4, w4, _ = x.shape
    big = (4 * h4) * (4 * w4) > int(
        os.environ.get("PROPAINTER_TPU_PP_CHUNK_AREA", "400000")
    )
    from ..parallel.spatial import spatial_active

    if big and n > 2 and not spatial_active():
        cn = 2
        nc = -(-n // cn)
        pad = nc * cn - n
        xin = (jnp.concatenate([x, x[:pad]]) if pad else x).reshape(
            (nc, cn, h4, w4, x.shape[-1])
        )
        out = jax.lax.map(lambda a: _decoder_body(p, a), xin)
        return out.reshape((nc * cn,) + out.shape[2:])[:n]
    return _decoder_body(p, x)


def _decoder_body(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    def deconv(pre, v):
        n, h, w, _ = v.shape
        v = resize_bilinear(v, 2 * h, 2 * w, align_corners=True)
        return pconv2d(p, pre + ".conv", v, padding=(1, 1))

    x = leaky_relu(deconv("decoder.0", x), 0.2)
    x = leaky_relu(pconv2d(p, "decoder.2", x, padding=(1, 1)), 0.2)
    x = leaky_relu(deconv("decoder.4", x), 0.2)
    return pconv2d(p, "decoder.6", x, padding=(1, 1))


DECODER_HALO4 = 4  # 1/4-res halo rows/cols covering the decoder's
# receptive field (convs +-3.25 at 1/4 incl. the two 2x resizes)


def decoder_crop(
    p: Params,
    x: jnp.ndarray,
    y0,
    x0,
    ch: int,
    cw: int,
) -> jnp.ndarray:
    """`decoder` restricted to the full-res crop [y0:y0+ch, x0:x0+cw).

    x: the FULL [N, h4, w4, 128] quarter-res features; y0/x0 traced
    full-res offsets (multiples of 8 — the node's crop plan buckets to
    32); ch/cw static. Exact: the block is sliced with DECODER_HALO4
    halo, the two 2x upsamples sample on the FULL image grid
    (ops.resize.resize_2x_window), and the halo — which absorbs both
    conv-padding pollution and the resize boundary rows — is trimmed
    off at full res. The full-res tail of the decoder dominates the
    feature stage's HBM traffic (~62ms of [55,360,640,64] tensors at
    640x360); decoding only the mask bbox makes it scale with the crop.
    """
    n, h4, w4, _ = x.shape
    halo = DECODER_HALO4
    nbh = ch // 4 + 2 * halo
    nbw = cw // 4 + 2 * halo
    # clamped block start (dynamic_slice clamps silently; we need the
    # actual value for the resize grids and the final trim)
    sy = jnp.clip(y0 // 4 - halo, 0, h4 - nbh)
    sx = jnp.clip(x0 // 4 - halo, 0, w4 - nbw)
    blk = jax.lax.dynamic_slice(x, (0, sy, sx, 0), (n, nbh, nbw, x.shape[3]))

    v = resize_2x_window(blk, sy, sx, h4, w4)
    v = leaky_relu(pconv2d(p, "decoder.0.conv", v, padding=(1, 1)), 0.2)
    v = leaky_relu(pconv2d(p, "decoder.2", v, padding=(1, 1)), 0.2)
    v = resize_2x_window(v, 2 * sy, 2 * sx, 2 * h4, 2 * w4)
    v = leaky_relu(pconv2d(p, "decoder.4.conv", v, padding=(1, 1)), 0.2)
    v = pconv2d(p, "decoder.6", v, padding=(1, 1))
    return jax.lax.dynamic_slice(
        v, (0, y0 - 4 * sy, x0 - 4 * sx, 0), (n, ch, cw, v.shape[3])
    )


# ------------------------------------------------- deformable alignment


def _deformable_alignment(
    p: Params, pre: str, x: jnp.ndarray, cond: jnp.ndarray, flow: jnp.ndarray
) -> jnp.ndarray:
    """DeformableAlignment (model/propainter.py:39-82): 1st-order, offsets
    are residuals on the flow. x: [N,H,W,C]; cond: [N,H,W,2C+5];
    flow: [N,H,W,2] (dx, dy)."""
    n, h, w, _ = x.shape
    o = leaky_relu(pconv2d(p, pre + ".conv_offset.0", cond, padding=(1, 1)), 0.1)
    o = leaky_relu(pconv2d(p, pre + ".conv_offset.2", o, padding=(1, 1)), 0.1)
    o = leaky_relu(pconv2d(p, pre + ".conv_offset.4", o, padding=(1, 1)), 0.1)
    o = pconv2d(p, pre + ".conv_offset.6", o, padding=(1, 1))  # 27*G

    g9 = DEFORM_GROUPS * 9
    o1, o2, mask = o[..., :g9], o[..., g9 : 2 * g9], o[..., 2 * g9 :]
    offset = 3.0 * jnp.tanh(jnp.concatenate([o1, o2], axis=-1))
    offset = offset.reshape(n, h, w, DEFORM_GROUPS, 9, 2)
    # reference adds flow.flip(1) tiled over pairs: (dy, dx) += (fy, fx)
    flow_yx = jnp.stack([flow[..., 1], flow[..., 0]], axis=-1)
    offset = offset + flow_yx[:, :, :, None, None, :]
    mask = jax.nn.sigmoid(mask).reshape(n, h, w, DEFORM_GROUPS, 9)
    return deform_conv2d(x, offset, mask, p[pre + ".weight"], p[pre + ".bias"])


# --------------------------------------------- bidirectional propagation


def _first_flags(t: int, first_index) -> jnp.ndarray:
    """[T] (or [T, B]) bool, True at the scan step where propagation
    (re)starts.

    Supports a traced `first_index` so padded sequences (padding at the
    scan FRONT, i.e. time-reversed end padding) restart propagation at the
    first real frame — making results for real frames bit-exact regardless
    of padding, with one compiled program for any valid length. A [B]
    vector gives every batched window its own restart point.
    """
    fi = jnp.asarray(first_index)
    if fi.ndim == 0:
        return jnp.arange(t) == fi
    return jnp.arange(t)[:, None] == fi[None, :]


def _bcast_flag(first, like):
    """Reshape a per-step flag ([] or [B]) to broadcast against [B,H,W,C]."""
    return first.reshape(first.shape + (1,) * (like.ndim - first.ndim))


def _align_flows(flows: jnp.ndarray) -> jnp.ndarray:
    """[T-1, ...] -> [T, ...]: step i consumes flows[i-1]; step 0's slot is
    a dummy (its result is overridden by the is_first reset)."""
    return jnp.concatenate([jnp.zeros_like(flows[:1]), flows], axis=0)


def _prop_direction_image(
    x_seq, mask_seq, flows_prop, flows_check, interpolation, first_index=0
):
    """Non-learnable direction (model/propainter.py:149-196): warp-fill.

    x_seq/mask_seq: [T, N, H, W, C]; flows_*: [T-1, N, H, W, 2] aligned so
    step i in scan order uses flows[i-1]. Returns (feats, masks) [T, ...].
    """
    t = x_seq.shape[0]

    def step(carry, inputs):
        feat_prop, mask_prop = carry
        feat_current, mask_current, flow_prop, flow_check, first = inputs
        # the consistency check warps flow_check, the mask warp samples
        # mask_prop, and the feature warp samples feat_prop — ALL at the
        # same coordinates (grid + flow_prop). When the interpolations
        # agree (bilinear), ONE fused gather carries every channel.
        if interpolation == "bilinear":
            warped = flow_warp(
                jnp.concatenate([flow_check, mask_prop, feat_prop], axis=-1),
                flow_prop,
            )
            warped3, feat_warped = warped[..., :3], warped[..., 3:]
        else:
            warped3 = flow_warp(
                jnp.concatenate([flow_check, mask_prop], axis=-1), flow_prop
            )
            feat_warped = flow_warp(feat_prop, flow_prop, interpolation)
        flow_bw_warped = warped3[..., :2]
        mask_prop_valid = binarize(warped3[..., 2:])
        diff = flow_prop + flow_bw_warped
        mag = jnp.sum(flow_prop**2, -1, keepdims=True) + jnp.sum(
            flow_bw_warped**2, -1, keepdims=True
        )
        valid = (
            jnp.sum(diff**2, -1, keepdims=True) < 0.01 * mag + 0.5
        ).astype(flow_prop.dtype)
        union = binarize(mask_current * valid * (1 - mask_prop_valid))
        feat_prop = union * feat_warped + (1 - union) * feat_current
        mask_prop = binarize(mask_current * (1 - valid * (1 - mask_prop_valid)))
        fb_ = _bcast_flag(first, feat_current)
        feat_prop = jnp.where(fb_, feat_current, feat_prop)
        mask_prop = jnp.where(fb_, mask_current, mask_prop)
        return (feat_prop, mask_prop), (feat_prop, mask_prop)

    carry0 = (jnp.zeros_like(x_seq[0]), jnp.zeros_like(mask_seq[0]))
    _, (feats, masks) = jax.lax.scan(
        step,
        carry0,
        (
            x_seq,
            mask_seq,
            _align_flows(flows_prop),
            _align_flows(flows_check),
            _first_flags(t, first_index),
        ),
    )
    return feats, masks


def _prop_direction_feature(
    p, module, x_seq, mask_seq, flows_prop, flows_check, first_index=0
):
    """Learnable direction (model/propainter.py:149-205): deform-aligned.

    mask_seq here is the 2-channel prop mask (mask_in ++ mask_updated).
    """
    da = f"feat_prop_module.deform_align.{module}"
    bb = f"feat_prop_module.backbone.{module}"
    t = x_seq.shape[0]

    def backbone(p_, feat):
        y = leaky_relu(pconv2d(p_, bb + ".0", feat, padding=(1, 1)), 0.2)
        return pconv2d(p_, bb + ".2", y, padding=(1, 1))

    def refine(feat_current, mask_current, feat_prop):
        feat = jnp.concatenate([feat_current, feat_prop, mask_current], axis=-1)
        return feat_prop + backbone(p, feat)

    def step(feat_prop, inputs):
        feat_current, mask_current, flow_prop, flow_check, first = inputs
        # consistency check + feature warp share sample coordinates
        # (grid + flow_prop): ONE fused gather instead of two
        warped = flow_warp(
            jnp.concatenate([flow_check, feat_prop], axis=-1), flow_prop
        )
        flow_bw_warped = warped[..., :2]
        feat_warped = warped[..., 2:]
        diff = flow_prop + flow_bw_warped
        mag = jnp.sum(flow_prop**2, -1, keepdims=True) + jnp.sum(
            flow_bw_warped**2, -1, keepdims=True
        )
        valid = (
            jnp.sum(diff**2, -1, keepdims=True) < 0.01 * mag + 0.5
        ).astype(feat_prop.dtype)
        cond = jnp.concatenate(
            [feat_current, feat_warped, flow_prop, valid, mask_current], axis=-1
        )
        feat_prop = _deformable_alignment(p, da, feat_prop, cond, flow_prop)
        # at the first (real) step the reference uses the current feature
        # directly (model/propainter.py:153-155)
        feat_prop = jnp.where(_bcast_flag(first, feat_current), feat_current, feat_prop)
        feat_prop = refine(feat_current, mask_current, feat_prop)
        return feat_prop, feat_prop

    _, outs = jax.lax.scan(
        step,
        jnp.zeros_like(x_seq[0]),
        (
            x_seq,
            mask_seq,
            _align_flows(flows_prop),
            _align_flows(flows_check),
            _first_flags(t, first_index),
        ),
    )
    return outs


def bidirectional_propagation_image(
    x, flows_f, flows_b, mask, interpolation="nearest", t_valid=None
):
    """learnable=False BidirectionalPropagation (model/propainter.py:118-231).

    x: [B, T, H, W, 3]; flows: [B, T-1, H, W, 2]; mask: [B, T, H, W, 1].
    Returns (prop_frames, updated_masks) [B, T, H, W, *] — the reference's
    `outputs` (= forward-pass features) and `masks_f`.

    t_valid (traced scalar or None): number of real leading frames when the
    sequence is padded at the end; results for real frames are exact.
    """
    t = x.shape[1]
    xs = jnp.moveaxis(x, 1, 0)
    ms = jnp.moveaxis(mask, 1, 0)
    ff = jnp.moveaxis(flows_f, 1, 0)
    fb = jnp.moveaxis(flows_b, 1, 0)
    bwd_first = 0 if t_valid is None else t - t_valid

    # backward pass: process frames t-1..0; at step for frame idx the prop
    # flow is flows_forward[idx] (reference :137-141); end-padding lands at
    # the scan FRONT, so propagation restarts at the first real frame
    feats_b, masks_b = _prop_direction_image(
        xs[::-1], ms[::-1], ff[::-1], fb[::-1], interpolation, bwd_first
    )
    feats_b = feats_b[::-1]
    masks_b = masks_b[::-1]
    # forward pass: inputs are the backward-pass outputs — features AND
    # updated masks (cache chaining, reference :150 cache_list); prop flow
    # is flows_backward[idx-1]
    feats_f, masks_f = _prop_direction_image(feats_b, masks_b, fb, ff, interpolation)

    return jnp.moveaxis(feats_f, 0, 1), jnp.moveaxis(masks_f, 0, 1)


def bidirectional_propagation_feature(p: Params, x, flows_f, flows_b, mask, t_valid=None):
    """learnable=True BidirectionalPropagation (model/propainter.py:118-231).

    x: [B, T, H, W, 128]; mask: [B, T, H, W, 2]. Returns [B, T, H, W, 128].
    """
    b, t, h, w, c = x.shape
    xs = jnp.moveaxis(x, 1, 0)
    ms = jnp.moveaxis(mask, 1, 0)
    ff = jnp.moveaxis(flows_f, 1, 0)
    fb = jnp.moveaxis(flows_b, 1, 0)
    bwd_first = 0 if t_valid is None else t - t_valid

    feats_b = _prop_direction_feature(
        p, "backward_1", xs[::-1], ms[::-1], ff[::-1], fb[::-1], bwd_first
    )[::-1]
    feats_f = _prop_direction_feature(p, "forward_1", feats_b, ms, fb, ff)

    fused_in = jnp.concatenate([feats_b, feats_f, ms], axis=-1)
    fused_in = fused_in.reshape(t * b, h, w, 2 * c + 2)
    y = leaky_relu(
        pconv2d(p, "feat_prop_module.fuse.0", fused_in, padding=(1, 1)), 0.2
    )
    y = pconv2d(p, "feat_prop_module.fuse.2", y, padding=(1, 1))
    y = y.reshape(t, b, h, w, c)
    return jnp.moveaxis(y + xs, 0, 1)


# ------------------------------------------------------------------ forward


def img_propagation(masked_frames, flows_f, flows_b, masks, interpolation="nearest"):
    """InpaintGenerator.img_propagation (model/propainter.py:350-356)."""
    return bidirectional_propagation_image(
        masked_frames, flows_f, flows_b, masks, interpolation
    )


def encode_features(
    p: Params,
    masked_frames: jnp.ndarray,
    masks_in: jnp.ndarray,
    masks_updated: jnp.ndarray,
) -> jnp.ndarray:
    """Per-frame encoder features (model/propainter.py:376-385).

    masked_frames [N, H, W, 3], masks [N, H, W, 1] -> [N, H/4, W/4, 128].
    Pure per-frame: window batching can encode each unique frame ONCE and
    gather windows from the features (the reference re-encodes every
    window's frames — ~2.7x redundant at default window overlap)."""
    from ..parallel.spatial import constrain_h, spatial_active

    enc_in = jnp.concatenate([masked_frames, masks_in, masks_updated], axis=-1)
    n, hh, ww, _ = enc_in.shape
    # frame-chunked past a full-res-area gate (per-frame pure, so a
    # lax.map over frame chunks is exact): a 19-frame 720p window's
    # encoder activations are several GB batched — part of what
    # overflowed HBM in the 720p streaming leg
    big = hh * ww > int(
        os.environ.get("PROPAINTER_TPU_PP_CHUNK_AREA", "400000")
    )
    if big and n > 4 and not spatial_active():
        cn = 4
        nc = -(-n // cn)
        pad = nc * cn - n
        xin = (
            jnp.concatenate([enc_in, enc_in[:pad]]) if pad else enc_in
        ).reshape((nc, cn, hh, ww, 5))
        out = jax.lax.map(lambda a: encoder(p, a), xin)
        return out.reshape((nc * cn,) + out.shape[2:])[:n]
    return constrain_h(encoder(p, constrain_h(enc_in, 1)), 1)


def downsample_flow(flows: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[N, T, H, W, 2] completed flow -> 1/4-res (model/propainter.py:391-408)."""
    n_, t_, hh, ww, _ = flows.shape
    f2 = resize_bilinear(
        flows.reshape(n_ * t_, hh, ww, 2), h, w, align_corners=False
    )
    return f2.reshape(n_, t_, h, w, 2) / 4.0


def downsample_mask(m: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[N, T, H, W, 1] mask -> 1/4-res nearest (model/propainter.py:409-417)."""
    n_, t_, hh, ww, _ = m.shape
    m2 = resize_nearest(m.reshape(n_ * t_, hh, ww, 1), h, w)
    return m2.reshape(n_, t_, h, w, 1)


def attention_pool_mask(ds_mask_in_local: jnp.ndarray) -> jnp.ndarray:
    """Attention sparsity map over local frames (model/propainter.py:425-428).

    ds_mask_in_local: [B, l_t, h, w, 1] -> [B, l_t, mh, mw, 1]."""
    b, l_t, h, w, _ = ds_mask_in_local.shape
    mp = max_pool2d(
        ds_mask_in_local.reshape(b * l_t, h, w, 1), (7, 7), (3, 3), (3, 3)
    )
    return mp.reshape(b, l_t, mp.shape[1], mp.shape[2], 1)


def inpaint_generator_from_features(
    p: Params,
    enc_feat: jnp.ndarray,
    ds_flows_f: jnp.ndarray,
    ds_flows_b: jnp.ndarray,
    ds_mask_in_local: jnp.ndarray,
    ds_mask_updated_local: jnp.ndarray,
    mask_pool_l: jnp.ndarray,
    num_local_frames: int,
    ori_hw: tuple[int, int],
    l_t_valid=None,
    ref_valid=None,
    crop=None,
) -> jnp.ndarray:
    """InpaintGenerator.forward from precomputed per-frame features.

    crop (optional): (y0, x0, ch, cw) with y0/x0 traced full-res offsets
    and ch/cw static — decode only that full-res window (decoder_crop;
    exact). Returns [B, l_t, ch, cw, 3] instead of the full frames.

    Everything after the encoder / input downsampling of the reference
    forward (model/propainter.py:358-453): feature propagation over local
    frames, soft-split, transformer stack, soft-comp, decoder.

    enc_feat: [B, T, h, w, 128] from `encode_features`
    ds_flows_f/b: [B, l_t-1, h, w, 2] from `downsample_flow`
    ds_mask_*_local: [B, l_t, h, w, 1] from `downsample_mask` (padded
        slots zeroed by the caller)
    mask_pool_l: [B, l_t, mh, mw, 1] from `attention_pool_mask`
    Returns predicted local frames [B, l_t, H, W, 3] in [-1, 1].
    """
    l_t = num_local_frames
    b, t, h, w, _ = enc_feat.shape
    ori_h, ori_w = ori_hw

    from ..parallel.spatial import constrain_h

    local_feat, ref_feat = enc_feat[:, :l_t], enc_feat[:, l_t:]

    prop_mask_in = jnp.concatenate(
        [ds_mask_in_local, ds_mask_updated_local], axis=-1
    )
    local_feat = bidirectional_propagation_feature(
        p, local_feat, ds_flows_f, ds_flows_b, prop_mask_in, t_valid=l_t_valid
    )
    enc_feat = constrain_h(jnp.concatenate([local_feat, ref_feat], axis=1), 2)

    if l_t_valid is None and ref_valid is None:
        t_valid_mask = None
    else:
        ltv = jnp.asarray(l_t if l_t_valid is None else l_t_valid)
        rfv = jnp.asarray((t - l_t) if ref_valid is None else ref_valid)
        if ltv.ndim == 0 and rfv.ndim == 0:
            t_valid_mask = jnp.concatenate(
                [jnp.arange(l_t) < ltv, jnp.arange(t - l_t) < rfv]
            )
        else:  # per-batch valid counts ([B] vectors) -> [B, T] mask
            ltv = jnp.broadcast_to(jnp.atleast_1d(ltv), (b,))
            rfv = jnp.broadcast_to(jnp.atleast_1d(rfv), (b,))
            t_valid_mask = jnp.concatenate(
                [
                    jnp.arange(l_t)[None] < ltv[:, None],
                    jnp.arange(t - l_t)[None] < rfv[:, None],
                ],
                axis=1,
            )

    trans_feat = soft_split(p, "ss", enc_feat.reshape(b * t, h, w, CHANNEL))
    fh, fw = trans_feat.shape[1], trans_feat.shape[2]
    trans_feat = constrain_h(trans_feat.reshape(b, t, fh, fw, HIDDEN), 2)

    from ..parallel.sequence import sequence_active

    seq = sequence_active()
    if seq is not None:
        # temporal sequence parallelism (SURVEY §2.4b): tokens shard
        # over T on the mesh axis, masked-window attention all-gathers
        # its K/V segments over the shards (parallel/sequence.py).
        # Selected by the feature stage for low-res windows where
        # H-sharding leaves too few token rows per shard (stages.py
        # _seq_selected).
        from ..parallel.sequence import sequence_parallel_transformer

        trans_feat = sequence_parallel_transformer(
            p, "transformers", trans_feat, (h, w), mask_pool_l,
            mesh=seq[0], t_valid_mask=t_valid_mask, axis=seq[1],
        )
    else:
        trans_feat = transformer_stack(
            p, "transformers", trans_feat, (h, w), mask_pool_l,
            t_valid_mask=t_valid_mask,
        )

    trans_feat = soft_comp(
        p, "sc", trans_feat.reshape(b * t, fh, fw, HIDDEN), (h, w)
    )
    enc_feat = constrain_h(
        enc_feat + trans_feat.reshape(b, t, h, w, CHANNEL), 2
    )

    local = constrain_h(enc_feat[:, :l_t].reshape(b * l_t, h, w, CHANNEL), 1)
    if crop is not None:
        y0, x0, chh, cww = crop
        out = decoder_crop(p, local, y0, x0, chh, cww)
        return jnp.tanh(out).reshape(b, l_t, chh, cww, 3)
    out = decoder(p, local)
    return jnp.tanh(out).reshape(b, l_t, ori_h, ori_w, 3)


def inpaint_generator_forward(
    p: Params,
    masked_frames: jnp.ndarray,
    flows_f: jnp.ndarray,
    flows_b: jnp.ndarray,
    masks_in: jnp.ndarray,
    masks_updated: jnp.ndarray,
    num_local_frames: int,
    l_t_valid=None,
    ref_valid=None,
) -> jnp.ndarray:
    """InpaintGenerator.forward (model/propainter.py:358-453), inference.

    masked_frames: [B, T, H, W, 3] in [-1, 1]
    flows_f/b:     [B, l_t-1, H, W, 2] completed flows
    masks_in:      [B, T, H, W, 1] original dilated masks
    masks_updated: [B, T, H, W, 1] masks after image propagation
    l_t_valid / ref_valid (traced scalars, per-clip [B] vectors, or None):
    real counts when the local/reference frame blocks are padded at their
    ends. Callers must zero the masks of padded slots; padded frames'
    outputs are garbage but all real-frame outputs are exact (scan resets
    + attention key masking).
    Returns predicted local frames [B, l_t, H, W, 3] in [-1, 1].

    Composition of `encode_features` + input downsampling +
    `inpaint_generator_from_features` (the batched window path hoists the
    per-frame parts and calls `..._from_features` directly).
    """
    l_t = num_local_frames
    b, t, ori_h, ori_w, _ = masked_frames.shape
    h, w = ori_h // 4, ori_w // 4

    enc_feat = encode_features(
        p,
        masked_frames.reshape(b * t, ori_h, ori_w, 3),
        masks_in.reshape(b * t, ori_h, ori_w, 1),
        masks_updated.reshape(b * t, ori_h, ori_w, 1),
    )
    from ..parallel.spatial import constrain_h

    enc_feat = constrain_h(enc_feat.reshape(b, t, h, w, CHANNEL), 2)

    ds_flows_f = downsample_flow(flows_f, h, w)
    ds_flows_b = downsample_flow(flows_b, h, w)
    ds_mask_in_local = downsample_mask(masks_in[:, :l_t], h, w)
    ds_mask_updated_local = downsample_mask(masks_updated[:, :l_t], h, w)
    mask_pool_l = attention_pool_mask(ds_mask_in_local)

    return inpaint_generator_from_features(
        p,
        enc_feat,
        ds_flows_f,
        ds_flows_b,
        ds_mask_in_local,
        ds_mask_updated_local,
        mask_pool_l,
        l_t,
        (ori_h, ori_w),
        l_t_valid=l_t_valid,
        ref_valid=ref_valid,
    )
