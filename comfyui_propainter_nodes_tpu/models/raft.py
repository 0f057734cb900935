"""RAFT optical flow, TPU-native.

Re-design of the reference RAFT stack (model/modules/RAFT/{raft,extractor,
update,corr}.py) for XLA:

  * NHWC activations, HWIO weights, params = flat torch-named dict
    (see utils/checkpoint.py);
  * the 20-step recurrent update (raft.py:130-147) is a `lax.scan` over the
    (net, coords1) carry — one trace, no Python loop in the compiled fn;
  * the all-pairs correlation pyramid (corr.py:12-60) is four batched
    matmul+avg-pool tensors; the per-iteration (2r+1)^2-window lookup is a
    batched bilinear gather shared with ops.warp;
  * RAFT_bi (flow_comp_raft.py:39-58) encodes every unique frame ONCE
    (the reference encodes each interior frame four times: fnet twice per
    direction), builds each pair's all-pairs correlation ONCE (the
    backward volume is the forward one transposed), and runs both
    directions through a single batched 20-iter scan; the einsum-lookup
    path keeps the pyramid unpadded, which pays for the direction
    batching's footprint;
  * convex upsampling (raft.py:81-92) is one einsum.

Only the "large" configuration is implemented (small=False,
mixed_precision=False — the settings the reference pins at
flow_comp_raft.py:13-16). Compute dtype follows the params
(config.raft_half: bf16 under the node's fp16=enable, fp32 otherwise);
flow state, convex upsampling and the returned flows are always fp32.
"""

from __future__ import annotations

import os
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (
    batch_norm_eval,
    coords_grid,
    instance_norm,
    pconv2d,
    unfold,
)

Params = Mapping[str, jnp.ndarray]

CORR_LEVELS = 4
CORR_RADIUS = 4
HDIM = 128
CDIM = 128


# ---------------------------------------------------------------- encoders


def _residual_block(p: Params, pre: str, x: jnp.ndarray, stride: int, norm: str):
    """extractor.py:5-57 ResidualBlock (instance or batch norm)."""

    def apply_norm(name, v):
        if norm == "instance":
            return instance_norm(v)
        if norm == "batch":
            return batch_norm_eval(p, name, v)
        return v

    y = pconv2d(p, pre + ".conv1", x, stride=(stride, stride), padding=(1, 1))
    y = jax.nn.relu(apply_norm(pre + ".norm1", y))
    y = pconv2d(p, pre + ".conv2", y, padding=(1, 1))
    y = jax.nn.relu(apply_norm(pre + ".norm2", y))
    if stride != 1:
        x = pconv2d(p, pre + ".downsample.0", x, stride=(stride, stride))
        x = apply_norm(pre + ".norm3", x)
    return jax.nn.relu(x + y)


def basic_encoder(p: Params, pre: str, x: jnp.ndarray, norm: str) -> jnp.ndarray:
    """extractor.py:121-193 BasicEncoder: 1/8-res features."""
    x = pconv2d(p, pre + ".conv1", x, stride=(2, 2), padding=(3, 3))
    if norm == "instance":
        x = instance_norm(x)
    elif norm == "batch":
        x = batch_norm_eval(p, pre + ".norm1", x)
    x = jax.nn.relu(x)
    for layer, stride in (("layer1", 1), ("layer2", 2), ("layer3", 2)):
        x = _residual_block(p, f"{pre}.{layer}.0", x, stride, norm)
        x = _residual_block(p, f"{pre}.{layer}.1", x, 1, norm)
    return pconv2d(p, pre + ".conv2", x)


# ---------------------------------------------------------- corr pyramid


# Window geometry: taps span [y0-r, y0+r+1] = 2r+2 rows/cols; padding PAD
# on every side keeps the window slice in-bounds (and reading exact zeros)
# for every partially-valid centroid, so "zeros" padding needs no masks.
_WIN = 2 * CORR_RADIUS + 2  # 10
# border for the dynamic-slice fallback: must be >= _WIN so a window
# whose start clamps at 0 (or Hp-_WIN) still lies ENTIRELY in the zero
# border — at 9, centroids out of range by 5-6 px read one real
# row/column with nonzero bilinear weight where grid_sample "zeros"
# semantics (and the einsum/lanes paths) give exact 0
_PAD = 2 * CORR_RADIUS + 2  # 10


def _avg_pool_map(m: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 average pool on [M, H, W] maps (odd tail rows/cols dropped,
    like torch F.avg_pool2d).

    The maps have no channel axis; `avg_pool2d` would need a size-1 lane
    dim (1/128 lane utilization over the GB-scale level-0 volume, ~100x
    off bandwidth). Here: H pairs via two sublane-strided slices + add,
    W pairs via ONE dense [W, W/2] matmul over the flattened row-major
    [M*H/2, W] view — both full-lane operations.
    """
    mm, h, w = m.shape
    h2, w2 = h // 2, w // 2
    msum = m[:, 0 : 2 * h2 : 2, :] + m[:, 1 : 2 * h2 : 2, :]  # [M, H2, W]
    pw = np.zeros((w, w2), np.float32)
    pw[2 * np.arange(w2), np.arange(w2)] = 0.25
    pw[2 * np.arange(w2) + 1, np.arange(w2)] = 0.25
    out = jnp.matmul(
        msum.reshape(mm * h2, w),
        jnp.asarray(pw, m.dtype),
        preferred_element_type=m.dtype,
    )
    return out.reshape(mm, h2, w2)


def _pool_pyramid(corr: jnp.ndarray, pad: bool):
    """corr: [M, H, W, 1] per-source-pixel maps -> 4-level avg pyramid.

    pad=True: zero-pad each level by _PAD for the dynamic-slice fallback.
    pad=False (einsum lookup): unpadded maps — out-of-range taps simply
    match no one-hot row and contribute exact zeros, the same semantics
    with 1.7x less level-0 HBM.
    """
    pyramid = []
    m = corr[..., 0]
    for lvl in range(CORR_LEVELS):
        if pad:
            pyramid.append(jnp.pad(m, ((0, 0), (_PAD, _PAD), (_PAD, _PAD))))
        else:
            pyramid.append(m)
        if lvl < CORR_LEVELS - 1:
            m = _avg_pool_map(m)
    return pyramid


def _all_pairs_corr(fmap1: jnp.ndarray, fmap2: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, C] x2 -> [N, H*W, H*W] scaled all-pairs correlation
    (corr.py:54-60). Accumulated in fp32, STORED in the compute dtype:
    the volume is the pipeline's single largest tensor and the per-iter
    window lookup re-reads all of it, so under bf16 compute a bf16
    volume halves the lookup's HBM traffic (the lookup is bandwidth
    bound). Under fp32 params the volume stays fp32 like the
    reference."""
    n, h, w, c = fmap1.shape
    f1 = fmap1.reshape(n, h * w, c)
    f2 = fmap2.reshape(n, h * w, c)
    corr = jnp.einsum(
        "npc,nqc->npq", f1, f2, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(c, jnp.float32))
    return corr.astype(fmap1.dtype)


def build_corr_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray, pad: bool = True):
    """All-pairs correlation + 4-level avg-pool pyramid (corr.py:13-27).

    fmap: [N, H, W, C]. Returns list of maps [N*H*W, Hl(+2*PAD), Wl(+2*PAD)].
    """
    n, h, w, _ = fmap1.shape
    corr = _all_pairs_corr(fmap1, fmap2).reshape(n * h * w, h, w, 1)
    return _pool_pyramid(corr, pad)


def build_corr_pyramid_bi(fmap1: jnp.ndarray, fmap2: jnp.ndarray, pad: bool):
    """BOTH directions' pyramids from ONE all-pairs einsum.

    The backward correlation volume is the transpose of the forward one
    (corr_bwd[q, p] = <fmap2_q, fmap1_p> = corr_fwd[p, q]), so RAFT_bi
    (flow_comp_raft.py:39-58) needs the big [HW, HW] einsum only once;
    each direction then pools over ITS OWN target coordinates. Returns
    one pyramid whose batch is [fwd pixels ++ bwd pixels].
    """
    n, h, w, _ = fmap1.shape
    corr = _all_pairs_corr(fmap1, fmap2)
    corr_b = jnp.swapaxes(corr, 1, 2)
    both = jnp.concatenate(
        [corr.reshape(n * h * w, h, w, 1), corr_b.reshape(n * h * w, h, w, 1)]
    )
    return _pool_pyramid(both, pad)


def _window_lookup_einsum(corr_pad, sy, sx, fy, fx, win: int = 9):
    """One level's (2r+1)^2 bilinear window lookup as two one-hot
    contractions (row then column), batched over pixels.

    corr_pad: [M, Hp, Wp] zero-padded maps; sy/sx [M] window starts;
    fy/fx [M] fractional offsets. Returns [M, win, win] (dy, dx) taps.

    Lowering note: the contractions are EXPLICIT broadcast-multiply-sum
    (VPU loop fusions), NOT einsum/dot. As dots they become M-batched
    [9, H]x[H, W] matmuls, and TPU batched matmuls pay a fixed per-batch-
    element latency that dwarfs the math at M ~ 1e5 — measured ~8 ms per
    LEVEL regardless of level size or dtype (~30 ms/RAFT-iter). The fused
    elementwise form streams at memory speed (~2 ms for all levels).
    """
    m, hp, wp = corr_pad.shape
    taps = jnp.arange(win, dtype=jnp.int32)
    iy = jnp.arange(hp, dtype=jnp.int32)
    pos_y = sy[:, None, None] + taps[None, :, None]
    rw = jnp.where(
        iy[None, None, :] == pos_y, (1.0 - fy)[:, None, None], 0.0
    ) + jnp.where(iy[None, None, :] == pos_y + 1, fy[:, None, None], 0.0)
    ix = jnp.arange(wp, dtype=jnp.int32)
    pos_x = sx[:, None, None] + taps[None, :, None]
    cw = jnp.where(
        ix[None, None, :] == pos_x, (1.0 - fx)[:, None, None], 0.0
    ) + jnp.where(ix[None, None, :] == pos_x + 1, fx[:, None, None], 0.0)
    # tmp[p, i, x] = sum_y rw[p, i, y] * corr[p, y, x]
    tmp = jnp.sum(
        rw.astype(corr_pad.dtype)[:, :, :, None] * corr_pad[:, None, :, :],
        axis=2,
    )
    # out[p, i, j] = sum_x tmp[p, i, x] * cw[p, j, x]
    return jnp.sum(
        tmp[:, :, None, :] * cw.astype(tmp.dtype)[:, None, :, :], axis=3
    )


def _use_unpadded_einsum() -> bool:
    """True when the MXU one-hot-einsum lookup (the TPU default) is
    active — that path needs no pyramid padding: out-of-range taps match
    no one-hot row and contribute exact zeros, saving 1.7x of level-0
    HBM (what makes batching both RAFT directions affordable)."""
    from ..ops.deform_conv import _pallas_enabled

    # "lanes" counts too: where the lanes kernel's footprint gate routes
    # a shape back to the einsum lookup, that fallback is the unpadded
    # einsum form — only the "pallas" DMA kernel needs the zero border
    return (
        _pallas_enabled()
        and os.environ.get("PROPAINTER_TPU_CORR_KERNEL", "einsum")
        in ("einsum", "lanes")
    )


def lookup_corr(pyramid, coords: jnp.ndarray, padded: bool = True) -> jnp.ndarray:
    """(2r+1)^2-window bilinear lookup at every level (corr.py:29-50).

    coords: [N, H, W, 2] current matches in pixel coords. `padded` says
    whether the pyramid maps carry the _PAD zero border (the dynamic-slice
    and Pallas paths need it; the einsum path does not).
    Returns [N, H, W, LEVELS*(2r+1)^2].

    TPU-native formulation: all 81 taps of a pixel share one fractional
    offset, so only the pixel's (2r+2)^2 window is fetched and the shared
    bilinear weights are applied with four shifted slices. On TPU the
    fetch is the DMA-pipelined Pallas kernel (ops/pallas/corr_lookup.py;
    XLA's gather runs window slices serially at ~2us each and dominated
    the whole pipeline); elsewhere a vmapped dynamic_slice.
    """
    n, h, w, _ = coords.shape
    r = CORR_RADIUS
    win = 2 * r + 1
    nhw = n * h * w
    flat = coords.reshape(nhw, 2)
    off = _PAD if padded else 0

    def starts_and_fracs(corr_map, lvl):
        c = flat / (2**lvl)
        cx, cy = c[:, 0], c[:, 1]
        x0 = jnp.floor(cx)
        y0 = jnp.floor(cy)
        fx = (cx - x0).astype(corr_map.dtype)
        fy = (cy - y0).astype(corr_map.dtype)
        sy = y0.astype(jnp.int32) - r + off
        sx = x0.astype(jnp.int32) - r + off
        if padded:
            # window start in padded coords; clamping only activates for
            # fully out-of-range centroids, whose window then reads zeros.
            # Unpadded (einsum) starts stay free: OOB rows are zero-weight.
            sy = jnp.clip(sy, 0, corr_map.shape[1] - _WIN)
            sx = jnp.clip(sx, 0, corr_map.shape[2] - _WIN)
        return sy, sx, fy, fx

    from ..ops.deform_conv import _pallas_enabled

    if _pallas_enabled() and len(pyramid) == CORR_LEVELS:
        per = [starts_and_fracs(p, i) for i, p in enumerate(pyramid)]
        if os.environ.get("PROPAINTER_TPU_CORR_KERNEL", "einsum") == "pallas":
            assert padded, "the Pallas DMA lookup needs padded maps"
            # DMA/block-pipelined Pallas window gather (kept for strict
            # fp32 tap arithmetic; ~3x slower than the einsum form)
            from ..ops.pallas.corr_lookup import corr_window_lookup4_pallas

            std4 = corr_window_lookup4_pallas(
                pyramid,
                jnp.stack([q[0] for q in per]),
                jnp.stack([q[1] for q in per]),
                jnp.stack([q[2] for q in per]),
                jnp.stack([q[3] for q in per]),
            )  # [NHW, 4, 9(dy), 9(dx)]
        else:
            # MXU/VPU formulation: the row/column window selection +
            # shared bilinear weights ARE a pair of (2-nonzero-per-row)
            # one-hot contractions — no gather at all. A tiled Pallas
            # lookup with VMEM-resident maps (one HBM pass) was built
            # and measured 6x SLOWER in round 4: at the TILE=128 forced
            # by the 16MB scoped-vmem stack, its per-tap [128, 80] VPU
            # reductions are too small to utilize the vector unit — the
            # einsum form's big fused elementwise passes win despite
            # re-reading the volume.
            std4 = jnp.stack(
                [
                    _window_lookup_einsum(p_, *q)
                    for p_, q in zip(pyramid, per)
                ],
                axis=1,
            )
        # NOTE: the reference stacks meshgrid(dy, dx) directly onto (x, y)
        # coords (corr.py:37-43), so channel (i, j) samples offset
        # (dx = d_i, dy = d_j) — transpose the natural (dy, dx) grid. The
        # pretrained update-block weights depend on this ordering.
        quirk = jnp.swapaxes(std4, 2, 3)
        return quirk.reshape(n, h, w, CORR_LEVELS * win * win)

    if not padded:  # the dynamic-slice fallback cannot read out of bounds
        pyramid = [
            jnp.pad(m, ((0, 0), (_PAD, _PAD), (_PAD, _PAD))) for m in pyramid
        ]
        padded, off = True, _PAD
    out = []
    for i, corr_pad in enumerate(pyramid):
        sy, sx, fy, fx = starts_and_fracs(corr_pad, i)
        windows = jax.vmap(
            lambda m, a, b: jax.lax.dynamic_slice(m, (a, b), (_WIN, _WIN))
        )(corr_pad, sy, sx)  # [NHW, 10, 10]
        vy = windows[:, : win, :] * (1 - fy)[:, None, None] + windows[
            :, 1:, :
        ] * fy[:, None, None]  # [NHW, 9, 10]
        std = vy[:, :, :win] * (1 - fx)[:, None, None] + vy[:, :, 1:] * fx[
            :, None, None
        ]  # [NHW, 9(dy), 9(dx)]
        # (dy, dx) -> (dx, dy) quirk; see note above
        quirk = jnp.swapaxes(std, 1, 2)
        out.append(quirk.reshape(n, h, w, win * win))
    return jnp.concatenate(out, axis=-1)


# ------------------------------------------------------------ update block


def _motion_encoder(p: Params, flow: jnp.ndarray, corr: jnp.ndarray) -> jnp.ndarray:
    """update.py:94-112 BasicMotionEncoder."""
    pre = "update_block.encoder"
    cor = jax.nn.relu(pconv2d(p, pre + ".convc1", corr))
    cor = jax.nn.relu(pconv2d(p, pre + ".convc2", cor, padding=(1, 1)))
    flo = jax.nn.relu(pconv2d(p, pre + ".convf1", flow, padding=(3, 3)))
    flo = jax.nn.relu(pconv2d(p, pre + ".convf2", flo, padding=(1, 1)))
    out = jax.nn.relu(
        pconv2d(p, pre + ".conv", jnp.concatenate([cor, flo], -1), padding=(1, 1))
    )
    return jnp.concatenate([out, flow], axis=-1)


def _sep_conv_gru(p: Params, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """update.py:35-73 SepConvGRU: 1x5 then 5x1 gated updates."""
    pre = "update_block.gru"
    for tag, pad in (("1", (0, 2)), ("2", (2, 0))):
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(pconv2d(p, f"{pre}.convz{tag}", hx, padding=pad))
        r = jax.nn.sigmoid(pconv2d(p, f"{pre}.convr{tag}", hx, padding=pad))
        q = jnp.tanh(
            pconv2d(
                p, f"{pre}.convq{tag}", jnp.concatenate([r * h, x], -1), padding=pad
            )
        )
        h = (1 - z) * h + z * q
    return h


def _update_block(p: Params, net, inp, corr, flow):
    """update.py:131-154 BasicUpdateBlock (sans mask head — see
    `_upsample_mask`)."""
    motion = _motion_encoder(p, flow, corr)
    net = _sep_conv_gru(p, net, jnp.concatenate([inp, motion], axis=-1))
    fh = jax.nn.relu(pconv2d(p, "update_block.flow_head.conv1", net, padding=(1, 1)))
    delta_flow = pconv2d(p, "update_block.flow_head.conv2", fh, padding=(1, 1))
    return net, delta_flow


def _upsample_mask(p: Params, net):
    """update.py:139-153 mask head. The reference evaluates it every
    iteration (training supervises per-iter upsampled flows) but inference
    consumes only the FINAL iteration's mask (raft.py:144-151, test_mode),
    and it is a pure function of that iteration's post-GRU `net` — so the
    TPU build hoists it out of the scan: ~14% of the update loop's FLOPs
    for bit-identical output."""
    m = jax.nn.relu(pconv2d(p, "update_block.mask.0", net, padding=(1, 1)))
    return 0.25 * pconv2d(p, "update_block.mask.2", m)


def convex_upsample(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """raft.py:81-92: learned convex combination 8x upsampling.

    flow: [N, H, W, 2]; mask: [N, H, W, 64*9] with channel = k*64 + di*8 + dj.
    """
    n, h, w, _ = flow.shape
    m = mask.reshape(n, h, w, 9, 8, 8)
    m = jax.nn.softmax(m, axis=3)
    patches = unfold(8.0 * flow, (3, 3), (1, 1), (1, 1))  # [N, H, W, 3, 3, 2]
    patches = patches.reshape(n, h, w, 9, 2)
    up = jnp.einsum("nhwkab,nhwkc->nhwabc", m, patches)  # [N, H, W, 8, 8, 2]
    up = up.transpose(0, 1, 3, 2, 4, 5)  # [N, H, 8, W, 8, 2]
    return up.reshape(n, 8 * h, 8 * w, 2)


# ------------------------------------------------------------------ forward


def raft_forward(
    params: Params, image1: jnp.ndarray, image2: jnp.ndarray, iters: int = 20
) -> jnp.ndarray:
    """Flow from image1 to image2. Images [N, H, W, 3] in [-1, 1].

    Mirrors raft.py:94-152 in test mode; returns the convex-upsampled flow
    [N, H, W, 2] fp32 (pixel units, (dx, dy) last axis).

    Compute dtype follows the params (reference keeps RAFT fp32 even
    under fp16 — utils/model_utils.py:55-58 — and so does the default
    config; PipelineConfig.raft_bf16 casts params to bf16 for ~2x MXU
    throughput on the conv-heavy update loop). Flow state (coords), the
    correlation pyramid, and convex upsampling stay fp32 either way.
    """
    cdt = params["fnet.conv1.weight"].dtype
    image1 = image1.astype(cdt)
    image2 = image2.astype(cdt)
    n, h, w, _ = image1.shape

    both = jnp.concatenate([image1, image2], axis=0)
    fmaps = basic_encoder(params, "fnet", both, norm="instance")
    fmap1, fmap2 = fmaps[:n], fmaps[n:]

    # same padding rule as raft_bi_forward: the MXU one-hot-einsum lookup
    # needs no zero border (OOB taps match no one-hot row)
    unpadded = _use_unpadded_einsum()
    pyramid = build_corr_pyramid(fmap1, fmap2, pad=not unpadded)

    cnet = basic_encoder(params, "cnet", image1, norm="batch")
    net = jnp.tanh(cnet[..., :HDIM])
    inp = jax.nn.relu(cnet[..., HDIM:])

    coords0 = coords_grid(n, h // 8, w // 8)
    coords1 = coords0

    def step(carry, _):
        net, coords1 = carry
        corr = lookup_corr(pyramid, coords1, padded=not unpadded)
        flow = coords1 - coords0
        net, delta = _update_block(
            params, net, inp, corr.astype(cdt), flow.astype(cdt)
        )
        return (net, coords1 + delta.astype(jnp.float32)), None

    (net, coords1), _ = jax.lax.scan(
        step, (net, coords1), None, length=iters
    )
    up_mask = _upsample_mask(params, net)
    return convex_upsample(coords1 - coords0, up_mask.astype(jnp.float32))


def raft_bi_forward_seqdir(
    params: Params, frames: jnp.ndarray, iters: int = 20
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Memory-lean bidirectional flow for huge resolutions: the two
    directions run SEQUENTIALLY (fwd fully, then bwd), so only one
    direction's correlation pyramid is live at a time.

    raft_bi_forward's direction batching holds both pyramids (and, on
    the einsum path, a transposed copy + a [2N, ...] concat of the
    level-0 volume) — at 1080p one pair's batched-direction build peaks
    over 16GB of HBM. Here each direction is an independent
    `raft_forward` (numerically identical to the reference's two RAFT
    calls, flow_comp_raft.py:39-58); the second direction re-encodes the
    two frames and redoes the all-pairs matmul, both negligible next to
    the 20-iteration update loop at these sizes.
    """
    b, t, h, w, c = frames.shape
    im1 = frames[:, :-1].reshape(b * (t - 1), h, w, c)
    im2 = frames[:, 1:].reshape(b * (t - 1), h, w, c)
    f_fwd = raft_forward(params, im1, im2, iters=iters)
    f_bwd = raft_forward(params, im2, im1, iters=iters)
    return (
        f_fwd.reshape(b, t - 1, h, w, 2),
        f_bwd.reshape(b, t - 1, h, w, 2),
    )


def raft_bi_forward(
    params: Params, frames: jnp.ndarray, iters: int = 20
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Bidirectional flow over a clip (flow_comp_raft.py:39-58).

    frames: [B, T, H, W, 3] in [-1, 1]. Returns (flows_fwd, flows_bwd),
    each [B, T-1, H, W, 2]. Numerically identical to two `raft_forward`
    calls, restructured for TPU:

      * every unique frame goes through fnet/cnet ONCE (the reference's
        RAFT_bi encodes each interior frame four times);
      * the [HW, HW] all-pairs correlation is computed once per adjacent
        pair — the backward volume is its transpose
        (`build_corr_pyramid_bi`);
      * both directions share one `iters`-step scan at 2x batch, halving
        dispatches and filling the MXU better;
      * under the einsum lookup the pyramid stays unpadded, which roughly
        cancels the footprint cost of direction batching.
    """
    b, t, h, w, c = frames.shape
    n = b * (t - 1)
    cdt = params["fnet.conv1.weight"].dtype
    flat = frames.reshape(b * t, h, w, c).astype(cdt)

    fmaps = basic_encoder(params, "fnet", flat, norm="instance")
    cnet_all = basic_encoder(params, "cnet", flat, norm="batch")
    h8, w8 = h // 8, w // 8

    fm = fmaps.reshape(b, t, h8, w8, -1)
    f1 = fm[:, :-1].reshape(n, h8, w8, -1)
    f2 = fm[:, 1:].reshape(n, h8, w8, -1)
    from ..ops.deform_conv import _pallas_enabled

    # pixels-on-lanes Pallas lookup: measured 10.3 vs 15.5 ms/iter at 46
    # images 45x80 — but its padded pixel-minor volume costs ~1.2x the
    # unpadded einsum maps, so past a footprint gate (high-res streaming,
    # where HBM is the binding constraint and the r4-validated sequential
    # einsum regime holds) it falls back. Per-direction volume bytes at
    # 640x360/23 pairs = 723MB (lanes); gate default 1 GB.
    esz = jnp.dtype(cdt).itemsize
    hw_pad_est = -(-(h8 * w8) // 512) * 512
    h0_est = -(-h8 // 16) * 16
    vol_bytes_dir = n * h0_est * w8 * hw_pad_est * esz
    lanes_budget = int(
        os.environ.get("PROPAINTER_TPU_LANES_BUDGET", str(1 << 30))
    )
    lanes_wmax = int(os.environ.get("PROPAINTER_TPU_LANES_WMAX", "96"))
    lanes = (
        _pallas_enabled()
        and os.environ.get("PROPAINTER_TPU_CORR_KERNEL", "lanes") == "lanes"
        and vol_bytes_dir <= lanes_budget
        # perf-validated regime is wl<=80 (<=640-wide video); high-res
        # streaming (720p+) stays on the r4-validated sequential einsum
        # memory plan
        and w8 <= lanes_wmax
    )
    if lanes:
        # per-tile dynamic y-blocks read only the sampled rows each
        # iteration (ops/pallas/corr_lanes.py). Directions keep SEPARATE
        # pyramids — concatenating them into one [2N, ...] volume costs
        # a full-volume copy and doubles peak HBM (the config-4 720p
        # OOM); the per-iteration lookup outputs (~1/100 the size) are
        # concatenated instead.
        from ..ops.pallas.corr_lanes import (
            build_corr_pyramids_lanes,
            corr_lookup_lanes,
        )

        pyr_f, pyr_b = build_corr_pyramids_lanes(f1, f2)
        lookup = lambda c: jnp.concatenate(
            [
                corr_lookup_lanes(pyr_f, c[:n]),
                corr_lookup_lanes(pyr_b, c[n:]),
            ],
            axis=0,
        )
    else:
        unpadded = _use_unpadded_einsum()
        pyramid = build_corr_pyramid_bi(f1, f2, pad=not unpadded)
        lookup = lambda c: lookup_corr(pyramid, c, padded=not unpadded)

    # context order matches the pyramid's batch: [fwd image1 ++ bwd image1]
    cn = cnet_all.reshape(b, t, h8, w8, -1)
    cnet = jnp.concatenate([cn[:, :-1], cn[:, 1:]], axis=0)
    cnet = cnet.reshape(2 * n, h8, w8, -1)
    net = jnp.tanh(cnet[..., :HDIM])
    inp = jax.nn.relu(cnet[..., HDIM:])

    coords0 = coords_grid(2 * n, h8, w8)
    coords1 = coords0

    def step(carry, _):
        net, coords1 = carry
        corr = lookup(coords1)
        flow = coords1 - coords0
        net, delta = _update_block(
            params, net, inp, corr.astype(cdt), flow.astype(cdt)
        )
        return (net, coords1 + delta.astype(jnp.float32)), None

    (net, coords1), _ = jax.lax.scan(
        step, (net, coords1), None, length=iters
    )
    flows = convex_upsample(coords1 - coords0, _upsample_mask(params, net).astype(jnp.float32))
    return (
        flows[:n].reshape(b, t - 1, h, w, 2),
        flows[n:].reshape(b, t - 1, h, w, 2),
    )
