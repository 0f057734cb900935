"""Fine-grained device-time profiling of pipeline sub-programs.

Times each hot sub-program at EXACT production shapes (24f 640x360
default config) in the production dtype, so per-stage budgets
(VERDICT r2 item 1) are trace-backed. Select sections via
SECTIONS=attn,raft,flow,warp,blend (default: all).

Timing method: REPS-times unrolled dependency chain inside one jit
(dispatch-free), warm compile first.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPS = int(os.environ.get("REPS", 8))
SECTIONS = os.environ.get("SECTIONS", "attn,raft,flow,warp,blend").split(",")

rng = np.random.default_rng(0)
f32 = np.float32
bf16 = jnp.bfloat16


def timeit(name, fn, *args, reps=REPS):
    @jax.jit
    def run(*a):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(reps):
            a0 = a[0] + (acc * 1e-30).astype(a[0].dtype)
            out = fn(a0, *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            acc = acc + jnp.sum(leaf.astype(jnp.float32))
        return acc

    s = float(run(*args))  # compile
    t0 = time.perf_counter()
    s = float(run(*args))
    dt = (time.perf_counter() - t0 - 0.031) / reps
    print(f"{name}: {dt*1e3:.2f} ms  sum={s:.3e}", flush=True)
    return dt


# production feature-prop window shapes: 24f -> 5 windows, l_t_max=11,
# ref_max=2 -> T=13 per window; tokens (fh,fw)=(23,41) at 640x360/4 -> 7x7
# s3 p3 conv on 90x160 -> 30x54. group G=5 (all windows in one batch).
G, T, LT = 5, 13, 11
H, W = 360, 640
FH, FW = 30, 54
C = 512

if "attn" in SECTIONS:
    from comfyui_propainter_nodes_tpu.ops.attention import (
        sparse_window_attention,
        fusion_feed_forward,
        transformer_stack,
        soft_split,
        soft_comp,
        _window_partition,
    )
    from comfyui_propainter_nodes_tpu.ops.conv import linear, layer_norm
    from comfyui_propainter_nodes_tpu.utils.weights import random_params

    full = random_params("inpaint_generator")
    tp = {
        k: jnp.asarray(v, bf16)
        for k, v in full.items()
        if k.startswith(("transformers.", "ss.", "sc."))
    }
    tokens = jnp.asarray(
        rng.standard_normal((G, T, FH, FW, C)).astype(f32) * 0.05, bf16
    )
    mask = (
        jnp.zeros((G, LT, FH, FW, 1), bf16).at[:, :, 8:20, 10:30].set(1.0)
    )
    tind = np.arange(0, T, 2)

    pre = "transformers.transformer.0"
    timeit(
        "attn: full sparse_window_attention [5,13,30x54] bf16",
        lambda x: sparse_window_attention(tp, pre + ".attention", x, mask, tind),
        tokens,
    )
    os.environ["PROPAINTER_TPU_PALLAS"] = "0"
    timeit(
        "attn: XLA-fallback sparse_window_attention",
        lambda x: sparse_window_attention(tp, pre + ".attention", x, mask, tind),
        tokens,
    )
    os.environ.pop("PROPAINTER_TPU_PALLAS")

    timeit(
        "attn: qkv+proj linears only",
        lambda x: linear(tp, pre + ".attention.proj",
                         linear(tp, pre + ".attention.query", x)
                         + linear(tp, pre + ".attention.key", x)
                         + linear(tp, pre + ".attention.value", x)),
        tokens,
    )

    def rolls_only(x):
        k = linear(tp, pre + ".attention.key", x)
        eh, ew = 3, 5
        shifts = [(-eh, -ew), (-eh, ew), (eh, -ew), (eh, ew)]
        rolled = jnp.concatenate(
            [
                _window_partition(jnp.roll(k, s, axis=(2, 3)), (5, 9), 4)
                for s in shifts
            ],
            axis=4,
        )
        return rolled

    timeit("attn: k linear + 4 rolls + window partition", rolls_only, tokens)

    timeit(
        "attn: FFN only [65,30,54,512]",
        lambda x: fusion_feed_forward(
            tp, pre + ".mlp", x.reshape(G * T, FH, FW, C), (90, 160)
        ),
        tokens,
    )
    timeit(
        "attn: layer_norm only",
        lambda x: layer_norm(tp, pre + ".norm1", x),
        tokens,
    )
    timeit(
        "attn: transformer_stack x8 bf16 [5,13,30x54]",
        lambda x: transformer_stack(tp, "transformers", x, (90, 160), mask),
        tokens,
    )

if "raft" in SECTIONS:
    from comfyui_propainter_nodes_tpu.models import raft as raft_mod
    from comfyui_propainter_nodes_tpu.utils.weights import random_params

    for dt, tag in ((jnp.float32, "fp32"), (bf16, "bf16")):
        rp = {k: jnp.asarray(v, dt) for k, v in random_params("raft").items()}
        frames13 = jnp.asarray(
            rng.uniform(-1, 1, (1, 13, H, W, 3)).astype(f32), dt
        )
        timeit(
            f"raft: full bi 13f 20it {tag}",
            lambda fr: raft_mod.raft_bi_forward(rp, fr, iters=20),
            frames13,
            reps=1,
        )
        flat = frames13.reshape(13, H, W, 3)
        timeit(
            f"raft: fnet+cnet 13f {tag}",
            lambda fr: (
                raft_mod.basic_encoder(rp, "fnet", fr, "instance"),
                raft_mod.basic_encoder(rp, "cnet", fr, "batch"),
            ),
            flat,
        )
        fm = jnp.asarray(rng.standard_normal((24, 45, 80, 256)).astype(f32), dt)

        def corr_and_iters(fmaps, iters):
            f1, f2 = fmaps[:12], fmaps[12:]
            unpadded = raft_mod._use_unpadded_einsum()
            pyr = raft_mod.build_corr_pyramid_bi(f1, f2, pad=not unpadded)
            coords0 = raft_mod.coords_grid(24, 45, 80)
            net = jnp.tanh(fmaps[..., :128])
            inp = jax.nn.relu(fmaps[..., 128:])

            def step(carry, _):
                net, coords1 = carry
                corr = raft_mod.lookup_corr(pyr, coords1, padded=not unpadded)
                flow = coords1 - coords0
                net, delta = raft_mod._update_block(
                    rp, net, inp, corr.astype(dt), flow.astype(dt)
                )
                return (net, coords1 + delta.astype(jnp.float32)), None

            (net, coords1), _ = jax.lax.scan(
                step, (net, coords0), None, length=iters
            )
            return coords1

        timeit(f"raft: corr build only (24 pairs) {tag}",
               lambda fm_: raft_mod.build_corr_pyramid_bi(
                   fm_[:12], fm_[12:], pad=False), fm)
        timeit(f"raft: corr+1 iter {tag}", lambda fm_: corr_and_iters(fm_, 1), fm)
        timeit(f"raft: corr+20 iters {tag}", lambda fm_: corr_and_iters(fm_, 20), fm,
               reps=2)

if "flow" in SECTIONS:
    from comfyui_propainter_nodes_tpu.models import flow_completion as fc
    from comfyui_propainter_nodes_tpu.utils.weights import random_params

    fp = {k: jnp.asarray(v, bf16) for k, v in random_params("flow_completion").items()}
    ff = jnp.asarray(rng.standard_normal((1, 23, H, W, 2)).astype(f32), bf16)
    mk = (
        jnp.zeros((1, 24, H, W, 1), bf16).at[:, :, 100:160, 120:200].set(1.0)
    )
    timeit(
        "flowc: full forward_bidirect 23f bf16",
        lambda a: fc.forward_bidirect_flow(fp, a, a, mk),
        ff,
        reps=2,
    )

    x8 = jnp.asarray(rng.standard_normal((2, 23, 45, 80, 128)).astype(f32) * 0.1, bf16)
    timeit(
        "flowc: bidirectional prop scan only [2,23,45,80,128]",
        lambda a: fc._bidirectional_propagation(fp, a),
        x8,
    )

if "warp" in SECTIONS:
    from comfyui_propainter_nodes_tpu.ops.warp import flow_warp

    img6 = jnp.asarray(rng.standard_normal((1, H, W, 6)).astype(f32), bf16)
    flow = jnp.asarray((rng.standard_normal((1, H, W, 2)) * 8).astype(f32), bf16)
    timeit("warp: gather [1,360,640,6] bf16", flow_warp, img6, flow)

    # banded-shift warp prototype: out = sum_dy sum_dx w(dy,dx) * shift(img)
    def banded_warp(img, flow, r=16):
        n, h, w, c = img.shape
        fx, fy = flow[..., 0], flow[..., 1]
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        wx1 = (fx - x0)[..., None]
        wy1 = (fy - y0)[..., None]
        out = jnp.zeros_like(img)
        # y pass: t[dy] selected by floor(fy)==dy, two taps
        # single fused pass over (2r+1) y-shifts and (2r+1) x-shifts would
        # be (2r+1)^2; instead factor: first resolve y with 2 taps via
        # banded shifts, then x likewise on the intermediate
        tmp = jnp.zeros_like(img)
        for dy in range(-r, r + 1):
            sh = jnp.roll(img, -dy, axis=1)
            m0 = (y0 == dy).astype(img.dtype)[..., None] * (1 - wy1)
            m1 = (y0 == dy - 1).astype(img.dtype)[..., None] * wy1
            tmp = tmp + sh * (m0 + m1)
        for dx in range(-r, r + 1):
            sh = jnp.roll(tmp, -dx, axis=2)
            m0 = (x0 == dx).astype(img.dtype)[..., None] * (1 - wx1)
            m1 = (x0 == dx - 1).astype(img.dtype)[..., None] * wx1
            out = out + sh * (m0 + m1)
        return out

    timeit("warp: banded r=16 (prototype, no OOB) bf16",
           lambda a, f: banded_warp(a, f, 16), img6, flow)
    timeit("warp: banded r=64 bf16",
           lambda a, f: banded_warp(a, f, 64), img6, flow)

    # channel-packed gather: W into lanes via transpose
    def warp_wlanes(img, flow):
        n, h, w, c = img.shape
        gy, gx = jnp.meshgrid(
            jnp.arange(h, dtype=flow.dtype),
            jnp.arange(w, dtype=flow.dtype),
            indexing="ij",
        )
        x = gx[None] + flow[..., 0]
        y = gy[None] + flow[..., 1]
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1 = (x - x0).astype(img.dtype)
        wy1 = (y - y0).astype(img.dtype)
        imgt = jnp.moveaxis(img, -1, 1)  # [N, C, H, W]

        def tap(iy, ix, wgt):
            valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
            iyc = jnp.clip(iy, 0, h - 1)
            ixc = jnp.clip(ix, 0, w - 1)
            idx = (iyc * w + ixc).reshape(n, 1, h * w)
            flat = imgt.reshape(n, c, h * w)
            v = jnp.take_along_axis(
                flat, jnp.broadcast_to(idx, (n, c, h * w)), axis=2
            ).reshape(n, c, h, w)
            return v * (wgt * valid.astype(img.dtype))[:, None]

        ix0 = x0.astype(jnp.int32)
        iy0 = y0.astype(jnp.int32)
        out = (
            tap(iy0, ix0, (1 - wy1) * (1 - wx1))
            + tap(iy0, ix0 + 1, (1 - wy1) * wx1)
            + tap(iy0 + 1, ix0, wy1 * (1 - wx1))
            + tap(iy0 + 1, ix0 + 1, wy1 * wx1)
        )
        return jnp.moveaxis(out, 1, -1)

    timeit("warp: lane-gather variant bf16", warp_wlanes, img6, flow)

if "blend" in SECTIONS:
    imgs = jnp.asarray(
        rng.uniform(0, 255, (5, 11, H, W, 3)).astype(f32)
    )

    # current: unrolled static chains (24 frames, stride 5)
    windows = []
    for f in range(0, 24, 5):
        nids = list(range(max(0, f - 5), min(24, f + 6)))
        windows.append(nids)
    chains = [[] for _ in range(24)]
    for wi, nids in enumerate(windows):
        for slot, i in enumerate(nids):
            chains[i].append((wi, slot))

    def blend_unrolled(im):
        outs = []
        for chain in chains:
            w0, s0 = chain[0]
            comp = im[w0, s0]
            for wi, si in chain[1:]:
                comp = jnp.floor(0.5 * im[wi, si] + 0.5 * comp)
            outs.append(comp)
        return jnp.stack(outs)

    timeit("blend: unrolled chains 24f", blend_unrolled, imgs)

    starts = np.array([max(0, f - 5) for f in range(0, 24, 5)], np.int32)

    def blend_scan(im):
        canvas0 = jnp.zeros((24 + 11, H, W, 3), jnp.float32)
        seen0 = jnp.zeros((24 + 11,), jnp.bool_)

        def step(carry, inp):
            canvas, seen = carry
            img_w, s0 = inp
            cur = jax.lax.dynamic_slice_in_dim(canvas, s0, 11, 0)
            sn = jax.lax.dynamic_slice_in_dim(seen, s0, 11, 0)
            upd = jnp.where(
                sn[:, None, None, None],
                jnp.floor(0.5 * img_w + 0.5 * cur),
                img_w,
            )
            canvas = jax.lax.dynamic_update_slice_in_dim(canvas, upd, s0, 0)
            seen = jax.lax.dynamic_update_slice_in_dim(
                seen, jnp.ones((11,), jnp.bool_), s0, 0
            )
            return (canvas, seen), None

        (canvas, _), _ = jax.lax.scan(
            step, (canvas0, seen0), (im, jnp.asarray(starts))
        )
        return canvas[:24]

    timeit("blend: scan-over-windows 24f", blend_scan, imgs)

if "imgprop" in SECTIONS:
    from comfyui_propainter_nodes_tpu.models import propainter as pp

    fr = jnp.asarray(rng.uniform(-1, 1, (1, 24, H, W, 3)).astype(f32), bf16)
    mk = jnp.zeros((1, 24, H, W, 1), bf16).at[:, :, 100:160, 120:200].set(1.0)
    fl = jnp.asarray((rng.standard_normal((1, 23, H, W, 2)) * 4).astype(f32), bf16)
    timeit(
        "imgprop: bidirectional_propagation_image 24f nearest",
        lambda a: pp.bidirectional_propagation_image(a, fl, fl, mk, "nearest"),
        fr, reps=3,
    )

    from comfyui_propainter_nodes_tpu.ops.warp import flow_warp

    def one_step(x, m, f1, f2):
        warped3 = flow_warp(jnp.concatenate([f2[:, 0], m[:, 0]], axis=-1), f1[:, 0])
        feat_w = flow_warp(x[:, 0], f1[:, 0], "nearest")
        return warped3, feat_w

    timeit("imgprop: one step's two warps", one_step, fr, mk, fl, fl)

if "featprop" in SECTIONS:
    from comfyui_propainter_nodes_tpu.models import propainter as pp
    from comfyui_propainter_nodes_tpu.utils.weights import random_params

    ip = {
        k: jnp.asarray(v, bf16)
        for k, v in random_params("inpaint_generator").items()
    }
    feat = jnp.asarray(
        rng.standard_normal((G, LT, 90, 160, 128)).astype(f32) * 0.1, bf16
    )
    pmask = jnp.zeros((G, LT, 90, 160, 2), bf16).at[:, :, 20:40, 30:60].set(1.0)
    dsfl = jnp.asarray(
        (rng.standard_normal((G, LT - 1, 90, 160, 2)) * 2).astype(f32), bf16
    )
    timeit(
        "featprop: bidirectional_propagation_feature [5,11,90,160,128]",
        lambda a: pp.bidirectional_propagation_feature(ip, a, dsfl, dsfl, pmask),
        feat,
        reps=2,
    )

    cond = jnp.asarray(
        rng.standard_normal((G, 90, 160, 2 * 128 + 5)).astype(f32) * 0.1, bf16
    )
    fl1 = jnp.asarray(
        (rng.standard_normal((G, 90, 160, 2)) * 2).astype(f32), bf16
    )
    timeit(
        "featprop: one deformable_alignment [5,90,160,128]",
        lambda a: pp._deformable_alignment(
            ip, "feat_prop_module.deform_align.backward_1", a, cond, fl1
        ),
        feat[:, 0],
    )

    enc_in = jnp.asarray(
        rng.uniform(-1, 1, (G * T, H, W, 5)).astype(f32), bf16
    )
    timeit("featprop: encoder [65,360,640,5]", lambda a: pp.encoder(ip, a), enc_in, reps=2)
    dec_in = jnp.asarray(
        rng.standard_normal((G * LT, 90, 160, 128)).astype(f32) * 0.1, bf16
    )
    timeit("featprop: decoder [55,90,160,128]", lambda a: pp.decoder(ip, a), dec_in, reps=2)

if "corrlk" in SECTIONS:
    # level-0 lookup alternatives at pipeline shape: M=2*23*3600 pixels?
    # use per-chunk M = 24*3600 (13-frame chunk, both directions)
    M, HL, WL = 24 * 3600, 45, 80
    corr = jnp.asarray(rng.standard_normal((M, HL, WL)).astype(f32))
    coords = jnp.asarray(
        np.stack(
            [rng.uniform(0, WL, M), rng.uniform(0, HL, M)], -1
        ).astype(f32)
    )

    def prep(c):
        cx, cy = c[:, 0], c[:, 1]
        x0 = jnp.floor(cx)
        y0 = jnp.floor(cy)
        fx = cx - x0
        fy = cy - y0
        sy = y0.astype(jnp.int32) - 4
        sx = x0.astype(jnp.int32) - 4
        return sy, sx, fy, fx

    def lookup_einsum(corr, c):
        sy, sx, fy, fx = prep(c)
        taps = jnp.arange(9, dtype=jnp.int32)
        iy = jnp.arange(HL, dtype=jnp.int32)
        pos_y = sy[:, None, None] + taps[None, :, None]
        rw = jnp.where(
            iy[None, None, :] == pos_y, (1.0 - fy)[:, None, None], 0.0
        ) + jnp.where(iy[None, None, :] == pos_y + 1, fy[:, None, None], 0.0)
        ix = jnp.arange(WL, dtype=jnp.int32)
        pos_x = sx[:, None, None] + taps[None, :, None]
        cw = jnp.where(
            ix[None, None, :] == pos_x, (1.0 - fx)[:, None, None], 0.0
        ) + jnp.where(ix[None, None, :] == pos_x + 1, fx[:, None, None], 0.0)
        tmp = jnp.einsum("piy,pyx->pix", rw, corr)
        return jnp.einsum("pix,pjx->pij", tmp, cw)

    def lookup_rowgather(corr, c):
        sy, sx, fy, fx = prep(c)
        ar10 = jnp.arange(10, dtype=jnp.int32)
        iy = sy[:, None] + ar10  # [M, 10]
        vy = (iy >= 0) & (iy < HL)
        v = jnp.take_along_axis(
            corr, jnp.clip(iy, 0, HL - 1)[:, :, None], axis=1
        )  # [M, 10, WL]
        v = v * vy[:, :, None]
        ty = v[:, :9] * (1 - fy)[:, None, None] + v[:, 1:] * fy[:, None, None]
        tt = jnp.swapaxes(ty, 1, 2)  # [M, WL, 9]
        ix = sx[:, None] + ar10
        vx = (ix >= 0) & (ix < WL)
        u = jnp.take_along_axis(
            tt, jnp.clip(ix, 0, WL - 1)[:, :, None], axis=1
        )  # [M, 10, 9(dy)]
        u = u * vx[:, :, None]
        tx = u[:, :9] * (1 - fx)[:, None, None] + u[:, 1:] * fx[:, None, None]
        return tx  # [M, 9(dx), 9(dy)] == quirk order

    timeit("corrlk: einsum level0", lookup_einsum, corr, coords)
    timeit("corrlk: rowgather level0", lookup_rowgather, corr, coords)

    # small-level dense VPU select (level 3: 6x10 map)
    M3, HL3, WL3 = 24 * 3600, 6, 10
    corr3 = jnp.asarray(rng.standard_normal((M3, HL3, WL3)).astype(f32))

    def lookup_dense_small(corr, c):
        cx, cy = c[:, 0] / 8.0, c[:, 1] / 8.0
        x0 = jnp.floor(cx)
        y0 = jnp.floor(cy)
        fx = cx - x0
        fy = cy - y0
        sy = y0.astype(jnp.int32) - 4
        sx = x0.astype(jnp.int32) - 4
        iy = jnp.arange(HL3, dtype=jnp.int32)
        taps10 = jnp.arange(10, dtype=jnp.int32)
        pos_y = sy[:, None, None] + taps10[None, :, None]  # [M,10,1]
        wy = (iy[None, None, :] == pos_y).astype(corr.dtype)  # [M,10,HL3]
        v = jnp.sum(wy[:, :, :, None] * corr[:, None, :, :], axis=2)
        v = v  # [M, 10, WL3]
        ty = v[:, :9] * (1 - fy)[:, None, None] + v[:, 1:] * fy[:, None, None]
        ix = jnp.arange(WL3, dtype=jnp.int32)
        pos_x = sx[:, None, None] + taps10[None, :, None]
        wx = (ix[None, None, :] == pos_x).astype(corr.dtype)  # [M,10,WL3]
        u = jnp.sum(
            wx[:, :, None, :] * ty[:, None, :, :], axis=3
        )  # [M,10(x),9(dy)]
        tx = u[:, :9] * (1 - fx)[:, None, None] + u[:, 1:] * fx[:, None, None]
        return tx

    def lookup_rowgather3(corr, c):
        cx, cy = c[:, 0] / 8.0, c[:, 1] / 8.0
        x0 = jnp.floor(cx)
        y0 = jnp.floor(cy)
        fx = cx - x0
        fy = cy - y0
        sy = y0.astype(jnp.int32) - 4
        sx = x0.astype(jnp.int32) - 4
        ar10 = jnp.arange(10, dtype=jnp.int32)
        iy = sy[:, None] + ar10
        vy = (iy >= 0) & (iy < HL3)
        v = jnp.take_along_axis(
            corr, jnp.clip(iy, 0, HL3 - 1)[:, :, None], axis=1
        )
        v = v * vy[:, :, None]
        ty = v[:, :9] * (1 - fy)[:, None, None] + v[:, 1:] * fy[:, None, None]
        tt = jnp.swapaxes(ty, 1, 2)
        ix = sx[:, None] + ar10
        vx = (ix >= 0) & (ix < WL3)
        u = jnp.take_along_axis(
            tt, jnp.clip(ix, 0, WL3 - 1)[:, :, None], axis=1
        )
        u = u * vx[:, :, None]
        return u[:, :9] * (1 - fx)[:, None, None] + u[:, 1:] * fx[:, None, None]

    timeit("corrlk: dense-select level3", lookup_dense_small, corr3, coords)
    timeit("corrlk: rowgather level3", lookup_rowgather3, corr3, coords)

    # numeric agreement check einsum vs rowgather (level0, off-TPU semantics)
    a = np.asarray(jax.jit(lookup_einsum)(corr[:2000], coords[:2000]))
    b = np.asarray(
        jnp.swapaxes(jax.jit(lookup_rowgather)(corr[:2000], coords[:2000]), 1, 2)
    )
    print("corrlk: max |einsum - rowgather| =", np.abs(a - b).max())
