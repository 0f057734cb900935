"""Round-3 decision probes, at exact 24f 640x360 bench shapes.

Sections (env SECTIONS=comma list, default all):
  raft   - per-iter marginal (iters 1 vs 21), fp32 vs bf16 params,
           lookup-only variants (fp32/bf16 corr), HLO op census
  deform - Pallas tent kernel vs XLA gather at featprop + flowcomp shapes
  attn   - window attention pallas/XLA/no-roll, roll cost, qkv
  imgprop- per-step anatomy of the image propagation scan

Usage: SECTIONS=raft python scripts/probe_r3b.py
"""

import os
import sys
import time

import numpy as np
import jax

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(_repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

sys.path.insert(0, _repo)

SECTIONS = os.environ.get("SECTIONS", "raft,deform,attn,imgprop").split(",")
REPS = int(os.environ.get("REPS", 5))

rng = np.random.default_rng(0)
f32 = np.float32


def timeit(name, fn, *args, reps=None):
    r = reps or REPS

    @jax.jit
    def run(*a):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(r):
            a0 = a[0] + (acc * 1e-30).astype(a[0].dtype)
            out = fn(a0, *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            acc = acc + jnp.sum(leaf.astype(jnp.float32))
        return acc

    s = float(run(*args))  # compile
    t0 = time.perf_counter()
    s = float(run(*args))
    dt = (time.perf_counter() - t0 - 0.031) / r
    print(f"{name}: {dt*1e3:.2f} ms  sum={s:.3e}", flush=True)
    return dt


if "raft" in SECTIONS:
    from comfyui_propainter_nodes_tpu.models import raft
    from comfyui_propainter_nodes_tpu.utils.weights import random_params

    prm = random_params("raft")
    prm = jax.tree.map(lambda a: jnp.asarray(a), prm)
    prm_bf = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), prm)

    frames = jnp.asarray(
        rng.standard_normal((1, 24, 360, 640, 3)).astype(f32) * 0.3
    )

    for iters in (0, 1, 6, 21):
        timeit(
            f"raft 24f allpairs fp32 iters={iters}",
            lambda fr, it=iters: raft.raft_bi_forward(prm, fr, iters=it),
            frames,
            reps=1,
        )
    for iters in (0, 1, 6, 21):
        timeit(
            f"raft 24f allpairs bf16(vol too) iters={iters}",
            lambda fr, it=iters: raft.raft_bi_forward(prm_bf, fr, iters=it),
            frames,
            reps=1,
        )

    # pyramid build (the one-time all-pairs einsum)
    fmap = jnp.asarray(
        rng.standard_normal((23, 45, 80, 256)).astype(f32) * 0.1
    )

    timeit(
        "raft pyramid build bi 23 pairs fp32",
        lambda f1: raft.build_corr_pyramid_bi(f1, f1[::-1], pad=False),
        fmap,
        reps=2,
    )

    # lookup-only at M = 2*23*3600 = 165600 (single level0 + all levels)
    M, HL, WL = 165600, 45, 80
    corr = jnp.asarray(rng.standard_normal((M, HL, WL)).astype(f32))
    corr_bf = corr.astype(jnp.bfloat16)
    coords = jnp.asarray(
        np.stack([rng.uniform(0, WL, M), rng.uniform(0, HL, M)], -1).astype(f32)
    )

    def prep(c, lvl):
        c = c / (2**lvl)
        cx, cy = c[:, 0], c[:, 1]
        x0 = jnp.floor(cx)
        y0 = jnp.floor(cy)
        return (
            y0.astype(jnp.int32) - 4,
            x0.astype(jnp.int32) - 4,
            cy - y0,
            cx - x0,
        )

    def lk_l0(corr_, coords_):
        sy, sx, fy, fx = prep(coords_, 0)
        return raft._window_lookup_einsum(
            corr_, sy, sx, fy.astype(corr_.dtype), fx.astype(corr_.dtype)
        )

    timeit("lookup einsum L0 fp32 M=165600", lambda c: lk_l0(c, coords), corr)
    timeit("lookup einsum L0 bf16 M=165600", lambda c: lk_l0(c, coords), corr_bf)

    # HLO census: does XLA keep the one-hot dots as dots?
    hlo = jax.jit(lambda c: lk_l0(c, coords)).lower(corr).compile().as_text()
    import re

    dots = len(re.findall(r"dot\(", hlo)) + len(re.findall(r" dot\b", hlo))
    gathers = hlo.count("gather(")
    fusions = hlo.count("kind=kCustom")
    print(
        f"HLO census L0 fp32: dot~{dots} gather~{gathers} customfusion~{fusions}",
        flush=True,
    )
    for line in hlo.splitlines():
        if "dot" in line and "f32" in line and "convert" not in line:
            ln = line.strip()
            if len(ln) > 180:
                ln = ln[:180]
            print("  HLO:", ln, flush=True)

    # full 4-level pyramid lookup as in the model
    pyr = [corr]
    c = corr[..., None]
    from comfyui_propainter_nodes_tpu.ops import avg_pool2d

    for _ in range(3):
        c = avg_pool2d(c, (2, 2), (2, 2))
        pyr.append(c[..., 0])
    coords4 = coords.reshape(1, 1, M, 2).reshape(M, 2)

    def full_lookup(c0, coords_):
        pyramid = [c0] + pyr[1:]
        return raft.lookup_corr(
            pyramid, coords_.reshape(46, 60, 60, 2), padded=False
        )

    timeit("lookup 4-level fp32", full_lookup, corr, coords)


if "deform" in SECTIONS:
    from comfyui_propainter_nodes_tpu.ops.deform_conv import (
        deform_conv2d_quad,
        deform_conv2d_xla,
    )
    from comfyui_propainter_nodes_tpu.ops.pallas.deform_conv import (
        deform_conv2d_pallas,
    )

    for tag, (n, h, w, cin, cout) in (
        ("featprop [5,90,160,128]", (5, 90, 160, 128, 128)),
        ("flowcomp [2,45,80,128]", (2, 45, 80, 128, 128)),
    ):
        g, k = 16, 9
        x = jnp.asarray(
            rng.standard_normal((n, h, w, cin)).astype(f32)
        ).astype(jnp.bfloat16)
        # offsets: bounded tanh residual + modest flow
        off = jnp.asarray(
            (rng.standard_normal((n, h, w, g, k, 2)) * 2.0).astype(f32)
        )
        mask = jnp.asarray(
            (rng.uniform(0, 1, (n, h, w, g, k))).astype(f32)
        )
        wgt = jnp.asarray(
            (rng.standard_normal((3, 3, cin, cout)) * 0.05).astype(f32)
        )
        timeit(
            f"deform quad {tag}",
            lambda x_: deform_conv2d_quad(x_, off, mask, wgt),
            x,
        )
        if n <= 2:  # the tent kernel vmem-OOMs at the b=5 batch
            timeit(
                f"deform pallas {tag}",
                lambda x_: deform_conv2d_pallas(x_, off, mask, wgt),
                x,
            )
        # wide flow: check band skipping degradation
        off_w = off + jnp.asarray(
            (rng.standard_normal((n, h, w, 1, 1, 2)) * 12.0).astype(f32)
        )
        timeit(
            f"deform quad wideflow {tag}",
            lambda x_: deform_conv2d_quad(x_, off_w, mask, wgt),
            x,
        )


if "attn" in SECTIONS:
    from comfyui_propainter_nodes_tpu.ops import attention as att
    from comfyui_propainter_nodes_tpu.utils.weights import random_params

    prm = random_params("inpaint_generator")
    prm = {
        k: jnp.asarray(v, jnp.bfloat16)
        for k, v in prm.items()
        if k.startswith("transformers.transformer.0.attention")
    }
    pre = "transformers.transformer.0.attention"
    B, T, FH, FW, C = 5, 13, 30, 54, 512
    x = jnp.asarray(
        rng.standard_normal((B, T, FH, FW, C)).astype(f32)
    ).astype(jnp.bfloat16)
    # realistic occupancy: a centered box mask -> ~30% of windows occupied
    mask = np.zeros((B, 11, FH, FW, 1), f32)
    mask[:, :, 10:20, 18:36] = 1.0
    mask = jnp.asarray(mask).astype(jnp.bfloat16)
    t_ind = np.arange(0, T, 2)

    timeit(
        "attn pallas t_ind box-mask",
        lambda x_: att.sparse_window_attention(prm, pre, x_, mask, t_ind),
        x,
    )
    os.environ["PROPAINTER_TPU_PALLAS"] = "0"
    import comfyui_propainter_nodes_tpu.ops.deform_conv as dc

    dc._USE_PALLAS = None
    timeit(
        "attn XLA t_ind box-mask",
        lambda x_: att.sparse_window_attention(prm, pre, x_, mask, t_ind),
        x,
    )
    dc._USE_PALLAS = None
    os.environ["PROPAINTER_TPU_PALLAS"] = "1"

    # cost anatomy
    from comfyui_propainter_nodes_tpu.ops.conv import linear

    timeit("attn qkv+proj only", lambda x_: linear(prm, pre + ".query", x_), x)

    def rolls(x_):
        k = linear(prm, pre + ".key", x_)
        eh, ew = 3, 5
        outs = []
        for s in ((-eh, -ew), (-eh, ew), (eh, -ew), (eh, ew)):
            outs.append(
                att._window_partition(
                    jnp.roll(k, s, axis=(2, 3)), (5, 9), 4
                )
            )
        return jnp.concatenate(outs, axis=4)

    timeit("attn k + 4 rolls + partition", rolls, x)


if "imgprop" in SECTIONS:
    from comfyui_propainter_nodes_tpu.models import propainter as pp
    from comfyui_propainter_nodes_tpu.ops import flow_warp, binarize

    T, H, W = 24, 360, 640
    x = jnp.asarray(
        rng.standard_normal((1, T, H, W, 3)).astype(f32)
    ).astype(jnp.bfloat16)
    m = jnp.asarray(
        (rng.uniform(0, 1, (1, T, H, W, 1)) < 0.1).astype(f32)
    ).astype(jnp.bfloat16)
    ff = jnp.asarray(
        (rng.standard_normal((1, T - 1, H, W, 2)) * 3).astype(f32)
    ).astype(jnp.bfloat16)
    fb = -ff

    timeit(
        "imgprop full 24f nearest",
        lambda x_: pp.bidirectional_propagation_image(x_, ff, fb, m, "nearest"),
        x,
    )

    # per-step anatomy: scan of ONLY the fused warp, vs scan of full step
    xs = jnp.moveaxis(x, 1, 0)
    ffs = jnp.moveaxis(ff, 1, 0)

    def scan_warp_only(xs_):
        def step(carry, inp):
            feat, flow = inp
            w3 = flow_warp(
                jnp.concatenate([flow, carry[..., :1], carry], axis=-1), flow
            )
            return w3[..., 3:], None

        out, _ = jax.lax.scan(step, xs_[0], (xs_[:-1], ffs))
        return out

    timeit("imgprop scan warp-only 23 steps", scan_warp_only, xs)

    def scan_nearest_sep(xs_):
        def step(carry, inp):
            feat, flow = inp
            w3 = flow_warp(
                jnp.concatenate([flow, carry[..., :1]], axis=-1), flow
            )
            fw = flow_warp(carry, flow, "nearest")
            return fw + 0 * w3[..., :3], None

        out, _ = jax.lax.scan(step, xs_[0], (xs_[:-1], ffs))
        return out

    timeit("imgprop scan 2-warps(nearest) 23 steps", scan_nearest_sep, xs)


if "layout" in SECTIONS:
    # imgprop hypothesis: per-step mask algebra at [1,360,640,C<=3]
    # (C minor -> 3/128 lanes) is what makes a 2-warp step cost ~2.8ms.
    from comfyui_propainter_nodes_tpu.models import propainter as pp

    h, w = 360, 640
    fr = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(f32))
    fl = jnp.asarray(rng.standard_normal((1, h, w, 2)).astype(f32))
    mk = jnp.asarray((rng.uniform(0, 1, (1, h, w, 1)) > 0.7).astype(f32))

    def algebra_c3(fr, fl, mk):
        diff = fl + fr[..., :2]
        mag = jnp.sum(fl**2, -1, keepdims=True) + jnp.sum(
            fr[..., :2] ** 2, -1, keepdims=True
        )
        valid = (jnp.sum(diff**2, -1, keepdims=True) < 0.01 * mag + 0.5).astype(f32)
        union = jnp.minimum(mk * valid, 1.0)
        out = union * fr + (1 - union) * fr * 0.5
        return out

    timeit("imgprop algebra [1,360,640,3]", algebra_c3, fr, fl, mk, reps=20)

    fr2 = fr.reshape(1, h, w * 3)

    def algebra_packed(fr2):
        out = fr2 * 0.25 + jnp.minimum(fr2, 1.0) * 0.5
        out = jnp.where(out > 0.1, out, 0.3 * out)
        return out

    timeit("packed elementwise x3 [1,360,1920]", algebra_packed, fr2, reps=20)

    # full imgprop scan step count reference
    t = 24
    xs = jnp.asarray(rng.standard_normal((1, t, h, w, 3)).astype(f32) * 0.3)
    ffs = jnp.asarray(rng.standard_normal((1, t - 1, h, w, 2)).astype(f32))
    mks = jnp.asarray((rng.uniform(0, 1, (1, t, h, w, 1)) > 0.8).astype(f32))
    timeit(
        "imgprop full 24f nearest",
        lambda a, b, c: pp.bidirectional_propagation_image(a, b, b, c, "nearest"),
        xs, ffs, mks,
        reps=2,
    )


if "raftsplit" in SECTIONS:
    # bisect the per-iter cost: full step vs no-lookup vs lookup-only,
    # inside a real lax.scan at 24f shapes
    from comfyui_propainter_nodes_tpu.models import raft
    from comfyui_propainter_nodes_tpu.utils.weights import random_params
    from comfyui_propainter_nodes_tpu.ops import coords_grid

    prm = jax.tree.map(lambda a: jnp.asarray(a), random_params("raft"))
    frames = jnp.asarray(
        rng.standard_normal((1, 24, 360, 640, 3)).astype(f32) * 0.3
    )

    b, t = 1, 24
    n = b * (t - 1)
    h8, w8 = 45, 80
    fmaps = jnp.asarray(rng.standard_normal((2 * n, h8, w8, 256)).astype(f32) * 0.1)
    f1, f2 = fmaps[:n], fmaps[n:]
    pyramid = raft.build_corr_pyramid_bi(f1, f2, pad=False)
    cnet = jnp.asarray(rng.standard_normal((2 * n, h8, w8, 256)).astype(f32))
    net0 = jnp.tanh(cnet[..., :128])
    inp = jax.nn.relu(cnet[..., 128:])
    coords0 = coords_grid(2 * n, h8, w8)

    def scan_with(body, iters=6):
        def run(net0):
            def step(carry, _):
                return body(carry), None
            (net, coords1), _ = jax.lax.scan(
                step, (net0, coords0), None, length=iters
            )
            return net, coords1
        return run

    def full_body(carry):
        net, coords1 = carry
        corr = raft.lookup_corr(pyramid, coords1, padded=False)
        flow = coords1 - coords0
        net, delta = raft._update_block(prm, net, inp, corr, flow)
        return (net, coords1 + delta)

    CORR_CH = 4 * 81

    def nolookup_body(carry):
        net, coords1 = carry
        corr = jnp.broadcast_to(
            (jnp.mean(coords1) * 1e-6)[None, None, None, None],
            coords1.shape[:3] + (CORR_CH,),
        ).astype(jnp.float32)
        flow = coords1 - coords0
        net, delta = raft._update_block(prm, net, inp, corr, flow)
        return (net, coords1 + delta)

    def lookuponly_body(carry):
        net, coords1 = carry
        corr = raft.lookup_corr(pyramid, coords1, padded=False)
        delta = jnp.tanh(corr[..., :2]) * 0.1
        return (net, coords1 + delta)

    for name, body in (
        ("full", full_body),
        ("no-lookup", nolookup_body),
        ("lookup-only", lookuponly_body),
    ):
        timeit(
            f"raftsplit {name} 6 iters",
            lambda n0, b_=body: scan_with(b_, 6)(n0),
            net0,
            reps=1,
        )
        timeit(
            f"raftsplit {name} 18 iters",
            lambda n0, b_=body: scan_with(b_, 18)(n0),
            net0,
            reps=1,
        )
