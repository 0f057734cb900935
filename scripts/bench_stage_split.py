"""Decompose the two dominant bench stages into sub-block device times.

Stage-4 window predict (group of 4 windows, 24f 640x360 defaults) and
RAFT (23 frame pairs, 20 iters) at the exact bench shapes. Each block is
scanned REPS times inside one jit (see bench_components.py) so tunnel
dispatch does not pollute the numbers.

Usage: python scripts/bench_stage_split.py [stage4|raft|all]
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

REPS = int(os.environ.get("REPS", 5))
which = sys.argv[1] if len(sys.argv) > 1 else "all"

rng = np.random.default_rng(0)
f32 = np.float32
bf16 = jnp.bfloat16


def timeit(name, fn, *args):
    @jax.jit
    def run(*a):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(REPS):
            a0 = a[0] + (acc * 1e-30).astype(a[0].dtype)
            out = fn(a0, *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            acc = acc + jnp.sum(leaf.astype(jnp.float32))
        return acc

    s = float(run(*args))  # compile
    t0 = time.perf_counter()
    s = float(run(*args))
    dt = (time.perf_counter() - t0 - 0.031) / REPS
    print(f"{name}: {dt*1e3:.2f} ms  sum={s:.3e}", flush=True)


if which in ("stage4", "all"):
    from comfyui_propainter_nodes_tpu.utils.weights import random_params
    from comfyui_propainter_nodes_tpu.models import propainter as pp
    from comfyui_propainter_nodes_tpu.ops.attention import (
        soft_comp,
        soft_split,
        transformer_stack,
        sparse_window_attention,
        fusion_feed_forward,
    )

    G, T, LT, H, W = 4, 13, 11, 360, 640
    h, w = H // 4, W // 4
    prm = {k: jnp.asarray(v, bf16) for k, v in random_params("inpaint_generator").items()}

    # encoder
    xenc = jnp.asarray(rng.standard_normal((G * T, H, W, 5)).astype(f32) * 0.3, bf16)
    timeit(f"encoder [{G*T},{H},{W},5]", lambda v: pp.encoder(prm, v), xenc)

    # feature propagation (bidirectional deform-aligned scan over LT)
    feat = jnp.asarray(rng.standard_normal((G, LT, h, w, 128)).astype(f32) * 0.3, bf16)
    flows = jnp.asarray((rng.standard_normal((G, LT - 1, h, w, 2)) * 3).astype(f32), bf16)
    pmask = jnp.asarray(
        (rng.uniform(size=(G, LT, h, w, 2)) > 0.7).astype(f32), bf16
    )
    timeit(
        f"feat_prop bidir [{G},{LT},{h},{w},128]",
        lambda v: pp.bidirectional_propagation_feature(prm, v, flows, flows, pmask),
        feat,
    )

    # soft split
    ef = jnp.asarray(rng.standard_normal((G * T, h, w, 128)).astype(f32) * 0.3, bf16)
    timeit(f"soft_split [{G*T},{h},{w},128]", lambda v: soft_split(prm, "ss", v), ef)

    fh, fw = (h + 6 - 7) // 3 + 1, (w + 6 - 7) // 3 + 1
    tokens = jnp.asarray(
        rng.standard_normal((G, T, fh, fw, 512)).astype(f32) * 0.05, bf16
    )
    amask = jnp.zeros((G, LT, fh, fw, 1), bf16).at[:, :, 8:20, 10:30].set(1.0)

    # one attention call (no t_ind)
    timeit(
        f"window_attn x1 [{G},{T},{fh}x{fw}]",
        lambda tok: sparse_window_attention(
            prm, "transformers.transformer.0.attention", tok, amask, None
        ),
        tokens,
    )
    # one FFN call
    timeit(
        f"ffn x1 [{G*T},{fh}x{fw}]",
        lambda tok: fusion_feed_forward(
            prm, "transformers.transformer.0.mlp",
            tok.reshape(G * T, fh, fw, 512), (h, w),
        ),
        tokens,
    )
    # full 8-block stack
    timeit(
        f"transformer_stack x8 [{G},{T},{fh}x{fw}]",
        lambda tok: transformer_stack(prm, "transformers", tok, (h, w), amask),
        tokens,
    )

    # soft comp + decoder
    tok2 = jnp.asarray(rng.standard_normal((G * T, fh, fw, 512)).astype(f32) * 0.05, bf16)
    timeit(f"soft_comp [{G*T},{fh}x{fw}]", lambda v: soft_comp(prm, "sc", v, (h, w)), tok2)
    loc = jnp.asarray(rng.standard_normal((G * LT, h, w, 128)).astype(f32) * 0.3, bf16)
    timeit(f"decoder [{G*LT},{h},{w},128]", lambda v: pp.decoder(prm, v), loc)

if which in ("featprop",):
    # sub-blocks of one _prop_direction_feature step at bench shape
    from comfyui_propainter_nodes_tpu.utils.weights import random_params
    from comfyui_propainter_nodes_tpu.models import propainter as pp
    from comfyui_propainter_nodes_tpu.ops import deform_conv2d, flow_warp
    from comfyui_propainter_nodes_tpu.ops.conv import pconv2d, leaky_relu

    G, h, w = 4, 90, 160
    prm = {k: jnp.asarray(v, bf16) for k, v in random_params("inpaint_generator").items()}
    feat = jnp.asarray(rng.standard_normal((G, h, w, 128)).astype(f32) * 0.3, bf16)
    flow = jnp.asarray((rng.standard_normal((G, h, w, 2)) * 3).astype(f32), bf16)
    cond = jnp.asarray(rng.standard_normal((G, h, w, 261)).astype(f32) * 0.3, bf16)
    da = "feat_prop_module.deform_align.backward_1"
    bb = "feat_prop_module.backbone.backward_1"

    timeit(
        f"flow_warp 130ch [{G},{h},{w}]",
        lambda v: flow_warp(jnp.concatenate([flow, v], axis=-1), flow),
        feat,
    )

    def offsets(c_):
        o = leaky_relu(pconv2d(prm, da + ".conv_offset.0", c_, padding=(1, 1)), 0.1)
        o = leaky_relu(pconv2d(prm, da + ".conv_offset.2", o, padding=(1, 1)), 0.1)
        o = leaky_relu(pconv2d(prm, da + ".conv_offset.4", o, padding=(1, 1)), 0.1)
        return pconv2d(prm, da + ".conv_offset.6", o, padding=(1, 1))

    timeit(f"offset convs x4 [{G},{h},{w},261]", offsets, cond)

    o = offsets(cond)
    g9 = 16 * 9
    off = ((3.0 * jnp.tanh(jnp.concatenate([o[..., :g9], o[..., g9:2*g9]], -1))
            ).reshape(G, h, w, 16, 9, 2) + 1.0).astype(bf16)
    msk = jax.nn.sigmoid(o[..., 2*g9:]).reshape(G, h, w, 16, 9).astype(bf16)
    timeit(
        f"deform_conv2d [{G},{h},{w},128]",
        lambda v: deform_conv2d(v, off, msk, prm[da + ".weight"], prm[da + ".bias"]),
        feat,
    )

    def backbone(v):
        y = leaky_relu(pconv2d(prm, bb + ".0", v, padding=(1, 1)), 0.2)
        return pconv2d(prm, bb + ".2", y, padding=(1, 1))

    cond2 = jnp.asarray(rng.standard_normal((G, h, w, 258)).astype(f32) * 0.3, bf16)
    timeit(f"backbone convs x2 [{G},{h},{w},258]", backbone, cond2)

    da_full = lambda v: pp._deformable_alignment(prm, da, v, cond, flow)
    timeit(f"deformable_alignment full [{G},{h},{w}]", da_full, feat)

if which in ("raft", "all"):
    from comfyui_propainter_nodes_tpu.utils.weights import random_params
    from comfyui_propainter_nodes_tpu.models import raft as rf

    prm = {k: jnp.asarray(v) for k, v in random_params("raft").items()}
    N, H, W = 23, 360, 640
    h8, w8 = H // 8, W // 8
    im = jnp.asarray(rng.uniform(-1, 1, (2 * N, H, W, 3)).astype(f32))

    timeit(
        f"raft encoders fnet+cnet [{2*N}+{N}]",
        lambda v: (
            rf.basic_encoder(prm, "fnet", v, "instance"),
            rf.basic_encoder(prm, "cnet", v[:N], "batch"),
        ),
        im,
    )

    fmap = jnp.asarray(rng.standard_normal((2 * N, h8, w8, 256)).astype(f32) * 0.3)
    timeit(
        f"corr pyramid build [{N},{h8}x{w8}]",
        lambda v: rf.build_corr_pyramid(v[:N], v[N:]),
        fmap,
    )

    pyr = rf.build_corr_pyramid(fmap[:N], fmap[N:])
    coords = rf.coords_grid(N, h8, w8) + jnp.asarray(
        (rng.standard_normal((N, h8, w8, 2)) * 2).astype(f32)
    )
    # pyramid goes through *args (a closure would capture 3.4 GB of
    # constants into the lowered program and wedge the tunnel)
    timeit(
        f"corr lookup x1 [{N},{h8}x{w8}]",
        lambda c, *pyr_: rf.lookup_corr(list(pyr_), c),
        coords,
        *pyr,
    )

    net = jnp.asarray(rng.standard_normal((N, h8, w8, 128)).astype(f32) * 0.3)
    inp = jnp.asarray(rng.standard_normal((N, h8, w8, 128)).astype(f32) * 0.3)
    corr = jnp.asarray(rng.standard_normal((N, h8, w8, 324)).astype(f32) * 0.3)
    flow = jnp.asarray((rng.standard_normal((N, h8, w8, 2)) * 2).astype(f32))
    timeit(
        f"update block x1 [{N},{h8}x{w8}]",
        lambda n_, i_, c_, f_: rf._update_block(prm, n_, i_, c_, f_)[0],
        net,
        inp,
        corr,
        flow,
    )

    # whole bidirectional forward for reference (one jit, axon-safe sync
    # via a scalar fetch — block_until_ready doesn't block under axon)
    frames = jnp.asarray(rng.uniform(-1, 1, (1, N + 1, H, W, 3)).astype(f32))
    bi = jax.jit(lambda p, fr: rf.raft_bi_forward(p, fr, iters=20))
    t0 = time.perf_counter()
    ff, fb = bi(prm, frames)
    s = float(jnp.sum(ff) + jnp.sum(fb))
    print(f"raft_bi compile+run: {time.perf_counter()-t0:.1f}s sum={s:.3e}", flush=True)
    t0 = time.perf_counter()
    ff, fb = bi(prm, frames)
    s = float(jnp.sum(ff) + jnp.sum(fb))
    print(
        f"raft_bi 20it both dirs [{N} pairs]: "
        f"{(time.perf_counter()-t0)*1e3:.0f} ms",
        flush=True,
    )
