"""Round-5 kernel/stage timings on the real chip.

Measures the two device-time mountains VERDICT r4 targeted, before/after
forms where both still exist:

  deform - deformable_alignment full module + raw deform_conv2d kernel
           at the feature-prop shape [N, 90, 160, 128] g16 (target:
           alignment <= 7 ms; r4 measured 14.4 ms)
  corr   - one RAFT iteration's 4-level lookup: einsum vs lanes kernel
           at bench scale (46 images, 45x80 level-0; r4 einsum measured
           ~8.7 ms level-0 alone)
  stages - the four fused-node stage times + full process_node wall
           (r4: flow 560, complete 180-201, imgprop 159, feature
           976-1013, total 1728-1852 ms device)

Timing forces execution with a 4-byte scalar fetch per output
(block_until_ready does not block through the axon tunnel).
Usage: SECTIONS=deform,corr python scripts/probe_r5.py
"""

import os
import sys
import time

import numpy as np
import jax

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(_repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, _repo)

SECTIONS = os.environ.get("SECTIONS", "deform,corr").split(",")
REPS = int(os.environ.get("REPS", "5"))


def sync(*outs):
    s = 0.0
    for o in outs:
        s += float(jnp.sum(o.ravel()[:1]))
    return s


def timeit(fn, *args, reps=REPS):
    sync(*jax.tree.leaves(fn(*args)))  # warmup/compile
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(*jax.tree.leaves(out))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3  # ms


def section_deform():
    from comfyui_propainter_nodes_tpu.models import propainter as pp
    from comfyui_propainter_nodes_tpu.ops.deform_conv import deform_conv2d
    from comfyui_propainter_nodes_tpu.utils import weights as wz

    rng = np.random.default_rng(0)
    n, h, w, c, g = 2, 90, 160, 128, 16
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((n, h, w, c)).astype(np.float32), dt)
    off = jnp.asarray(
        (rng.standard_normal((n, h, w, g, 9, 2)) * 3).astype(np.float32), dt
    )
    mask = jnp.asarray(
        rng.uniform(0, 1, (n, h, w, g, 9)).astype(np.float32), dt
    )
    wgt = jnp.asarray(
        (rng.standard_normal((3, 3, c, c)) * 0.05).astype(np.float32), dt
    )
    bias = jnp.zeros((c,), dt)

    ms = timeit(jax.jit(deform_conv2d), x, off, mask, wgt, bias)
    print(f"deform_conv2d kernel [{n},{h},{w},{c}] g{g} bf16: {ms:.2f} ms")

    # full deformable_alignment (offset conv + kernel), propainter site
    params = {
        k: jnp.asarray(v, dt)
        for k, v in wz.get_params("inpaint_generator", allow_random=True).items()
    }
    pre = "feat_prop_module.deform_align.backward_1"
    cond = jnp.asarray(
        rng.standard_normal((n, h, w, 2 * c + 5)).astype(np.float32), dt
    )
    flow = jnp.asarray(
        (rng.standard_normal((n, h, w, 2)) * 3).astype(np.float32), dt
    )

    def align(p, x_, cond_, flow_):
        return pp._deformable_alignment(p, pre, x_, cond_, flow_)

    ms = timeit(jax.jit(align), params, x, cond, flow)
    print(f"deformable_alignment [{n},{h},{w},{c}] g{g} bf16: {ms:.2f} ms "
          f"(r4: 14.4 ms, target <= 7)")


def section_corr():
    from comfyui_propainter_nodes_tpu.models import raft as raft_mod
    from comfyui_propainter_nodes_tpu.ops.pallas.corr_lanes import (
        build_corr_pyramid_bi_lanes,
        corr_lookup_lanes,
    )

    rng = np.random.default_rng(1)
    n, h, w, c = 23, 45, 80, 256  # 24-frame clip: 23 pairs, 46 lookups
    dt = jnp.bfloat16
    f1 = jnp.asarray(
        (rng.standard_normal((n, h, w, c)) * 0.3).astype(np.float32), dt
    )
    f2 = jnp.asarray(
        (rng.standard_normal((n, h, w, c)) * 0.3).astype(np.float32), dt
    )
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([xx, yy], -1)[None]
    coords = jnp.asarray(
        np.broadcast_to(base, (2 * n, h, w, 2))
        + rng.standard_normal((2 * n, h, w, 2)).astype(np.float32) * 2.0
    )

    os.environ["PROPAINTER_TPU_CORR_KERNEL"] = "einsum"
    pyr_e = jax.jit(
        lambda a, b: raft_mod.build_corr_pyramid_bi(a, b, pad=False)
    )(f1, f2)
    ms = timeit(
        jax.jit(lambda py, co: raft_mod.lookup_corr(py, co, padded=False)),
        pyr_e, coords,
    )
    print(f"corr lookup einsum 46img 45x80 (per iter): {ms:.2f} ms")

    pyr_l = jax.jit(build_corr_pyramid_bi_lanes)(f1, f2)
    ms = timeit(jax.jit(corr_lookup_lanes), pyr_l, coords)
    print(f"corr lookup LANES  46img 45x80 (per iter): {ms:.2f} ms")

    ms = timeit(
        jax.jit(lambda a, b: raft_mod.build_corr_pyramid_bi(a, b, pad=False)),
        f1, f2,
    )
    print(f"pyramid build (einsum layout): {ms:.2f} ms")
    ms = timeit(jax.jit(build_corr_pyramid_bi_lanes), f1, f2)
    print(f"pyramid build (lanes layout):  {ms:.2f} ms")
    os.environ.pop("PROPAINTER_TPU_CORR_KERNEL", None)


def section_raft():
    """Whole compute_flow-equivalent: raft_bi_forward at bench shapes."""
    from comfyui_propainter_nodes_tpu.models import raft as raft_mod
    from comfyui_propainter_nodes_tpu.utils import weights as wz

    rng = np.random.default_rng(2)
    frames = jnp.asarray(
        rng.uniform(-1, 1, (1, 12, 360, 640, 3)).astype(np.float32)
    )
    params = {
        k: jnp.asarray(v).astype(jnp.bfloat16)
        for k, v in wz.get_params("raft", allow_random=True).items()
    }
    for mode in ("einsum", "lanes"):
        os.environ["PROPAINTER_TPU_CORR_KERNEL"] = mode
        ms = timeit(
            jax.jit(lambda p, f: raft_mod.raft_bi_forward(p, f, iters=20)),
            params, frames,
        )
        print(f"raft_bi 12f 640x360 20it bf16 [{mode}]: {ms:.2f} ms")
    os.environ.pop("PROPAINTER_TPU_CORR_KERNEL", None)


def section_attn():
    """Attribute the ~19 ms attention layer: full layer vs kernel-only
    vs the shared data-movement pieces (NOTES_ROUND4 §8)."""
    from comfyui_propainter_nodes_tpu.ops import attention as att
    from comfyui_propainter_nodes_tpu.utils import weights as wz

    rng = np.random.default_rng(3)
    b, t, fh, fw, c = 5, 13, 30, 54, 512  # bench token shapes
    l_t = 9
    dt = jnp.bfloat16
    params = {
        k: jnp.asarray(v, dt)
        for k, v in wz.get_params("inpaint_generator", allow_random=True).items()
        if k.startswith("transformers.")
    }
    pre = "transformers.transformer.0.attention"
    x = jnp.asarray(
        (rng.standard_normal((b, t, fh, fw, c)) * 0.1).astype(np.float32), dt
    )
    mask = jnp.zeros((b, l_t, fh, fw, 1), dt).at[:, :, 8:14, 10:24].set(1.0)
    t_ind = np.arange(0, t, 2)

    for mode in ("segmented", "halo", "xla"):
        if mode == "xla":
            os.environ["PROPAINTER_TPU_PALLAS_SAVE"] = "x"  # marker only
        os.environ["PROPAINTER_TPU_ATTN"] = mode
        from comfyui_propainter_nodes_tpu.ops import deform_conv as _dc

        prev = _dc._USE_PALLAS
        if mode == "xla":
            _dc._USE_PALLAS = False
        try:
            full = jax.jit(
                lambda p, x_, m_: att.sparse_window_attention(
                    p, pre, x_, m_, t_ind
                )
            )
            ms = timeit(full, params, x, mask)
            print(
                f"attention layer FULL [{b},{t},{fh}x{fw},{c}] "
                f"[{mode}]: {ms:.2f} ms"
            )
        finally:
            _dc._USE_PALLAS = prev
    os.environ.pop("PROPAINTER_TPU_ATTN", None)

    q = att.linear(params, pre + ".query", x)
    k = att.linear(params, pre + ".key", x)
    ms = timeit(
        jax.jit(lambda a: att._window_partition(a, (5, 9), 4)), q
    )
    print(f"  window partition (x1 tensor): {ms:.2f} ms")

    def rolled_only(a):
        wh, ww = 5, 9
        eh, ew = 3, 5
        idx = jnp.asarray(att._valid_rolled_indices((wh, ww)))
        ap = jnp.concatenate([a[:, :, -eh:], a, a[:, :, :eh]], axis=2)
        ap = jnp.concatenate([ap[:, :, :, -ew:], ap, ap[:, :, :, :ew]], axis=3)
        parts = []
        for s_y, s_x in [(-eh, -ew), (-eh, ew), (eh, -ew), (eh, ew)]:
            oy, ox = eh - s_y, ew - s_x
            sl = jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(ap, oy, oy + fh, axis=2),
                ox, ox + fw, axis=3,
            )
            parts.append(att._window_partition(sl, (wh, ww), 4))
        return jnp.concatenate(parts, axis=4)[:, :, :, :, idx]

    ms = timeit(jax.jit(lambda a: rolled_only(a[:, ::2])), k)
    print(f"  rolled build (padded-slice form, t_ind frames, x1): {ms:.2f} ms")

    ms = timeit(
        jax.jit(
            lambda p, x_: att.fusion_feed_forward(
                p, "transformers.transformer.0.mlp",
                x_.reshape(b * t, fh, fw, c), (90, 160),
            )
        ),
        params, x,
    )
    print(f"  FFN [{b*t},{fh},{fw},{c}]: {ms:.2f} ms")


def main():
    print(f"backend: {jax.default_backend()} {jax.devices()}")
    if "deform" in SECTIONS:
        section_deform()
    if "corr" in SECTIONS:
        section_corr()
    if "raft" in SECTIONS:
        section_raft()
    if "attn" in SECTIONS:
        section_attn()


if __name__ == "__main__":
    main()
