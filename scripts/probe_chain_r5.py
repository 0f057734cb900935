"""RTT-free per-op timings on the real chip (round 5).

probe_r5.py's single-dispatch timings carry the axon tunnel's 27-34 ms
scalar-fetch round-trip as an additive floor, which swamps ms-scale
kernels (a 5 ms kernel reads as ~33 ms). This probe chains K
data-dependent applications of the op inside ONE jitted program, times
chains of two lengths, and reports (t_long - t_short) / (K_long -
K_short) — the RTT and dispatch overhead cancel in the difference.

Usage: SECTIONS=deform,corr,attn python scripts/probe_chain_r5.py
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
from jax import lax  # noqa: E402

sys.path.insert(0, _repo)

SECTIONS = os.environ.get("SECTIONS", "deform,corr,attn").split(",")
REPS = int(os.environ.get("REPS", "4"))
K_SHORT = int(os.environ.get("K_SHORT", "2"))
K_LONG = int(os.environ.get("K_LONG", "10"))


def _sync(x):
    return float(jnp.sum(x.ravel()[:1]))


def _time_call(fn, *args):
    _sync(fn(*args))  # warmup / compile
    best = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def chain_time(name, step, x0, *rest):
    """step: (carry, *rest) -> carry (same shape/dtype). Reports per-call
    ms from the (K_LONG - K_SHORT)-difference of two fori_loop chains."""
    def chain(k):
        def run(c0, *r):
            return lax.fori_loop(
                0, k, lambda i, c: step(c, *r), c0, unroll=False
            )
        return jax.jit(run)

    t_s = _time_call(chain(K_SHORT), x0, *rest)
    t_l = _time_call(chain(K_LONG), x0, *rest)
    per = (t_l - t_s) / (K_LONG - K_SHORT)
    print(f"{name}: {per:.2f} ms/call  (chain{K_SHORT}={t_s:.1f}, "
          f"chain{K_LONG}={t_l:.1f})")
    return per


def section_deform():
    from comfyui_propainter_nodes_tpu.models import propainter as pp
    from comfyui_propainter_nodes_tpu.ops.deform_conv import (
        deform_conv2d, deform_conv2d_xla,
    )
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

    chain_time(
        f"deform_conv2d PALLAS [{n},{h},{w},{c}] g{g} bf16",
        lambda cx, o, m, wg, b: deform_conv2d(cx, o, m, wg, b),
        x, off, mask, wgt, bias,
    )

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
    chain_time(
        f"deformable_alignment [{n},{h},{w},{c}] g{g} bf16 (r4: 14.4)",
        lambda cx, cd, fl: pp._deformable_alignment(params, pre, cx, cd, fl),
        x, cond, flow,
    )


def section_corr():
    from comfyui_propainter_nodes_tpu.models import raft as raft_mod
    from comfyui_propainter_nodes_tpu.ops.pallas.corr_lanes import (
        build_corr_pyramid_bi_lanes,
        corr_lookup_lanes,
    )

    rng = np.random.default_rng(1)
    n, h, w, c = 23, 45, 80, 256
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

    pyr_e = jax.jit(
        lambda a, b: raft_mod.build_corr_pyramid_bi(a, b, pad=False)
    )(f1, f2)

    def step_e(co, py):
        out = raft_mod.lookup_corr(py, co, padded=False)
        return co + 1e-4 * out[..., :2].astype(co.dtype)

    chain_time("corr lookup EINSUM 46img 45x80", step_e, coords, pyr_e)

    pyr_l = jax.jit(build_corr_pyramid_bi_lanes)(f1, f2)

    def step_l(co, py):
        out = corr_lookup_lanes(py, co)
        return co + 1e-4 * out[..., :2].astype(co.dtype)

    chain_time("corr lookup LANES  46img 45x80", step_l, coords, pyr_l)


def section_attn():
    from comfyui_propainter_nodes_tpu.ops import attention as att
    from comfyui_propainter_nodes_tpu.utils import weights as wz

    rng = np.random.default_rng(3)
    b, t, fh, fw, c = 5, 13, 30, 54, 512
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

    for mode in ("segmented", "halo"):
        os.environ["PROPAINTER_TPU_ATTN"] = mode

        def step(cx, m):
            out = att.sparse_window_attention(params, pre, cx, m, t_ind)
            return 0.9 * cx + 0.1 * out.astype(cx.dtype)

        try:
            chain_time(f"attention layer [{mode}]", step, x, mask)
        except Exception as e:  # halo kernel may not lower on-chip
            print(f"attention layer [{mode}]: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")
    os.environ.pop("PROPAINTER_TPU_ATTN", None)

    def step_ffn(cx):
        out = att.fusion_feed_forward(
            params, "transformers.transformer.0.mlp",
            cx.reshape(b * t, fh, fw, c), (90, 160),
        ).reshape(cx.shape)
        return 0.9 * cx + 0.1 * out.astype(cx.dtype)

    chain_time("FFN", step_ffn, x)


def main():
    print(f"backend: {jax.default_backend()} {jax.devices()}")
    if "deform" in SECTIONS:
        section_deform()
    if "corr" in SECTIONS:
        section_corr()
    if "attn" in SECTIONS:
        section_attn()


if __name__ == "__main__":
    main()
