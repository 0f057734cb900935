"""Device-time microbenches of the hot ops at 640x360 pipeline shapes.

Each op is scanned REPS times inside one jit so tunnel dispatch doesn't
pollute the numbers (see bench_corr_lookup.py).
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("REPS", 10))


def timeit(name, fn, *args):
    @jax.jit
    def run(*a):
        # unrolled dependency chain (scan-wrapped pallas calls crash the
        # remote compile helper); each call depends on the previous sum so
        # nothing is CSE'd or hoisted
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
    print(f"{name}: {dt*1e3:.2f} ms  sum={s:.3e}")


def timeit_single(name, fn, *args):
    """Per-dispatch timing (for ops whose unrolled chain crashes the
    remote compile helper): sync via a scalar fetch each call and
    subtract the measured dispatch+fetch overhead."""
    jfn = jax.jit(fn)
    out = jfn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))  # compile+settle

    # overhead probe: trivial op, same dispatch+fetch pattern
    tiny = jax.jit(lambda v: v + 1.0)
    tv = jnp.zeros((8, 128))
    float(jnp.sum(tiny(tv)))
    t0 = time.perf_counter()
    for _ in range(REPS):
        float(jnp.sum(tiny(tv)))
    overhead = (time.perf_counter() - t0) / REPS

    t0 = time.perf_counter()
    for _ in range(REPS):
        s = float(jnp.sum(jax.tree_util.tree_leaves(jfn(*args))[0]))
    dt = (time.perf_counter() - t0) / REPS - overhead
    print(f"{name}: {dt*1e3:.2f} ms (single-dispatch, -{overhead*1e3:.0f}ms ovh)  sum={s:.3e}")


rng = np.random.default_rng(0)
f32 = np.float32

# ---- deform conv at feature-prop shape: [G=4, 90, 160, 128], 16 groups
from comfyui_propainter_nodes_tpu.ops.deform_conv import deform_conv2d

n, h, w, cin, cout, g = 4, 90, 160, 128, 128, 16
x = jnp.asarray(rng.standard_normal((n, h, w, cin)).astype(f32))
off = jnp.asarray((rng.standard_normal((n, h, w, g, 9, 2)) * 3).astype(f32))
msk = jnp.asarray(rng.uniform(0, 1, (n, h, w, g, 9)).astype(f32))
wgt = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(f32) * 0.05)
bias = jnp.asarray(rng.standard_normal((cout,)).astype(f32))
# NOTE: fp32 x at this shape exceeds the 16MB scoped-VMEM limit (the x
# block alone is 7.4MB double-buffered); production runs bf16 (fp16=enable)
xb = x.astype(jnp.bfloat16)
timeit_single("deform_conv bf16 [4,90,160,128] g16", deform_conv2d, xb, off, msk, wgt, bias)

# ---- flow_warp at image-prop shape: [1, 360, 640, 6]
from comfyui_propainter_nodes_tpu.ops.warp import flow_warp

img = jnp.asarray(rng.standard_normal((1, 360, 640, 6)).astype(f32))
flow = jnp.asarray((rng.standard_normal((1, 360, 640, 2)) * 8).astype(f32))
timeit("flow_warp [1,360,640,6]", flow_warp, img, flow)

img128 = jnp.asarray(rng.standard_normal((4, 90, 160, 130)).astype(f32))
flow128 = jnp.asarray((rng.standard_normal((4, 90, 160, 2)) * 4).astype(f32))
timeit("flow_warp [4,90,160,130]", flow_warp, img128, flow128)

# ---- one transformer block at window shape: [4, 15, 90, 160] tokens
from comfyui_propainter_nodes_tpu.ops.attention import transformer_stack
from comfyui_propainter_nodes_tpu.utils.weights import random_params

full = random_params("inpaint_generator")
tp = {k: jnp.asarray(v) for k, v in full.items() if k.startswith("transformers.")}
b, t, fh, fw, c = 4, 15, 30, 54, 512
tokens = jnp.asarray(rng.standard_normal((b, t, fh, fw, c)).astype(f32) * 0.05)
mask = jnp.zeros((b, 11, fh, fw, 1)).at[:, :, 8:20, 10:30].set(1.0)
fold = (90, 160)
timeit(
    "transformer_stack x8 [4,15,30x54]",
    lambda tok: transformer_stack(tp, "transformers", tok, fold, mask),
    tokens,
)

# ---- encoder at window shape: [60, 360, 640, 5]
from comfyui_propainter_nodes_tpu.models.propainter import encoder

ep = {k: jnp.asarray(v) for k, v in full.items() if k.startswith("encoder.")}
xenc = jnp.asarray(rng.standard_normal((60, 360, 640, 5)).astype(f32) * 0.1)
timeit("encoder [60,360,640,5]", lambda v: encoder(ep, v), xenc)

# ---- soft split/comp at [60, 90, 160, 128]
from comfyui_propainter_nodes_tpu.ops.attention import soft_split, soft_comp

sp = {k: jnp.asarray(v) for k, v in full.items() if k.startswith(("ss.", "sc."))}
feat = jnp.asarray(rng.standard_normal((60, 90, 160, 128)).astype(f32) * 0.1)
timeit("soft_split [60,90,160,128]", lambda v: soft_split(sp, "ss", v), feat)
tok2 = jnp.asarray(rng.standard_normal((60, 30, 54, 512)).astype(f32) * 0.1)
timeit("soft_comp [60,30,54,512]", lambda v: soft_comp(sp, "sc", v, (90, 160)), tok2)
