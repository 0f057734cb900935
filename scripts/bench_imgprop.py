"""Microbench: image-propagation sub-blocks at full res on the TPU.

The stage runs 2*T sequential scan steps at [1, 360, 640]; this measures
one step's pieces and the whole chunk program to find where the ~18 ms/
step goes.  Usage: python scripts/bench_imgprop.py
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

from comfyui_propainter_nodes_tpu.models import propainter as pp
from comfyui_propainter_nodes_tpu.ops import flow_warp, binarize

REPS = int(os.environ.get("REPS", 5))
rng = np.random.default_rng(0)
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


H, W = 360, 640
x = jnp.asarray(rng.uniform(-1, 1, (1, H, W, 3)).astype(np.float32), bf16)
m = jnp.asarray((rng.uniform(size=(1, H, W, 1)) > 0.8).astype(np.float32), bf16)
fl = jnp.asarray((rng.standard_normal((1, H, W, 2)) * 3).astype(np.float32), bf16)

timeit("warp bilinear 3ch", lambda v: flow_warp(v, fl), x)
timeit("warp nearest 3ch", lambda v: flow_warp(v, fl, "nearest"), x)
timeit(
    "warp bilinear 3ch (fl+m fused)",
    lambda v: flow_warp(jnp.concatenate([fl, m], -1), fl + v[..., :2] * 0),
    x,
)

# one full image-prop step (nearest branch, as the pipeline runs it)
def one_step(feat_prop):
    mask_prop = m
    warped3 = flow_warp(jnp.concatenate([fl, mask_prop], axis=-1), fl)
    feat_warped = flow_warp(feat_prop, fl, "nearest")
    flow_bw_warped = warped3[..., :2]
    mask_prop_valid = binarize(warped3[..., 2:])
    diff = fl + flow_bw_warped
    mag = jnp.sum(fl**2, -1, keepdims=True) + jnp.sum(
        flow_bw_warped**2, -1, keepdims=True
    )
    valid = (jnp.sum(diff**2, -1, keepdims=True) < 0.01 * mag + 0.5).astype(bf16)
    union = binarize(m * valid * (1 - mask_prop_valid))
    feat_prop = union * feat_warped + (1 - union) * x
    return feat_prop


timeit("one image-prop step", one_step, x)

# the whole stage-3 chunk program at bench shape
T = 24
fr = jnp.asarray(rng.uniform(-1, 1, (1, T, H, W, 3)).astype(np.float32), bf16)
mk = jnp.asarray((rng.uniform(size=(1, T, H, W, 1)) > 0.8).astype(np.float32), bf16)
ff = jnp.asarray((rng.standard_normal((1, T - 1, H, W, 2)) * 3).astype(np.float32), bf16)

def stage3(fr_):
    masked = fr_ * (1 - mk)
    prop, upd = pp.bidirectional_propagation_image(masked, ff, ff, mk, "nearest")
    return fr_ * (1 - mk) + prop * mk, upd

t0 = time.perf_counter()
o = stage3(fr)
s = float(jnp.sum(o[0].astype(jnp.float32)))
print(f"stage3 compile+run {time.perf_counter()-t0:.1f}s", flush=True)
sj = jax.jit(stage3)
o = sj(fr)
s = float(jnp.sum(o[0].astype(jnp.float32)))
t0 = time.perf_counter()
o = sj(fr)
s = float(jnp.sum(o[0].astype(jnp.float32)))
print(f"stage3 whole chunk [1,{T},{H},{W}]: {(time.perf_counter()-t0)*1e3:.0f} ms sum={s:.3e}", flush=True)
