"""Bisect the InpaintGenerator encoder: cumulative per-layer device time.

The encoder measured ~284 ms at [65,360,640,5] while its convs microbench
to ~50 ms total — this finds where the rest goes.
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

from comfyui_propainter_nodes_tpu.ops.conv import pconv2d, leaky_relu
from comfyui_propainter_nodes_tpu.models.propainter import _ENC_GROUPS
from comfyui_propainter_nodes_tpu.utils.weights import random_params

REPS = int(os.environ.get("REPS", 6))
rng = np.random.default_rng(0)
bf16 = jnp.bfloat16

base = None  # measured null-program overhead


def timeit(name, fn, *args, reps=REPS):
    global base

    @jax.jit
    def run(*a):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(reps):
            a0 = a[0] + (acc * 1e-30).astype(a[0].dtype)
            out = fn(a0, *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            acc = acc + jnp.sum(leaf.astype(jnp.float32))
        return acc

    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    wall = time.perf_counter() - t0
    if base is None and name == "null":
        base = wall
        print(f"null overhead: {wall*1e3:.1f} ms", flush=True)
        return 0.0
    dt = (wall - (base or 0.0)) / reps
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


ip = {k: jnp.asarray(v, bf16) for k, v in random_params("inpaint_generator").items()}
x_in = jnp.asarray(rng.uniform(-1, 1, (65, 360, 640, 5)), bf16)

timeit("null", lambda a: a, jnp.zeros((1,), bf16))


def enc_upto(stop):
    def f(x):
        out = x
        x0 = None
        for i in range(0, stop + 1, 2):
            if i == 8:
                x0 = out
            if i > 8:
                g = _ENC_GROUPS[i]
                n, h, w, _ = out.shape
                xg = x0.reshape(n, h, w, g, -1)
                og = out.reshape(n, h, w, g, -1)
                out = jnp.concatenate([xg, og], axis=-1).reshape(n, h, w, -1)
            stride = (2, 2) if i in (0, 4) else (1, 1)
            groups = _ENC_GROUPS.get(i, 1)
            out = pconv2d(
                ip, f"encoder.layers.{i}", out, stride=stride,
                padding=(1, 1), groups=groups,
            )
            out = leaky_relu(out, 0.2)
        return out

    return f


for stop in range(0, 18, 2):
    timeit(f"enc through layer {stop}", enc_upto(stop), x_in)
