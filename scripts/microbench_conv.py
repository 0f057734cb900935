"""Raw MXU throughput probe: plain matmul vs conv at pipeline shapes.

Establishes the achievable ceiling for this chip so per-stage budgets
(VERDICT r2 item 1) are grounded in measured peak, not datasheet numbers.
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

REPS = int(os.environ.get("REPS", 10))
rng = np.random.default_rng(0)


def timeit(name, fn, flops, *args, reps=REPS):
    @jax.jit
    def run(*a):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(reps):
            a0 = a[0] + (acc * 1e-30).astype(a[0].dtype)
            out = fn(a0, *a[1:])
            acc = acc + jnp.sum(out.astype(jnp.float32))
        return acc

    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    dt = (time.perf_counter() - t0 - 0.031) / reps
    print(f"{name}: {dt*1e3:.2f} ms  {flops/dt/1e12:.1f} TFLOP/s", flush=True)
    return dt


def conv(x, w, stride=1, groups=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


bf16 = jnp.bfloat16

# pure matmul peak
for m, k, n in [(8192, 8192, 8192), (4096, 512, 4096), (72000, 512, 512)]:
    a = jnp.asarray(rng.standard_normal((m, k)), bf16)
    b = jnp.asarray(rng.standard_normal((k, n)), bf16)
    timeit(
        f"matmul bf16 [{m},{k}]x[{k},{n}]",
        lambda a, b: jnp.matmul(a, b, preferred_element_type=jnp.float32).astype(bf16),
        2 * m * k * n, a, b,
    )

# conv shapes from the encoder / offset chain / GRU
cases = [
    ("enc l0  [65,360,640,5->64] s1", (65, 360, 640, 5), 64, 1, 1),
    ("enc l2  [65,360,640,64->64] s2", (65, 360, 640, 64), 64, 2, 1),
    ("enc l4  [65,180,320,64->128] s2", (65, 180, 320, 64), 128, 2, 1),
    ("enc l6  [65,90,160,128->256] s1", (65, 90, 160, 128), 256, 1, 1),
    ("offs    [5,90,160,261->128] s1", (5, 90, 160, 261), 128, 1, 1),
    ("offs2   [5,90,160,128->128] s1", (5, 90, 160, 128), 128, 1, 1),
    ("offs6   [5,90,160,128->432] s1", (5, 90, 160, 128), 432, 1, 1),
    ("gru     [46,45,80,384->256] s1", (46, 45, 80, 384), 256, 1, 1),
]
for name, xs, cout, stride, g in cases:
    n_, h_, w_, cin = xs
    x = jnp.asarray(rng.standard_normal(xs) * 0.1, bf16)
    wt = jnp.asarray(rng.standard_normal((3, 3, cin // g, cout)) * 0.05, bf16)
    fl = 2 * n_ * (h_ // stride) * (w_ // stride) * 9 * (cin // g) * cout
    timeit(name, lambda x, w: conv(x, w, stride, g), fl, x, wt)

# same conv expressed as matmul over im2col-free 1x1 (lower bound check):
x = jnp.asarray(rng.standard_normal((65 * 90 * 160, 9 * 128)), bf16)
wt = jnp.asarray(rng.standard_normal((9 * 128, 256)), bf16)
timeit(
    "enc l6 as matmul [936000,1152]x[1152,256]",
    lambda a, b: jnp.matmul(a, b, preferred_element_type=jnp.float32).astype(bf16),
    2 * x.shape[0] * x.shape[1] * 256, x, wt,
)
