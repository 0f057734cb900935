"""Round-4 stage attribution: run the pipeline's own stage programs
chained on concrete device inputs, timing each with a 4-byte scalar
fetch (block_until_ready doesn't reliably block through the tunnel).

Prints per-stage seconds that ARE the device time (no host prep, no
transfer, no blocking-timer fetch overhead), plus the fused program's
one-dispatch time for comparison.
"""

import os
import sys
import time

import numpy as np

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)

import jax
import jax.numpy as jnp

cache_dir = os.path.join(_repo, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from comfyui_propainter_nodes_tpu.config import PipelineConfig
from comfyui_propainter_nodes_tpu.nodes import get_pipeline

T = int(os.environ.get("BENCH_FRAMES", "24"))
H, W = 360, 640
cfg = PipelineConfig(process_size=(W, H))
pipe = get_pipeline(cfg, allow_random_weights=True)

rng = np.random.default_rng(0)
frames = jnp.asarray(
    rng.uniform(-1, 1, (1, T, H, W, 3)).astype(np.float32)
)
mask_np = np.zeros((1, T, H, W, 1), np.float32)
mask_np[:, :, 120:240, 200:400] = 1.0
masks = jnp.asarray(mask_np)
orig = jnp.asarray(rng.uniform(0, 255, (T, H, W, 3)).astype(np.float32))


def sync(x):
    leaves = [l for l in jax.tree_util.tree_leaves(x) if isinstance(l, jax.Array)]
    np.asarray(jnp.max(leaves[0]))
    return x


def timed(name, fn, reps=3):
    out = sync(fn())  # warm (compile)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = sync(fn())
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1000:.0f} ms")
    return out


# empty-queue sync cost (the fetch round-trip itself)
timed("scalar fetch round-trip (baseline)", lambda: frames[:1, :1, :1, :1])

flows = timed("stage1 compute_flow", lambda: pipe.compute_flow(frames))
pred = timed("stage2 complete_flow", lambda: pipe.complete_flow(flows, masks))
upd = timed(
    "stage3 image_propagation",
    lambda: pipe.image_propagation(frames, masks, pred),
)
comp = timed(
    "stage4 feature_propagation",
    lambda: pipe.feature_propagation(upd[0], upd[1], masks, pred, orig),
)

os.environ.pop("PROPAINTER_TPU_FUSED", None)
timed(
    "fused one-dispatch process",
    lambda: pipe.process(frames, masks, masks, orig),
)
