"""Probe: the pipeline's exact stage-3 jit vs its stage-timer number.

bench_imgprop.py measured the raw stage-3 program at ~159 ms, but the
blocking stage timer reports ~0.9 s inside the pipeline. This probe runs
the pipeline's OWN cached jit ("img_prop") on concrete device inputs to
attribute the difference. Usage: python scripts/probe_img_prop.py
"""

import os
import sys
import time

import numpy as np
import jax

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)

import jax.numpy as jnp

from comfyui_propainter_nodes_tpu.config import PipelineConfig
from comfyui_propainter_nodes_tpu.nodes import get_pipeline

T, H, W = 24, 360, 640
cfg = PipelineConfig(
    ref_stride=10,
    neighbor_length=10,
    subvideo_length=80,
    raft_iter=20,
    fp16="enable",
    process_size=(W, H),
)
pipe = get_pipeline(cfg, allow_random_weights=True)
dt = pipe.cdtype
rng = np.random.default_rng(0)

fr = jnp.asarray(rng.uniform(0, 1, (1, T, H, W, 3)).astype(np.float32), dt)
mk = jnp.asarray((rng.uniform(size=(1, T, H, W, 1)) > 0.8).astype(np.float32), dt)
ff = jnp.asarray((rng.standard_normal((1, T - 1, H, W, 2)) * 3).astype(np.float32), dt)
fb = jnp.asarray((rng.standard_normal((1, T - 1, H, W, 2)) * 3).astype(np.float32), dt)
for a in (fr, mk, ff, fb):
    float(jnp.sum(a[..., :1].astype(jnp.float32)))  # materialize inputs

fn = pipe.jits.get("img_prop", fr.shape[1:], pipe._imgprop_build)
tv = jnp.asarray(T)


def run_once(tag):
    t0 = time.perf_counter()
    uf, um = fn(fr, mk, ff, fb, tv)
    t_disp = time.perf_counter() - t0
    float(jnp.max(uf))
    float(jnp.max(um))
    t_all = time.perf_counter() - t0
    print(f"{tag}: dispatch {t_disp*1e3:.0f} ms, total {t_all*1e3:.0f} ms", flush=True)


run_once("warmup/compile")
for i in range(4):
    run_once(f"steady {i}")

# the stage wrapper's extra work: astype casts + t_valid upload + out slices
def with_wrapper():
    t0 = time.perf_counter()
    uf, um = pipe.image_prop_chunk(
        fr.astype(jnp.float32), mk.astype(jnp.float32),
        ff.astype(jnp.float32), fb.astype(jnp.float32), T, T
    )
    float(jnp.max(uf))
    float(jnp.max(um))
    print(f"wrapper total {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)


for i in range(3):
    with_wrapper()
