"""Round-4 feature-stage attribution via the polled-path programs:
prep (hoisted per-frame encode+downsample), per-group window forward,
and blend — the three pieces that sum to the feature stage."""

import os
import sys
import time

import numpy as np

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(_repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from comfyui_propainter_nodes_tpu.config import PipelineConfig
from comfyui_propainter_nodes_tpu.nodes import get_pipeline
from comfyui_propainter_nodes_tpu.pipeline.stages import (
    _blend_windows, _window_group_size, _window_tables,
)

T = int(os.environ.get("BENCH_FRAMES", "24"))
H, W = 360, 640
cfg = PipelineConfig(process_size=(W, H))
pipe = get_pipeline(cfg, allow_random_weights=True)
dt = pipe.cdtype

rng = np.random.default_rng(0)
uf = jnp.asarray(rng.uniform(-1, 1, (1, T, H, W, 3)).astype(np.float32), dt)
um_np = np.zeros((1, T, H, W, 1), np.float32)
um_np[:, :, 140:200, 260:340] = 1.0
um = jnp.asarray(um_np, dt)
md_np = np.zeros((1, T, H, W, 1), np.float32)
md_np[:, :, 120:240, 200:400] = 1.0
md = jnp.asarray(md_np, dt)
ff = jnp.asarray((rng.standard_normal((1, T - 1, H, W, 2)) * 3).astype(np.float32), dt)
fb = jnp.asarray((rng.standard_normal((1, T - 1, H, W, 2)) * 3).astype(np.float32), dt)
orig = jnp.asarray(rng.uniform(0, 255, (T, H, W, 3)).astype(np.float32))

sels, valids, starts, lts, refs, slot_valid, l_t_max, ref_max = _window_tables(cfg, T)
n_windows = sels.shape[0]
group_size = _window_group_size(n_windows, 1)
print(f"T={T} windows={n_windows} group={group_size} l_t_max={l_t_max} ref_max={ref_max}")


def sync(x):
    leaves = [l for l in jax.tree_util.tree_leaves(x) if isinstance(l, jax.Array)]
    np.asarray(jnp.max(leaves[0]))
    return x


def timed(name, fn, reps=3):
    out = sync(fn())
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = sync(fn())
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1000:.0f} ms")
    return out


prep = pipe.jits.get(
    "feature_poll_prep", (T, l_t_max, H, W),
    lambda: pipe._feature_prep_fn(T, l_t_max),
)
group_fn = pipe.jits.get(
    "feature_poll_group", (T, group_size, l_t_max, ref_max, H, W),
    lambda: pipe._feature_group_fn(l_t_max),
)

args = timed(
    "prep (pad + hoisted encode/downsample, 24 frames)",
    lambda: prep(pipe.inpaint_params, uf, um, md, ff, fb, orig),
)

g0 = 0
grp = list(range(g0, min(n_windows, g0 + group_size)))
grp = grp + [grp[-1]] * (group_size - len(grp))
gsel = jnp.asarray(sels[grp])
gval = jnp.asarray(valids[grp])
gst = jnp.asarray(starts[grp])
gl = jnp.asarray(lts[grp])
gr = jnp.asarray(refs[grp])

out = timed(
    f"window group forward ({group_size} windows, from features)",
    lambda: group_fn(pipe.inpaint_params, *args, gsel, gval, gst, gl, gr),
)

imgs = jnp.concatenate([out[:n_windows]], axis=0)
blend_jit = jax.jit(
    lambda im: _blend_windows(
        im, jnp.asarray(starts), jnp.asarray(slot_valid), T, l_t_max
    )
)
timed("blend scan", lambda: blend_jit(imgs))

# deeper: parts of the group forward at its shapes
from comfyui_propainter_nodes_tpu.models import propainter as pp

enc_all = args[0]
G = group_size
enc_sel = enc_all[gsel]
h4, w4 = H // 4, W // 4
ds_ff = jnp.zeros((G, l_t_max - 1, h4, w4, 2), dt)
ds_mi = jnp.zeros((G, l_t_max, h4, w4, 1), dt)
prop_in = jnp.concatenate([ds_mi, ds_mi], axis=-1)

fp = jax.jit(
    lambda e, f1, f2, m: pp.bidirectional_propagation_feature(
        pipe.inpaint_params, e[:, :l_t_max], f1, f2, m
    )
)
try:
    timed("  part: feature bidir prop (deform, 11 frames x 5 win)",
          lambda: fp(enc_sel, ds_ff, ds_ff, prop_in))
except Exception as e:
    print(f"  part: feature bidir prop FAILED: {str(e)[:160]}")

t_sel = l_t_max + ref_max
ss = jax.jit(
    lambda e: pp.soft_split(
        pipe.inpaint_params, "ss", e.reshape(G * t_sel, h4, w4, 128)
    )
)
tok = timed("  part: soft_split", lambda: ss(enc_sel))
fh, fw = tok.shape[1], tok.shape[2]
tok5 = tok.reshape(G, t_sel, fh, fw, 512)
mask_pool = jnp.asarray(
    (np.random.default_rng(1).uniform(size=(G, l_t_max, (h4 + 2*3 - 7)//3 + 1, (w4 + 2*3 - 7)//3 + 1, 1)) > 0.7).astype(np.float32), dt
)

ts = jax.jit(
    lambda x, m: pp.transformer_stack(
        pipe.inpaint_params, "transformers", x, (h4, w4), m
    )
)
tout = timed("  part: transformer stack (8 blocks)", lambda: ts(tok5, mask_pool))

sc = jax.jit(
    lambda x: pp.soft_comp(
        pipe.inpaint_params, "sc", x.reshape(G * t_sel, fh, fw, 512), (h4, w4)
    )
)
timed("  part: soft_comp", lambda: sc(tout))

dec = jax.jit(
    lambda e: pp.decoder(pipe.inpaint_params, e[:, :l_t_max].reshape(G * l_t_max, h4, w4, 128))
)
timed("  part: decoder (55 frames)", lambda: dec(enc_sel))
