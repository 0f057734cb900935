"""Compile-time attribution probe (round-4 warmup regression hunt).

Times jax.jit(...).lower() and .compile() separately for each stage
program at the bench shapes (24f 640x360, default config), so the
1415s fused-program warmup (BENCH_r03.json) can be attributed to a
stage / sub-part. Run on the real chip:

    python scripts/probe_compile.py [flow complete imgprop feature fused]

Writes one JSON line per program to stderr progress + a summary JSON to
stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parts = sys.argv[1:] or ["flow", "complete", "imgprop", "feature"]
    t = int(os.environ.get("BENCH_FRAMES", "24"))
    w, h = 640, 360

    from comfyui_propainter_nodes_tpu.config import PipelineConfig
    from comfyui_propainter_nodes_tpu.nodes import get_pipeline

    cfg = PipelineConfig(process_size=(w, h))
    pipe = get_pipeline(cfg, allow_random_weights=True)

    f32 = jnp.float32

    def sds(shape, dtype=f32):
        return jax.ShapeDtypeStruct(shape, dtype)

    def ptree(params):
        return jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)

    hw = (h, w)
    frames = sds((1, t, h, w, 3))
    flows = sds((1, t - 1, h, w, 2))
    mask = sds((1, t, h, w, 1))
    orig = sds((t, h, w, 3))

    progs = {
        "flow": lambda: (pipe._flow_fn(t, hw), (ptree(pipe.raft_params), frames)),
        "complete": lambda: (
            pipe._complete_fn(t - 1),
            (ptree(pipe.flow_params), flows, flows, mask),
        ),
        "imgprop": lambda: (pipe._imgprop_fn(t), (frames, mask, flows, flows)),
        "feature": lambda: (
            pipe._feature_fn(t),
            (ptree(pipe.inpaint_params), frames, mask, mask, flows, flows, orig),
        ),
        "fused": lambda: (
            pipe._process_fn(t, hw),
            (
                ptree(pipe.raft_params),
                ptree(pipe.flow_params),
                ptree(pipe.inpaint_params),
                frames,
                mask,
                mask,
                orig,
            ),
        ),
    }

    results = {}
    for name in parts:
        fn, args = progs[name]()
        t0 = time.perf_counter()
        lowered = jax.jit(fn).lower(*args)
        t_lower = time.perf_counter() - t0
        n_ops = None
        try:
            n_ops = lowered.as_text().count("\n")
        except Exception:
            pass
        print(
            f"{name}: lower {t_lower:.1f}s, stablehlo lines ~{n_ops}",
            file=sys.stderr,
            flush=True,
        )
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        print(f"{name}: compile {t_compile:.1f}s", file=sys.stderr, flush=True)
        results[name] = {
            "lower_s": round(t_lower, 1),
            "compile_s": round(t_compile, 1),
            "hlo_lines": n_ops,
        }
        del compiled, lowered

    print(json.dumps(results))


if __name__ == "__main__":
    main()
