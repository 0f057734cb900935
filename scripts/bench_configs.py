"""BASELINE.md measurement configs 2-5 (config 1 is bench.py's default).

Each config prints one JSON line and appends to BENCH_CONFIGS.md:

  2. outpaint 640x360, width_scale 1.2          (BASELINE.md:30)
  3. RAFT flow + flow completion standalone,
     80-frame 640x360 subvideo, raft_iter 20     (BASELINE.md:31)
  4. 720p 240-frame completion, bf16,
     subvideo_length 80 streaming chunks         (BASELINE.md:32)
  5. 1080p long-video leg                        (BASELINE.md:33)
     - real chip: streaming throughput at 1080p (single-chip share of
       the sharded config; clips are embarrassingly parallel across
       chips, see parallel/mesh.py + MULTICHIP dryrun for the
       correctness certificate)

Select with CONFIGS=2,3,4,5 (default all). FRAMES_4 / FRAMES_5 shrink
the long configs for smoke runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CONFIGS = os.environ.get("CONFIGS", "2,3,4,5").split(",")
OUT_MD = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_CONFIGS.md",
)

results = []


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def record(name, metric, value, unit, detail=""):
    line = {"config": name, "metric": metric, "value": round(value, 3),
            "unit": unit}
    print(json.dumps(line), flush=True)
    results.append((name, metric, value, unit, detail))


def synthetic_clip(t, h, w, with_mask=True):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([yy / h, xx / w, (yy + xx) / (h + w)], -1).astype(
        np.float32
    )
    frames = np.repeat(base[None], t, axis=0)
    masks = np.zeros((t, h, w), np.float32)
    for i in range(t):
        x0 = int(w * 0.2) + (3 * i) % max(1, w // 3)
        y0 = int(h * 0.3) + i % max(1, h // 4)
        frames[i, y0 : y0 + h // 6, x0 : x0 + w // 8] = [1.0, 0.2, 0.2]
        masks[i, y0 : y0 + h // 6, x0 : x0 + w // 8] = 1.0
    fr = (frames * 255).astype(np.uint8)
    return (fr, (masks * 255).astype(np.uint8)) if with_mask else fr


# ------------------------------------------------------------- config 2
def _config_2():
    from comfyui_propainter_nodes_tpu.nodes import ProPainterOutpaint

    t, w, h = 24, 640, 360
    frames = synthetic_clip(t, h, w, with_mask=False)
    node = ProPainterOutpaint()

    def run2():
        return node.propainter_outpainting(
            frames, width=w, height=h, width_scale=1.2, height_scale=1.0,
            mask_dilates=5, flow_mask_dilates=8, ref_stride=10,
            neighbor_length=10, subvideo_length=80, raft_iter=20,
            fp16="enable", _allow_random_weights=True,
        )

    t0 = time.perf_counter()
    np.asarray(run2()[0])
    log(f"config2 warmup {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    np.asarray(run2()[0])
    dt = time.perf_counter() - t0
    record("2-outpaint-640x360x1.2", "outpaint_frames_per_sec", t / dt,
           "frames/s/chip", f"{t}f in {dt:.2f}s")

# ------------------------------------------------------------- config 3
def _config_3():
    import jax.numpy as jnp
    from comfyui_propainter_nodes_tpu.config import PipelineConfig
    from comfyui_propainter_nodes_tpu.pipeline.stages import Pipeline
    from comfyui_propainter_nodes_tpu.utils import weights as wz

    t, w, h = 80, 640, 360
    fr_u8, mk_u8 = synthetic_clip(t, h, w)
    cfg = PipelineConfig(
        ref_stride=10, neighbor_length=10, subvideo_length=80,
        raft_iter=20, fp16="enable", process_size=(w, h),
        raft_bf16=(None if os.environ.get("BENCH_RAFT_BF16") is None else os.environ["BENCH_RAFT_BF16"] == "1"),
    )
    params = [
        wz.get_params(m, allow_random=True)
        for m in ("raft", "flow_completion", "inpaint_generator")
    ]
    pipe = Pipeline(*params, cfg)
    frames = jnp.asarray(fr_u8, jnp.float32)[None] / 255.0 * 2.0 - 1.0
    fmasks = jnp.asarray((mk_u8 > 0).astype(np.float32))[None, ..., None]

    def run3():
        ff, fb = pipe.compute_flow(frames)
        pf, pb = pipe.complete_flow((ff, fb), fmasks)
        return pf

    t0 = time.perf_counter()
    np.asarray(run3())
    log(f"config3 warmup {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    np.asarray(run3())
    dt = time.perf_counter() - t0
    record("3-flowstack-80f-640x360", "flow_stack_frames_per_sec", t / dt,
           "frames/s/chip", f"{t}f flow+completion in {dt:.2f}s")

# ------------------------------------------------------------- config 4
def _config_4():
    import jax.numpy as jnp
    from comfyui_propainter_nodes_tpu.config import PipelineConfig
    from comfyui_propainter_nodes_tpu.pipeline.stages import Pipeline
    from comfyui_propainter_nodes_tpu.pipeline.streaming import (
        process_streaming,
    )
    from comfyui_propainter_nodes_tpu.utils import weights as wz

    t = int(os.environ.get("FRAMES_4", "240"))
    w, h = 1280, 720
    cfg = PipelineConfig(
        ref_stride=10, neighbor_length=10, subvideo_length=80,
        raft_iter=20, fp16="enable", process_size=(w, h),
        raft_bf16=(None if os.environ.get("BENCH_RAFT_BF16") is None else os.environ["BENCH_RAFT_BF16"] == "1"),
    )
    params = [
        wz.get_params(m, allow_random=True)
        for m in ("raft", "flow_completion", "inpaint_generator")
    ]
    pipe = Pipeline(*params, cfg)

    base_f, base_m = synthetic_clip(32, h, w)
    base_f = base_f.astype(np.float32) / 255.0
    base_m = (base_m > 0).astype(np.float32)

    def fetch(start, count):
        idx = (start + np.arange(count)) % 32
        return base_f[idx]

    def fetch_mask(start, count):
        idx = (start + np.arange(count)) % 32
        return base_m[idx]

    written = [0]

    def write(start, arr):
        written[0] += arr.shape[0]

    t0 = time.perf_counter()
    process_streaming(pipe, fetch, fetch_mask, t, write)
    dt = time.perf_counter() - t0
    assert written[0] == t, f"streamed {written[0]} != {t}"
    # one pass includes compiles; report a second pass as steady state
    written[0] = 0
    t0 = time.perf_counter()
    process_streaming(pipe, fetch, fetch_mask, t, write)
    dt = time.perf_counter() - t0
    record("4-720p-240f-bf16-streaming", "stream_frames_per_sec", t / dt,
           "frames/s/chip", f"{t}f 720p streamed in {dt:.2f}s")

# ------------------------------------------------------------- config 5
def _config_5():
    import jax.numpy as jnp
    from comfyui_propainter_nodes_tpu.config import PipelineConfig
    from comfyui_propainter_nodes_tpu.pipeline.stages import Pipeline
    from comfyui_propainter_nodes_tpu.pipeline.streaming import (
        process_streaming,
    )
    from comfyui_propainter_nodes_tpu.utils import weights as wz

    t = int(os.environ.get("FRAMES_5", "120"))
    w, h = 1920, 1080
    cfg = PipelineConfig(
        ref_stride=10, neighbor_length=10, subvideo_length=80,
        raft_iter=20, fp16="enable", process_size=(w, h),
        raft_bf16=(None if os.environ.get("BENCH_RAFT_BF16") is None else os.environ["BENCH_RAFT_BF16"] == "1"),
    )
    params = [
        wz.get_params(m, allow_random=True)
        for m in ("raft", "flow_completion", "inpaint_generator")
    ]
    pipe = Pipeline(*params, cfg)

    base_f, base_m = synthetic_clip(16, h, w)
    base_f = base_f.astype(np.float32) / 255.0
    base_m = (base_m > 0).astype(np.float32)

    def fetch(start, count):
        idx = (start + np.arange(count)) % 16
        return base_f[idx]

    def fetch_mask(start, count):
        idx = (start + np.arange(count)) % 16
        return base_m[idx]

    written = [0]

    def write(start, arr):
        written[0] += arr.shape[0]

    t0 = time.perf_counter()
    process_streaming(pipe, fetch, fetch_mask, t, write)
    log(f"config5 warmup pass {time.perf_counter() - t0:.1f}s")
    written[0] = 0
    t0 = time.perf_counter()
    process_streaming(pipe, fetch, fetch_mask, t, write)
    dt = time.perf_counter() - t0
    assert written[0] == t
    record(
        "5-1080p-streaming-per-chip", "stream_frames_per_sec", t / dt,
        "frames/s/chip",
        f"{t}f 1080p streamed in {dt:.2f}s; the v5e-8 sharded config is "
        "clip-parallel (independent clips per chip — MULTICHIP dryrun "
        "certifies the sharded pipeline), so slice throughput ~= 8x this",
    )


# ------------------------------------------------------------- runner
# each config runs guarded: a failure (e.g. a Mosaic compile error at
# one resolution) records a FAILED row instead of losing every later
# config and the report
for _name, _fn in (
    ("2", _config_2), ("3", _config_3), ("4", _config_4), ("5", _config_5),
):
    if _name in CONFIGS:
        try:
            _fn()
        except Exception as _e:
            import traceback
            traceback.print_exc()
            log(f"config {_name} FAILED: {type(_e).__name__}")
            results.append(
                (f"{_name}", "FAILED", float("nan"), "",
                 f"{type(_e).__name__}: {str(_e)[:160]}")
            )

# ----------------------------------------------------------------- report
if results:
    # merge with rows from a previous partial run (keyed by leading config
    # number) so CONFIGS=4,5 doesn't drop the committed 2-3 rows
    kept = {}
    if os.path.exists(OUT_MD):
        with open(OUT_MD) as f:
            for row in f:
                row = row.strip()
                if row.startswith("|") and not row.startswith("|---") \
                        and not row.startswith("| config"):
                    key = row.split("|")[1].strip().split("-")[0]
                    kept[key] = row
    for name, metric, value, unit, detail in results:
        key = name.split("-")[0]
        kept[key] = (
            f"| {name} | {metric} | {value:.3f} | {unit} | {detail} |"
        )
    dev = str(jax.devices()[0])
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    lines = [
        "# BENCH_CONFIGS — BASELINE.md measurement configs 2-5",
        "",
        f"Last run: {stamp} on {dev} (random weights; real checkpoints "
        "are air-gapped — see scripts/parity_real_weights.py)",
        "",
        "| config | metric | value | unit | detail |",
        "|---|---|---|---|---|",
    ]
    lines.extend(kept[k] for k in sorted(kept))
    with open(OUT_MD, "w") as f:
        f.write("\n".join(lines) + "\n")
    log(f"wrote {OUT_MD}")
