"""End-to-end benchmark: inpainted frames/sec on one chip.

Measures the full ProPainterInpaint node (preprocessing -> RAFT ->
flow completion -> image propagation -> transformer windows -> on-device
composition) on a synthetic 640x360 clip, default config
(mirrors BASELINE.md north star: >30 frames/s/chip on v5e).

Prints ONE JSON line on stdout; progress goes to stderr.

Env knobs: BENCH_FRAMES (default 24), BENCH_WIDTH/HEIGHT (640/360),
BENCH_FP16 (enable|disable, default enable).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

# persistent compilation cache: steady-state numbers survive process
# restarts and driver re-runs
cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def init_backend_with_retry(retries: int = 5, backoff_s: float = 20.0):
    """Initialize the JAX backend, retrying through transient tunnel outages.

    Round 4's driver bench capture was lost to a single transient axon
    backend-init failure at the first ``jax.devices()`` call (VERDICT r4
    missing #3).  The tunnel recovers on its own within tens of seconds,
    so retry with backoff and clear the cached (failed) backend between
    attempts instead of dying on the first hiccup.
    """
    last_err: Exception | None = None
    for attempt in range(retries):
        try:
            devs = jax.devices()
            if devs:
                return devs
            raise RuntimeError("jax.devices() returned no devices")
        except Exception as e:  # backend init raises RuntimeError on tunnel loss
            last_err = e
            log(
                f"backend init attempt {attempt + 1}/{retries} failed: "
                f"{type(e).__name__}: {e}"
            )
            try:
                import jax.extend.backend as _jb

                _jb.clear_backends()
            except Exception:
                pass
            if attempt < retries - 1:
                time.sleep(backoff_s * (1.5**attempt))
    raise RuntimeError(f"backend unreachable after {retries} attempts: {last_err}")


def synthetic_clip(t: int, h: int, w: int):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([yy / h, xx / w, (yy + xx) / (h + w)], axis=-1).astype(
        np.float32
    )
    frames = np.repeat(base[None], t, axis=0)
    masks = np.zeros((t, h, w), dtype=np.float32)
    for i in range(t):
        x0 = int(w * 0.2) + 3 * i
        y0 = int(h * 0.3) + i
        frames[i, y0 : y0 + h // 6, x0 : x0 + w // 8] = [1.0, 0.2, 0.2]
        masks[i, y0 : y0 + h // 6, x0 : x0 + w // 8] = 1.0
    return (frames * 255).astype(np.uint8), (masks * 255).astype(np.uint8)


def main() -> None:
    mode = os.environ.get("BENCH_MODE", "inpaint")  # inpaint | outpaint
    t = int(os.environ.get("BENCH_FRAMES", "24"))
    w = int(os.environ.get("BENCH_WIDTH", "640"))
    h = int(os.environ.get("BENCH_HEIGHT", "360"))
    fp16 = os.environ.get("BENCH_FP16", "enable")
    # None -> config default (follows the fp16 knob; config.raft_half)
    raft_env = os.environ.get("BENCH_RAFT_BF16")
    raft_bf16 = None if raft_env is None else raft_env == "1"

    devs = init_backend_with_retry()
    log(
        f"bench: {t} frames @ {w}x{h} fp16={fp16} raft_bf16={raft_bf16} "
        f"on {devs[0]}"
    )
    frames, masks = synthetic_clip(t, h, w)

    from comfyui_propainter_nodes_tpu.nodes import (
        ProPainterInpaint,
        ProPainterOutpaint,
    )
    from comfyui_propainter_nodes_tpu.utils import profiling

    node = ProPainterOutpaint() if mode == "outpaint" else ProPainterInpaint()
    if raft_bf16 is not None:
        from comfyui_propainter_nodes_tpu import nodes as _nodes

        _orig = _nodes.get_pipeline
        _nodes.get_pipeline = lambda cfg, rnd=False: _orig(
            cfg.replace(raft_bf16=raft_bf16), rnd
        )

    def run():
        if mode == "outpaint":
            return node.propainter_outpainting(
                frames,
                width=w,
                height=h,
                width_scale=1.2,
                height_scale=1.0,
                mask_dilates=5,
                flow_mask_dilates=8,
                ref_stride=10,
                neighbor_length=10,
                subvideo_length=80,
                raft_iter=20,
                fp16=fp16,
                _allow_random_weights=True,
            )
        return node.propainter_inpainting(
            frames,
            masks,
            width=w,
            height=h,
            mask_dilates=5,
            flow_mask_dilates=8,
            ref_stride=10,
            neighbor_length=10,
            subvideo_length=80,
            raft_iter=20,
            fp16=fp16,
            _allow_random_weights=True,
        )

    # per-program compile attribution: jax logs "Finished XLA
    # compilation of <name> in <sec>" lines; capture them for the warmup
    import logging
    import re as _re

    compile_lines: list[str] = []

    class _CompileLog(logging.Handler):
        def emit(self, record):
            m = record.getMessage()
            if "Finished XLA compilation" in m or "Compiling " in m:
                compile_lines.append(m)

    handler = _CompileLog()
    logging.getLogger("jax").addHandler(handler)
    jax.config.update("jax_log_compiles", True)

    t0 = time.perf_counter()
    out = run()
    np.asarray(out[0])
    warmup_s = time.perf_counter() - t0
    jax.config.update("jax_log_compiles", False)
    logging.getLogger("jax").removeHandler(handler)
    for m in compile_lines:
        fin = _re.search(r"Finished XLA compilation of (\S+) in (\S+) sec", m)
        if fin:
            log(f"  compile: {fin.group(1)}: {float(fin.group(2)):.1f}s")
    log(f"warmup (incl. compile): {warmup_s:.1f}s")

    profiling.reset()
    # tunneled-TPU wall times are noisy (measured rep spread up to 2x:
    # e.g. [2.94, 1.82, 3.87]s for a 1.57s device program); headline =
    # MEDIAN of 7 (best-of-N would overstate vs the BASELINE target, and
    # a 3-rep median loses ~1 f/s to a single congested rep); min logged
    reps = int(os.environ.get("BENCH_REPS", "7"))
    times = []
    failures = 0
    for _ in range(reps):
        try:
            t0 = time.perf_counter()
            out = run()
            np.asarray(out[0])
            times.append(time.perf_counter() - t0)
        except Exception as e:  # transient tunnel hiccup: keep surviving reps
            failures += 1
            log(f"steady rep failed ({type(e).__name__}: {e}); retrying in 15s")
            time.sleep(15.0)
            if failures > reps:
                raise
    if not times:
        raise RuntimeError("all steady-state reps failed")
    dt = sorted(times)[len(times) // 2]
    fps = t / dt
    log(
        f"steady: median {dt:.2f}s / best {min(times):.2f}s "
        f"(reps: {[round(x, 2) for x in times]}) -> {fps:.2f} frames/s"
    )

    if os.environ.get("BENCH_STAGE_SPLIT", "0") == "1":
        # extra run with blocking timers: per-stage attribution that sums
        # to ~wall time (serializes stages, so measured separately)
        profiling.set_blocking(True)
        profiling.reset()
        t0 = time.perf_counter()
        out = run()
        np.asarray(out[0])
        log(f"stage-split run: {time.perf_counter() - t0:.2f}s")
        profiling.log_summary(log)
        profiling.set_blocking(False)

    try:  # compiled-program inventory (warmup audit)
        from comfyui_propainter_nodes_tpu.pipeline.stages import JitCache

        log(f"compiled programs (JitCache entries): {len(JitCache._store)}")
    except Exception:
        pass

    baseline_target = 30.0  # BASELINE.md north star frames/s/chip
    print(
        json.dumps(
            {
                "metric": f"{mode}_frames_per_sec_{w}x{h}",
                "value": round(fps, 3),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / baseline_target, 4),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # always emit ONE parseable JSON line for the driver
        import traceback

        traceback.print_exc(file=sys.stderr)
        print(
            json.dumps(
                {
                    "metric": "inpaint_frames_per_sec_640x360",
                    "value": None,
                    "unit": "frames/s/chip",
                    "vs_baseline": None,
                    "error": f"{type(e).__name__}: {e}",
                }
            )
        )
        sys.exit(1)
