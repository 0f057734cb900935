"""Stage timing / tracing.

The reference's only observability is a tqdm bar and prints
(propainter_inference.py:254, propainter_nodes.py:134). Here every stage
records wall time into a process-local registry (dispatch time — device
work may still be in flight; end-to-end numbers come from bench.py which
blocks), and optionally emits jax.profiler trace annotations for
perfetto/xprof when JAX profiling is active.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

_TIMES: dict[str, float] = defaultdict(float)
_COUNTS: dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def stage_timer(name: str):
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    _TIMES[name] += time.perf_counter() - t0
    _COUNTS[name] += 1


def reset():
    _TIMES.clear()
    _COUNTS.clear()


def summary() -> dict[str, dict[str, float]]:
    return {
        k: {"seconds": _TIMES[k], "calls": _COUNTS[k]} for k in sorted(_TIMES)
    }


def log_summary(printer=print):
    for name, row in summary().items():
        printer(f"  {name}: {row['seconds']:.3f}s over {row['calls']} call(s)")
