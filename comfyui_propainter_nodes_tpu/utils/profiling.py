"""Stage timing / tracing.

The reference's only observability is a tqdm bar and prints
(propainter_inference.py:254, propainter_nodes.py:134). Here every stage
records wall time into a process-local registry, and optionally emits
jax.profiler trace annotations for perfetto/xprof when JAX profiling is
active.

Two timing modes:

  * default (non-blocking): records dispatch time only — device work may
    still be in flight. Zero overhead; end-to-end numbers come from the
    caller blocking on the final output.
  * blocking (``set_blocking(True)`` or env
    ``PROPAINTER_TPU_BLOCKING_TIMERS=1``): stages register their output
    arrays on the timer slot, and the timer forces execution before
    stopping the clock — per-stage numbers then sum to ~wall time.
    Synchronisation fetches a device-reduced scalar per output leaf
    (``block_until_ready`` does not reliably block through the remote
    TPU tunnel; a scalar fetch does, and transfers 4 bytes instead of
    the whole array). This serializes stages, so keep it off for
    end-to-end throughput runs.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

import jax
import numpy as np

_TIMES: dict[str, float] = defaultdict(float)
_COUNTS: dict[str, int] = defaultdict(int)
_BLOCKING = os.environ.get("PROPAINTER_TPU_BLOCKING_TIMERS", "0") == "1"


def set_blocking(on: bool) -> None:
    global _BLOCKING
    _BLOCKING = bool(on)


def blocking() -> bool:
    return _BLOCKING


class _Slot:
    """Output registry for one timed region: ``tm.set(stage_output)``."""

    __slots__ = ("value",)

    def __init__(self):
        self.value = None

    def set(self, value):
        self.value = value
        return value


def _materialize(tree) -> None:
    import jax.numpy as jnp

    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array):
            np.asarray(jnp.max(leaf))  # 4-byte fetch forces execution


@contextlib.contextmanager
def stage_timer(name: str):
    slot = _Slot()
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield slot
        if _BLOCKING and slot.value is not None:
            _materialize(slot.value)
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
    mode = "blocking" if _BLOCKING else "dispatch-only"
    printer(f"  stage timers ({mode}):")
    for name, row in summary().items():
        printer(f"    {name}: {row['seconds']:.3f}s over {row['calls']} call(s)")
