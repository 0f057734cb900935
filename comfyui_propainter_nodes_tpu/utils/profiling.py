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
import sys
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


_CALLBACKS_OK: bool | None = None


def callbacks_supported() -> bool:
    """Whether the active backend supports host callbacks from traced
    programs (jax.debug.callback). The remote-tunneled TPU backend
    (axon_pjrt) does not implement host send/recv; probing once lets the
    feature stage bake in-flight progress ticks only where they can run.
    """
    global _CALLBACKS_OK
    if _CALLBACKS_OK is None:
        try:
            def _probe(x):
                jax.debug.callback(lambda _v: None, x)
                return x + 1

            np.asarray(jax.jit(_probe)(jax.numpy.zeros(())))
            _CALLBACKS_OK = True
        except Exception:  # noqa: BLE001 - any failure means "no"
            _CALLBACKS_OK = False
    return _CALLBACKS_OK


def progress_report(callback, stage: str, done: int, total: int) -> None:
    """Invoke a user progress callback, swallowing its errors.

    The reference surfaces progress as a tqdm bar over the window loop
    (propainter_inference.py:7,254); here every pipeline stage reports
    (stage, done, total) through `Pipeline.progress` — a tqdm adapter or
    any callable. Errors in the callback never kill a run."""
    if callback is None:
        return
    try:
        callback(stage, done, total)
    except Exception:  # noqa: BLE001 - observability must not break runs
        pass


class NodeProgress:
    """Progress sink for node invocations (tqdm-equivalent of the
    reference's window bar, propainter_inference.py:7,254).

    Routes (stage, done, total) reports to, in order of availability:
    ComfyUI's native ProgressBar (drives the web UI), tqdm on stderr, or
    plain stderr lines (at most one per second). Ticks may arrive out of
    order from async device callbacks; progress is kept monotonic per
    stage."""

    def __init__(self, video_length: int | None = None):
        self._done: dict[str, int] = {}
        self._last_print = 0.0
        self._comfy_bar = None
        self._tqdm = {}
        try:  # inside a ComfyUI runtime only
            from comfy.utils import ProgressBar  # type: ignore

            if video_length:
                self._comfy_bar = ProgressBar(video_length)
        except Exception:  # noqa: BLE001 - standalone use
            pass

    def __call__(self, stage: str, done: int, total: int) -> None:
        done = max(done, self._done.get(stage, 0))
        self._done[stage] = done
        if self._comfy_bar is not None and total:
            self._comfy_bar.update_absolute(
                int(self._comfy_bar.total * done / total)
            )
            return
        try:
            from tqdm import tqdm

            bar = self._tqdm.get(stage)
            if bar is None:
                bar = self._tqdm[stage] = tqdm(
                    total=total, desc=stage, leave=False
                )
            bar.update(done - bar.n)
            if done >= total:
                bar.close()
                del self._tqdm[stage]
            return
        except ImportError:
            pass
        now = time.perf_counter()
        if done >= total or now - self._last_print >= 1.0:
            self._last_print = now
            print(f"[propainter] {stage}: {done}/{total}", file=sys.stderr)


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
