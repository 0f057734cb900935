"""Structured per-run metrics.

SURVEY §5: the reference's only observability is a tqdm bar and prints.
Here every node invocation can emit one JSON record (config, stage wall
times, throughput) — appended to the file named by
PROPAINTER_TPU_METRICS, or retrievable in-process via `last_run()`.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

from . import profiling

_LAST: dict | None = None


class RunRecorder:
    def __init__(self, kind: str, config, video_length: int):
        self.record = {
            "kind": kind,
            "video_length": video_length,
            "config": dataclasses.asdict(config),
            "started_unix": time.time(),
        }

    def __enter__(self):
        profiling.reset()
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, exc_type, exc, tb):
        global _LAST
        dt = time.perf_counter() - self._t0
        self.record["seconds"] = round(dt, 4)
        if dt > 0:
            self.record["frames_per_sec"] = round(
                self.record["video_length"] / dt, 3
            )
        self.record["stages"] = profiling.summary()
        self.record["ok"] = exc_type is None
        _LAST = self.record
        path = os.environ.get("PROPAINTER_TPU_METRICS")
        if path:
            with open(path, "a") as f:
                f.write(json.dumps(self.record) + "\n")
        return False


def last_run() -> dict | None:
    return _LAST
