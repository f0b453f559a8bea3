"""Tracing / profiling — built in from day one (SURVEY §5 tracing plan).

The reference's only observability is a per-epoch time/VRAM callback
(`/root/reference/REFace/main.py:423-443`) and tqdm bars. Here:

* :class:`StageTimer` — per-stage wall timing (detect/align/parse/encode/
  invert/flow/sample/decode/paste) with block-until-ready semantics so device
  work is attributed to the right stage;
* :func:`trace` — context manager around ``jax.profiler`` for TensorBoard
  traces of the jitted hot loops;
* :func:`device_memory_stats` — per-device live/peak bytes where the backend
  exposes them.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional

import jax


class StageTimer:
    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": v, "count": self.counts[k], "mean_s": v / self.counts[k]}
            for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])
        }

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/vface_trace"):
    """jax.profiler trace for TensorBoard (xplane) of whatever runs inside."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, Optional[dict]]:
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
