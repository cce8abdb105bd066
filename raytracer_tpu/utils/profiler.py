"""Stage timing + frame statistics.

The reference's observability is thread-prefixed prints, a BVH-build
wall-time log (``bvh/BVHBuilder.java:34-39``), and an FPS/samples window
title (``VulkanApp.java:226-234``); ``FrameData`` carries a "RENDER
STATISTICS" TODO. This module supplies the real thing: nestable stage
timers with per-stage aggregates (build / flatten / upload / dispatch /
readback), a rolling FPS + Mrays/s counter, and optional hooks into
``jax.profiler`` traces.
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Optional

from raytracer_tpu.utils.log import get_logger

_log = get_logger("prof")


class StageTimer:
    """Aggregating wall-time profiler for pipeline stages."""

    def __init__(self):
        self._totals = collections.defaultdict(float)
        self._counts = collections.defaultdict(int)
        self._last = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._totals[name] += dt
            self._counts[name] += 1
            self._last[name] = dt
            _log.debug("%s: %.2f ms", name, dt * 1e3)

    def summary(self) -> dict:
        return {
            name: {
                "total_ms": round(self._totals[name] * 1e3, 2),
                "count": self._counts[name],
                "mean_ms": round(
                    self._totals[name] / self._counts[name] * 1e3, 2),
                "last_ms": round(self._last[name] * 1e3, 2),
            }
            for name in self._totals
        }

    def reset(self) -> None:
        self._totals.clear()
        self._counts.clear()
        self._last.clear()


class FrameCounter:
    """Rolling FPS / Mrays-per-second meter (1 Hz window like the
    reference title bar)."""

    def __init__(self, window_s: float = 1.0):
        self.window_s = window_s
        self._frames = collections.deque()  # (t, rays)

    def tick(self, rays: float = 0.0) -> None:
        now = time.perf_counter()
        self._frames.append((now, rays))
        while self._frames and now - self._frames[0][0] > self.window_s:
            self._frames.popleft()

    @property
    def fps(self) -> float:
        if len(self._frames) < 2:
            return 0.0
        span = self._frames[-1][0] - self._frames[0][0]
        return (len(self._frames) - 1) / span if span > 0 else 0.0

    @property
    def mrays_per_s(self) -> float:
        if len(self._frames) < 2:
            return 0.0
        span = self._frames[-1][0] - self._frames[0][0]
        rays = sum(r for _, r in list(self._frames)[1:])
        return rays / span / 1e6 if span > 0 else 0.0


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """Wrap a block in a jax.profiler trace when a log dir is given
    (view with TensorBoard/XProf); no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
