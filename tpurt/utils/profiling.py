"""Profiling / observability helpers (SURVEY.md §5: the reference has only
an event-loop frame-time measurement, lib.rs:78-84; the rebuild exposes
structured per-frame stats and real profiler traces).

  * trace(dir): context manager around jax.profiler — view in XProf /
    TensorBoard. Wrap any render call to get per-kernel device timelines.
  * FrameStats: running frame-time / rays-per-second tracker used by
    viewer.py and available to library users.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tpurt-trace"):
    """Capture a device profile of the enclosed block.

    with profiling.trace("/tmp/t"):
        state = render(scene, cfg, cam, state, seed, 64)
        jax.block_until_ready(state)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class FrameStats:
    """Running mean/min/max frame time + throughput from the ray counter."""

    def __init__(self):
        self.n = 0
        self.total = 0.0
        self.min = float("inf")
        self.max = 0.0
        self._t0 = None
        self._rays0 = 0.0
        self.mrays_per_s = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, rays_total: float | None = None):
        dt = time.perf_counter() - self._t0
        self.n += 1
        self.total += dt
        self.min = min(self.min, dt)
        self.max = max(self.max, dt)
        if rays_total is not None:
            self.mrays_per_s = (rays_total - self._rays0) / dt / 1e6
            self._rays0 = rays_total
        return dt

    @property
    def mean(self) -> float:
        return self.total / max(self.n, 1)

    def summary(self) -> str:
        return (f"{self.n} frames: mean {self.mean * 1e3:.2f} ms, "
                f"min {self.min * 1e3:.2f} ms, max {self.max * 1e3:.2f} ms"
                + (f", {self.mrays_per_s:.1f} Mrays/s" if self.mrays_per_s else ""))
