"""Profiling & observability.

The reference's tracing is host-side only: a stats.js FPS/ms panel
(``renderer.js:145-150``), a rolling frame-time average logged every 100
frames behind ``logPerformance`` (``renderer.js:197-204``), a sample-count
log (``renderer.js:169-170``), and BVH build timers
(``lib/BVH/bvhBuilder.js:8-29``).  TPU equivalents here: a rays/s meter with
rolling statistics, a ``jax.profiler`` trace context for device timelines,
and a speed-of-light estimator from compiled cost analysis (SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional

import jax


class FrameStats:
    """Rolling frame-time / rays-per-second meter (stats.js equivalent)."""

    def __init__(self, window: int = 100):
        self.times = deque(maxlen=window)
        self.frames = 0
        self._t0: Optional[float] = None

    def begin(self):
        self._t0 = time.perf_counter()

    def end(self):
        if self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
            self.frames += 1
            self._t0 = None

    @property
    def avg_ms(self) -> float:
        return 1e3 * sum(self.times) / len(self.times) if self.times else 0.0

    @property
    def fps(self) -> float:
        avg = self.avg_ms
        return 1e3 / avg if avg > 0 else 0.0

    def mrays_per_s(self, rays_per_frame: int) -> float:
        avg = self.avg_ms
        return rays_per_frame / (avg * 1e-3) / 1e6 if avg > 0 else 0.0

    def report(self, rays_per_frame: int) -> str:
        """One-line log mirroring renderer.js:197-204's periodic output."""
        return (f"frames={self.frames} avg={self.avg_ms:.2f}ms "
                f"fps={self.fps:.1f} "
                f"throughput={self.mrays_per_s(rays_per_frame):.1f} Mray/s")


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/tpt_trace"):
    """jax.profiler trace context — inspect with TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def cost_summary(jitted_fn, *args) -> dict:
    """Compiled-HLO cost analysis: flops / bytes / transcendentals plus
    speed-of-light estimates.  Peak numbers default to TPU v5e
    (394 TFLOP/s bf16 / ~98 f32 VPU, 819 GB/s HBM)."""
    compiled = jitted_fn.lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_accessed = float(ca.get("bytes accessed", 0.0))
    return {
        "flops": flops,
        "bytes_accessed": bytes_accessed,
        "transcendentals": float(ca.get("transcendentals", 0.0)),
        "sol_compute_us_f32": flops / 98e12 * 1e6,
        "sol_memory_us": bytes_accessed / 819e9 * 1e6,
    }
