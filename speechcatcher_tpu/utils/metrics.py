"""Serving metrics: per-tick latency histogram, RTF, active streams.

The reference has no runtime telemetry (SURVEY §5.5); these counters are the
north-star numbers (BASELINE.md): streams at real time and p50 chunk latency.
"""

from __future__ import annotations

import time
from collections import deque
from typing import Dict

import numpy as np


class ServingMetrics:
    def __init__(self, chunk_seconds: float, window: int = 256):
        self.chunk_seconds = chunk_seconds
        self.tick_latencies = deque(maxlen=window)
        self.active_streams = 0
        self.total_ticks = 0
        self.total_finals = 0
        self._tick_start = 0.0

    def tick_begin(self, active_streams: int):
        self.active_streams = active_streams
        self._tick_start = time.perf_counter()

    def tick_end(self):
        self.tick_latencies.append(time.perf_counter() - self._tick_start)
        self.total_ticks += 1

    def finalized(self):
        self.total_finals += 1

    def snapshot(self) -> Dict[str, float]:
        lat = np.asarray(self.tick_latencies) if self.tick_latencies else (
            np.zeros(1)
        )
        return {
            "active_streams": self.active_streams,
            "tick_p50_ms": float(np.percentile(lat, 50) * 1e3),
            "tick_p95_ms": float(np.percentile(lat, 95) * 1e3),
            "rtf": float(np.percentile(lat, 50) / self.chunk_seconds),
            "total_ticks": self.total_ticks,
            "total_finals": self.total_finals,
        }


def start_profiler_trace(logdir: str = "/tmp/speechcatcher_tpu_trace"):
    """jax.profiler trace for kernel-level analysis (SURVEY §5.1)."""
    import jax

    jax.profiler.start_trace(logdir)
    return logdir


def stop_profiler_trace():
    import jax

    jax.profiler.stop_trace()
