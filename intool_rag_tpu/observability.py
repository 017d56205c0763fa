"""Tracing, phase timing, and metrics.

The reference has only ad-hoc wall-clock logging (SURVEY.md §5.1) and no
metrics export (§5.5). Here:

- :func:`trace_phase` — wall-clock phase timer that also opens a
  ``jax.profiler.TraceAnnotation`` so phases show up in TPU profiles.
- :class:`Metrics` — in-process counters + rolling latency windows with
  p50/p95/p99, exported by the service at ``GET /metrics``.
- :func:`start_device_trace` / ``stop_device_trace`` — wrap
  ``jax.profiler`` for on-demand device traces.
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict, deque

from .logging import get_logger

logger = get_logger(__name__)


class Metrics:
    def __init__(self, window: int = 512) -> None:
        self._counters: dict[str, int] = defaultdict(int)
        self._latencies: dict[str, deque] = defaultdict(lambda: deque(maxlen=window))
        self._lock = threading.Lock()

    def inc(self, name: str, value: int = 1) -> None:
        with self._lock:
            self._counters[name] += value

    def observe(self, name: str, seconds: float) -> None:
        with self._lock:
            self._latencies[name].append(seconds)

    @staticmethod
    def _percentile(values: list[float], p: float) -> float:
        """Nearest-rank percentile."""
        if not values:
            return 0.0
        import math

        values = sorted(values)
        idx = max(0, min(math.ceil(p * len(values)) - 1, len(values) - 1))
        return values[idx]

    def snapshot(self) -> dict:
        with self._lock:
            out: dict = {"counters": dict(self._counters), "latency_s": {}}
            for name, window in self._latencies.items():
                vals = list(window)
                out["latency_s"][name] = {
                    "count": len(vals),
                    "p50": round(self._percentile(vals, 0.50), 6),
                    "p95": round(self._percentile(vals, 0.95), 6),
                    "p99": round(self._percentile(vals, 0.99), 6),
                    "mean": round(sum(vals) / len(vals), 6) if vals else 0.0,
                }
            return out


_metrics = Metrics()


def get_metrics() -> Metrics:
    return _metrics


@contextlib.contextmanager
def trace_phase(name: str, metrics: Metrics | None = None):
    """Time a phase; shows up in logs, metrics, and device profiles."""
    import jax.profiler

    metrics = metrics or _metrics
    start = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    elapsed = time.perf_counter() - start
    metrics.observe(name, elapsed)
    logger.debug("phase %s: %.3fs", name, elapsed)


def start_device_trace(log_dir: str) -> None:
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    logger.info("device trace started → %s", log_dir)


def stop_device_trace() -> None:
    import jax.profiler

    jax.profiler.stop_trace()
    logger.info("device trace stopped")
