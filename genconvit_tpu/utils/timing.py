"""Per-stage timing — the framework's tracing hook (SURVEY.md §5: the
reference only wall-clocks whole runs; we break out decode / detect /
preprocess / device-forward and surface the totals in the v2 result metadata).

Thread-safe accumulators; near-zero overhead when disabled.
"""

from __future__ import annotations

import contextlib
import threading
import time
from typing import Dict, Optional


class StageTimers:
    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self._lock = threading.Lock()
        self._total: Dict[str, float] = {}
        self._count: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self._total[name] = self._total.get(name, 0.0) + dt
                self._count[name] = self._count.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        with self._lock:
            return {
                name: {
                    "total_seconds": round(self._total[name], 4),
                    "count": self._count[name],
                    "mean_ms": round(1000 * self._total[name] / self._count[name], 2),
                }
                for name in sorted(self._total)
            }

    def reset(self) -> None:
        with self._lock:
            self._total.clear()
            self._count.clear()


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """Optional jax.profiler trace around a region (TPU timeline in
    TensorBoard format). No-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
