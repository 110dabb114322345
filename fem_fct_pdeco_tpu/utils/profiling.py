"""Timers and memory telemetry.

The reference's observability is wall-clock "Sim. duration" rows
(Schnak_FCT_PDECO_refactored.py:156,250-251) and a psutil RSS print
(advection_solidbody_FCT_PDECO_alltime.py:398-404). This module provides
per-phase timers, host RSS, device memory stats, and a hook into the JAX
profiler for TPU traces.
"""

from __future__ import annotations

import contextlib
import time


class Timer:
    """Accumulating named phase timers.

    >>> t = Timer()
    >>> with t.phase("state_solve"): ...
    >>> t.summary()
    """

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}
        self._start = time.time()

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    @property
    def elapsed(self) -> float:
        return time.time() - self._start

    def summary(self) -> dict:
        return {
            name: {"total_s": round(tot, 4), "calls": self.counts[name]}
            for name, tot in sorted(self.totals.items(), key=lambda kv: -kv[1])
        }


def host_memory_mb() -> float:
    import psutil

    return psutil.Process().memory_info().rss / 2**20


def device_memory_stats() -> dict:
    import jax

    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            if s:
                out[str(d)] = {
                    "bytes_in_use": s.get("bytes_in_use"),
                    "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                }
        except Exception:
            pass
    return out


@contextlib.contextmanager
def jax_trace(log_dir: str):
    """Capture a JAX/XLA profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
