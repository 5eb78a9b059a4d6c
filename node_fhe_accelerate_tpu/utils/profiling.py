"""Profiling, tracing and memory utilities.

The reference's observability is its benchmark infrastructure
(comprehensive_benchmark.h:271-300) plus a memory optimizer
(memory_optimizer.h:63-323: aligned buffers, pools, bandwidth measurement).
The TPU equivalents here:

* `trace(path)`: context manager around jax.profiler for XLA/TPU traces
  (SURVEY.md §5.1's prescribed replacement).
* `device_memory_stats()`: per-device HBM usage via the PJRT allocator
  (the unified-memory-pool introspection analog).
* `Timer`: lightweight scoped timer with block_until_ready semantics.
* `live_array_bytes()`: total bytes of live device arrays (leak hunting —
  the FHEMemoryPool accounting analog).
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax

__all__ = ["trace", "device_memory_stats", "Timer", "live_array_bytes"]


@contextlib.contextmanager
def trace(path: str):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> list:
    """Per-device allocator stats (bytes_in_use etc.) where the backend
    exposes them; empty dict per device otherwise."""
    out = []
    for d in jax.devices():
        stats = {}
        try:
            stats = dict(d.memory_stats() or {})
        except Exception:
            pass
        out.append({"device": str(d), "stats": stats})
    return out


def live_array_bytes() -> int:
    """Sum of nbytes over live device arrays."""
    total = 0
    for arr in jax.live_arrays():
        try:
            total += arr.nbytes
        except Exception:
            pass
    return total


@dataclass
class Timer:
    """Scoped timer that waits for device completion."""
    label: str = ""
    elapsed_s: float = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed_s = time.perf_counter() - self._t0
        return False

    @staticmethod
    def time_blocked(thunk, iters: int = 1) -> float:
        out = thunk()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = thunk()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters
