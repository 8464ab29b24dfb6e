"""Wall-clock timing helper for benchmarks (device-synchronizing)."""

from __future__ import annotations

import time

import jax


class Timer:
    """Measure steady-state device time of a thunk.

    Dispatches ``iters`` calls and blocks once at the end, so the result is
    true device throughput (not per-call host overhead) once warm.
    """

    def __init__(self, warmup: int = 2, iters: int = 10):
        self.warmup = warmup
        self.iters = iters

    def measure(self, fn, *args) -> float:
        for _ in range(self.warmup):
            jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(self.iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / self.iters
