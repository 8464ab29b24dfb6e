"""Profiling and observability helpers.

The reference has no tracing at all (performance numbers came from external
wall-clock scripts). Here profiling is first-class: a context manager wraps
``jax.profiler`` for device traces, and a relay-safe throughput measurement
utility implements the methodology documented in docs/Performance.md.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/deltarice_tpu_trace"):
    """Capture a jax.profiler device trace around a block (view with
    TensorBoard or xprof). Falls back to a no-op if the backend doesn't
    support tracing."""
    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        pass
    try:
        yield logdir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def sync_cost(iters: int = 10) -> float:
    """Measured cost of one host<->device synchronization (seconds)."""
    tiny = jnp.ones((8, 128), jnp.int32)
    f = jax.jit(lambda a: jnp.sum(a))
    float(f(tiny)[()])
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(tiny)[()])
    return (time.perf_counter() - t0) / iters


def throughput(fn, *args, nbytes: int, iters: int = 20,
               sync: float | None = None) -> dict:
    """Relay-safe throughput of a jitted thunk: queue ``iters`` dispatches,
    force one scalar readback, subtract the sync cost, divide.

    Returns {"seconds_per_call", "gbps"}. See docs/Performance.md for why
    naive ``block_until_ready`` timing is wrong in relay environments.
    """
    if sync is None:
        sync = sync_cost()
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    last = outs[-1]
    v = last[0] if isinstance(last, (tuple, list)) else last
    float(jnp.sum(v.astype(jnp.int32))[()])
    dt = max(time.perf_counter() - t0 - sync, 1e-9) / iters
    return {"seconds_per_call": dt, "gbps": nbytes / dt / 1e9}
