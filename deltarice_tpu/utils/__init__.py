"""Utilities: compilation caching, chunk batching helpers, profiling."""

from .cache import enable_persistent_cache
from .profiling import device_trace, sync_cost, throughput

__all__ = [
    "enable_persistent_cache",
    "device_trace",
    "sync_cost",
    "throughput",
]
