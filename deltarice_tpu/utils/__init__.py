"""Utilities: compilation caching, chunk batching helpers, profiling."""

from .cache import enable_persistent_cache
from .timing import Timer

__all__ = ["enable_persistent_cache", "Timer"]
