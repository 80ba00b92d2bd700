"""Utility helpers (compilation cache, timing)."""

from seganygaussians_tpu.utils.jit_cache import enable_persistent_cache

__all__ = ["enable_persistent_cache"]
