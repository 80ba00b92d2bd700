"""Persistent XLA compilation cache setup.

Compilation requests through the remote-TPU relay are very slow (tens of
seconds each, measured), and the Mosaic blend kernels + the full-pipeline AD
graph take minutes to compile cold.  A persistent on-disk cache makes every
re-run (tests, bench, training restarts) start in seconds instead of minutes.

Call :func:`enable_persistent_cache` before the first ``jax.jit`` execution.
"""

from __future__ import annotations

import os

# Derived, machine-specific data — keep it OUT of the repo checkout by
# default (under ~/.cache) so it never lands in version control.
_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "seganygaussians_tpu", "jax_cache"
)


def enable_persistent_cache(path: str | None = None) -> str:
    """Enable the on-disk XLA compilation cache (idempotent)."""
    import jax

    cache_dir = os.path.abspath(path or os.environ.get("SAGA_JIT_CACHE", _DEFAULT_DIR))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything non-trivial: the relay makes even small compiles slow.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
