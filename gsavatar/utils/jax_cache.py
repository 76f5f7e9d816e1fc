"""Persistent XLA compilation cache setup shared by every entry point.

The full train-step graph takes minutes to compile on a tunneled TPU
backend; caching compiled executables on disk makes reruns near-instant.
Called by train/evaluate/bench mains (idempotent)."""
from __future__ import annotations

import os

_DONE = False


def setup_cache(cache_dir: str | None = None) -> str:
    global _DONE
    import jax
    cache_dir = cache_dir or os.environ.get(
        'GSAVATAR_JAX_CACHE',
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), '.jax_cache'))
    if not _DONE:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        _DONE = True
    return cache_dir
