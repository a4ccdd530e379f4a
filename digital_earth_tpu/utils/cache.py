"""Persistent XLA compilation cache.

The render step's first compile costs minutes (BENCH_r02 measured 125 s of
warmup at 1080p); the reference hides the same cost behind Taichi's
``offline_cache=True`` (reference earth_viewer.py:168). This is the JAX
equivalent: executables are serialized to a cache directory keyed by HLO +
compile flags + backend, so every process after the first pays only the
deserialize cost (seconds).

Call ``enable_compilation_cache()`` before the first jit dispatch. All entry
points (bench.py, main.py, the viewer, tools/) do so; it is opt-out via
``DE_NO_COMPILE_CACHE=1`` (and a custom location via ``DE_COMPILE_CACHE``).
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX at a persistent on-disk compilation cache; returns the
    directory used (None when disabled via DE_NO_COMPILE_CACHE)."""
    if os.environ.get("DE_NO_COMPILE_CACHE"):
        return None
    if cache_dir is None:
        cache_dir = os.environ.get("DE_COMPILE_CACHE", DEFAULT_CACHE_DIR)
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that takes noticeable compile time, not only the
    # multi-minute frame executables
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
