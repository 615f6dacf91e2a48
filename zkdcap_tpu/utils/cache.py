"""Persistent XLA compile-cache management (VERDICT r03 items 1/7).

The axon remote compiler costs minutes per large program and its
persistent-cache writes have been observed to flake, so every entry point
(CLI, scripts, bench) must (a) enable the cache and (b) be able to tell
whether a compile actually landed in it. The TPU cache dir is separate
from the CPU suite's (.jax_cache vs .jax_cache_cpu — XLA:CPU AOT entries
embed host CPU features and segfault when migrated, see tests/conftest.py).
"""

from __future__ import annotations

import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cache_dir() -> str:
    import jax

    backend = jax.default_backend()
    name = ".jax_cache_cpu" if backend == "cpu" else ".jax_cache"
    return os.path.join(REPO_ROOT, name)


def enable_persistent_cache() -> str:
    """Enable the persistent compile cache (idempotent). Returns the dir."""
    import jax

    d = cache_dir()
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return d


def cache_stat(d: str | None = None) -> tuple[int, int]:
    """(entry_count, total_bytes) of the cache dir."""
    d = d or cache_dir()
    try:
        names = os.listdir(d)
        return len(names), sum(os.path.getsize(os.path.join(d, f)) for f in names)
    except OSError:
        return 0, 0
