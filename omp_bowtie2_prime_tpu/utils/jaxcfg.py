"""JAX runtime config: persistent compilation cache.

Device kernels here have a handful of fixed shapes, so caching compiled
executables across processes removes nearly all startup latency (analogous
to the reference paying index-load cost once via --mm/--shmem,
mm.h/shmem.h).
"""

from __future__ import annotations

import os

_done = False


def enable_compile_cache(path: str | None = None) -> None:
    global _done
    if _done:
        return
    import jax

    cache = path or os.environ.get("BT2TPU_COMPILE_CACHE", "/tmp/bt2tpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax or read-only fs: run without the cache
    _done = True
