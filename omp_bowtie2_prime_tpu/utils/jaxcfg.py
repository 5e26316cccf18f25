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
    # BT2TPU_CACHE_READONLY=1: reads hit, writes never happen.  Long
    # one-process runs (the full test suite) segfault INSIDE
    # executable.serialize() on the cache-write path
    # (jax compilation_cache.put_executable_and_time) once enough
    # executables have accumulated — reproduced on BOTH the axon TPU
    # backend and plain CPU at ~35% of tests/, while the same tests pass
    # in isolation (state-dependent jaxlib fault, not ours).  Raising
    # the min-compile-time gate above any real compile keeps the
    # serialize call from ever running; tests/conftest.py sets this.
    if os.environ.get("BT2TPU_NO_COMPILE_CACHE") == "1":
        _done = True  # hard fallback: no cache I/O at all
        return
    readonly = os.environ.get("BT2TPU_CACHE_READONLY") == "1"
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            1e18 if readonly else 0.5,
        )
    except Exception:
        pass  # older jax or read-only fs: run without the cache
    _done = True
