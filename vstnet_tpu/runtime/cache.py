"""Persistent XLA compilation cache.

The reference's GGML engine rebuilds its graph per call by design
(ggml_engine.h:473-475); the XLA equivalent of "fast startup" is a
persistent compiled-executable cache keyed by HLO hash. Enabling it turns
the ~4-minute first-compile of the fused training step into a disk hit on
every later process launch (CLI runs, bench runs, tests on TPU).
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_persistent_cache(path: str | None = None):
    """Idempotently point JAX at an on-disk compilation cache."""
    global _ENABLED
    if _ENABLED:
        return
    import jax

    cache_dir = path or os.environ.get(
        "VSTNET_TPU_CACHE", os.path.expanduser("~/.cache/vstnet_tpu/xla")
    )
    if cache_dir in ("", "off", "0", "none"):
        # Opt-out switch (VSTNET_TPU_CACHE=off). The test suite uses it:
        # XLA's deserialize_executable can abort a long-lived CPU-backend
        # process on a cache-hit read late in a large suite (observed
        # SIGABRT at the same test in three full-suite runs, while the
        # identical program compiles AND cache-reads fine in a fresh
        # process) — caching is an optimization, never worth the process.
        _ENABLED = True
        return
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _ENABLED = True
    except Exception:
        pass  # older jax without the knobs — caching is an optimization only
