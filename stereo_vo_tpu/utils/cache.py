"""Persistent-compilation-cache setup shared by every entry point.

Remote-attached TPU compiles run 30-400 s; the persistent cache makes repeat
runs start in seconds. Centralized here (ADVICE r3: smoke.py hardcoded an
absolute /root path that breaks for non-root users / CI hosts): the directory
is ``$JAX_COMPILATION_CACHE_DIR`` when set, else ``~/.jax_cache``.
"""

from __future__ import annotations

import os


def setup_compilation_cache() -> str | None:
    """Configure jax's persistent compilation cache; returns the dir or None."""
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".jax_cache"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        return None
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
