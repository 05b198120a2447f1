"""Runtime setup helpers: persistent compilation cache.

First compiles on the tunneled TPU backend take minutes; the persistent
cache makes every subsequent process start instant for unchanged programs.
Called by the CLI entry points before heavy jax use.
"""

from __future__ import annotations

import os


def setup_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_cache")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never fatal
