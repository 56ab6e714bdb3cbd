"""Persistent XLA compilation cache setup.

Kernels compile in minutes through the tunneled TPU; cached reloads take
seconds. This JAX build ignores the JAX_COMPILATION_CACHE_DIR env var, so the
directory must be set through jax.config explicitly — call
enable_compilation_cache() before the first compile.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = Path(__file__).resolve().parent.parent.parent / ".jax_cache"


def enable_compilation_cache(path: str | os.PathLike | None = None) -> None:
    import jax

    cache_dir = str(
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.environ.get("NEXTSEARCH_COMPILE_CACHE")
        or _DEFAULT
    )
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
