"""Persistent XLA compilation cache.

Remote TPU compiles of the generation program cost minutes; the persistent
cache cuts warm starts to seconds.  Best-effort: harmless when the backend
ignores it.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compilation_cache(cache_dir: str | None = None) -> bool:
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir", cache_dir or DEFAULT_CACHE_DIR
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        return True
    except Exception:
        return False
