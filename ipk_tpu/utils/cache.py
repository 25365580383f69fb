"""Persistent XLA compilation cache setup.

First-time compiles through remote TPU runtimes cost tens of seconds per
distinct shape; the persistent cache makes repeat CLI invocations (same k,
alphabet, similar tensor shapes) start hot. Safe no-op if jax rejects the
options (older versions) — caching is an optimization, never a requirement.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    if os.environ.get("IPK_TPU_NO_COMPILE_CACHE"):
        return
    cache_dir = (cache_dir or os.environ.get("IPK_TPU_COMPILE_CACHE")
                 or os.path.expanduser("~/.cache/ipk_tpu/xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
