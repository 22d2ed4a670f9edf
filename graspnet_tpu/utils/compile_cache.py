"""Persistent XLA compilation cache.

First compilation of the serving/training programs costs seconds to minutes
per process launch (the reference pays the analogous torch-extension JIT
build once at install time).  Enabling jax's persistent cache makes every
entry point after the first launch start in ~100 ms of cache reads instead.

Called by every app/bench entry point before the first jit; opt out with
GRASPNET_COMPILE_CACHE=off, override the location with
GRASPNET_COMPILE_CACHE=/path.
"""

from __future__ import annotations

import os

_configured: str | None = None  # the dir jax_compilation_cache_dir points at


def enable(path: str | None = None) -> str | None:
    """Idempotently point jax at an on-disk compilation cache.

    Returns the cache dir actually in effect, or None when disabled /
    unavailable.  Calling again with a different explicit `path`
    reconfigures jax to that dir (so the return value always reflects
    jax_compilation_cache_dir, never a stale argument).
    """
    global _configured
    env = os.environ.get("GRASPNET_COMPILE_CACHE")
    if env == "off" or os.environ.get("GRASPNET_TPU_NO_COMPILE_CACHE"):
        return None
    path = path or env or _configured or os.path.expanduser("~/.cache/graspnet_tpu/xla")
    if _configured is not None and path == _configured:
        return _configured
    try:
        import jax

        if env is None and _configured is None and jax.default_backend() == "cpu":
            # CPU AOT cache entries embed exact machine features and can
            # SIGILL when reloaded on a different host; CPU compiles are
            # also fast enough not to need it.  Opt in explicitly via
            # GRASPNET_COMPILE_CACHE=<dir> when the tradeoff is wanted.
            return None
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took meaningful compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _configured = path
        return path
    except Exception:
        return None
