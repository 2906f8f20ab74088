"""Persistent XLA compilation cache setup (shared by entry scripts)."""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> str:
    """Point jax at a persistent compilation cache directory.

    The dev TPU is tunnel-attached and compile RPCs can stretch to
    minutes in bad windows; cached executables make reruns immune.
    Safe to call before or after backend init (config-only).  The env
    var ``CLIMSIM_COMPILE_CACHE`` overrides the default path.
    """
    import jax

    path = path or os.environ.get("CLIMSIM_COMPILE_CACHE",
                                  "/tmp/climsim_jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
