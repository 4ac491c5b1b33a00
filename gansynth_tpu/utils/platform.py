"""Platform/runtime helpers."""

from __future__ import annotations

import os


def enable_compile_cache(directory: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache.

    Compilation dominates iteration time on remote-compile TPU backends
    (minutes per new graph on this machine's tunnel); the persistent cache
    cuts warm restarts to seconds. Honors ``JAX_COMPILATION_CACHE_DIR``;
    defaults to a scratch directory.
    """
    import jax

    directory = (
        directory
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or "/tmp/gansynth_tpu_xla_cache"
    )
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return directory
