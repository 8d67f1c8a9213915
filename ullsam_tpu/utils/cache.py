"""Persistent XLA compilation cache (works through the axon remote
compiler; measured 44s -> 14s process-to-process for a repeated jit)."""

from __future__ import annotations

import os


def enable_compilation_cache(directory: str | None = None) -> None:
    import jax

    directory = directory or os.environ.get(
        "ULLSAM_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
