"""Persistent XLA compilation cache.

TPU compiles are expensive (and on tunneled devices, very expensive);
every CLI/bench entry point enables the on-disk cache so recompiles are
paid once per program shape, not once per process.
"""

from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.environ.get("MVRECON_JAX_CACHE", "/root/.jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    jax.config.update("jax_compilation_cache_dir", cache_dir or DEFAULT_CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
