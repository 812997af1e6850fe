"""Persistent XLA/Mosaic compilation cache for benchmark entry points.

Remote-tunneled compiles cost seconds each and benchmark runs compile
dozens of scan-wrapped kernel programs; the persistent cache makes every
rerun (including the driver's end-of-round bench) start warm.
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> None:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.abspath(path or DEFAULT_DIR),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
