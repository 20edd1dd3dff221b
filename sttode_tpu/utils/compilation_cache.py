"""Persistent XLA/Mosaic compilation cache.

This environment compiles TPU programs through a remote-compile relay — a
trivial Pallas kernel costs ~5 minutes of compile wall-clock. The persistent
cache amortizes that across processes/runs: first build pays, every later run
(bench, CLIs, driver checks) hits the cache.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.environ.get("STTODE_JAX_CACHE",
                             os.path.expanduser("~/.cache/sttode_jax"))


def enable(cache_dir: str = DEFAULT_DIR) -> None:
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
