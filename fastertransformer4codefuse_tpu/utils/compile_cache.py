"""Persistent XLA compilation cache for TPU tools and benches.

Compiles over the axon tunnel cost minutes; the persistent cache makes every
re-run of an unchanged program (bench configs, smoke tests, kernel sweeps)
start in seconds. Mosaic kernels are covered too: the serialized kernel MLIR
is part of the HLO custom call, so it keys (and caches) with the executable.

Library code must NOT enable this implicitly — only entry points (bench.py,
tools/*) opt in.
"""
from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/ftcf_jax_cache")


def enable(cache_dir: str = DEFAULT_DIR) -> None:
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything, even fast compiles — the tunnel round-trip dominates
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
