"""Persistent XLA compilation cache.

The full CODONNet compile is ~10-40s on TPU; enabling the on-disk cache makes
every process after the first start hot. Call before the first jit.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/codon_tpu_xla")


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    import jax
    d = cache_dir or os.environ.get("CODON_TPU_XLA_CACHE", _DEFAULT_DIR)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
