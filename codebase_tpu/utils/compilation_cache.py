"""Persistent XLA compilation cache.

First-compile latency through the remote TPU toolchain is high and variable;
caching compiled executables on disk makes repeat runs (sweeps, benchmarks,
resumed training) start in seconds. Call `enable()` once per entry point
before the first jitted computation.
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.expanduser("~/.cache/codebase_tpu_xla")


def enable(cache_dir: str | None = None) -> None:
    cache_dir = cache_dir or os.environ.get("CODEBASE_TPU_CACHE", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
