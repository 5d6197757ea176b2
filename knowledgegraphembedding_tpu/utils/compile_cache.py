"""Persistent XLA compilation cache, shared by every entry point.

A fresh process pays tens of seconds per jit compile on a remote-dispatch
runtime; the CLI, bench.py, and ad-hoc scripts all cache compiled
executables in ONE directory so they reuse each other's work.
"""

from __future__ import annotations

import os

import jax

CACHE_DIR = "~/.cache/kge_tpu_jax"


def enable() -> None:
    """Idempotent: respects an explicitly-configured cache dir."""
    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser(CACHE_DIR)
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
