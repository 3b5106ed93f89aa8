"""Persistent XLA compilation cache bootstrap.

Verified to work through the remote (axon) compile helper on this rig:
warm kernel compiles drop from minutes to ~2 s across processes.  Affects
compile time only -- never kernel timings -- so every bench/tool process
should call enable() before importing jax.
"""

from __future__ import annotations

import os


def enable(path: str | None = None) -> str:
    """Set JAX_COMPILATION_CACHE_DIR (if not already set) and return it."""
    path = path or os.path.expanduser("~/.cache/seqalign_jax")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    return os.environ["JAX_COMPILATION_CACHE_DIR"]
