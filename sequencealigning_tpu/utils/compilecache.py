"""Persistent XLA compilation cache bootstrap.

Verified to work through the remote (axon) compile helper on this rig:
warm kernel compiles drop from minutes to ~2 s across processes.  Affects
compile time only -- never kernel timings -- so every bench/tool process
should call enable() before importing jax.
"""

from __future__ import annotations

import os


def enable(path: str | None = None) -> str:
    """Set JAX_COMPILATION_CACHE_DIR (if not already set) and return it.

    If jax was already imported (the env var is only read at import),
    also point jax.config at the directory so late enabling still works
    (the CLI calls this after module imports pulled jax in)."""
    import sys

    if os.environ.get("SEQALIGN_NO_COMPILE_CACHE"):
        # Opt-out (tests set this: a zstandard compress inside jax's
        # cache-write path segfaulted a full-suite run; the cache only
        # affects compile time, never results).
        return ""
    path = path or os.path.expanduser("~/.cache/seqalign_jax")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    effective = os.environ["JAX_COMPILATION_CACHE_DIR"]
    jax = sys.modules.get("jax")
    if jax is not None and not jax.config.jax_compilation_cache_dir:
        jax.config.update("jax_compilation_cache_dir", effective)
    return effective
