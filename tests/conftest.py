"""Test environment: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated without real hardware by asking XLA's host
platform for 8 fake devices (the same mechanism the driver's
``dryrun_multichip`` uses).  The axon TPU plugin in this image overrides
JAX_PLATFORMS, so the platform is forced via jax.config as well.  Must run
before any test imports jax-backed modules.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# No persistent XLA compilation cache under pytest: cli.py enables it at
# import (tests that import the CLI switch it on for the whole process),
# and a zstandard compress inside jax's cache WRITE path segfaulted a
# full-suite run (compilation_cache.put_executable_and_time, 2026-08-20).
# Tests only compile tiny CPU programs -- the cache buys nothing here.
os.environ["SEQALIGN_NO_COMPILE_CACHE"] = "1"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, jax.devices()


# ---------------------------------------------------------------------------
# Compiler-state guard: a ~300-test single-process run accumulates enough
# XLA CPU backend state that `backend_compile_and_load` segfaulted three
# times at the same late-suite WFA compile (2026-08-20) while every
# sub-suite passes in isolation (RSS stayed < 4 GB, so it is compiler
# state, not memory pressure).  Dropping jax's in-memory caches at every
# MODULE boundary keeps each module's compiles in a near-fresh process
# regime; cross-module executable reuse is rare, so the cost is small.

try:  # deep LLVM passes near the thread stack limit are a known SIGSEGV
    import resource

    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    if _soft != resource.RLIM_INFINITY and (
        _hard == resource.RLIM_INFINITY or _hard > _soft
    ):
        resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
except Exception:
    pass


def pytest_runtest_teardown(item, nextitem):
    if nextitem is None or item.module is not getattr(
        nextitem, "module", None
    ):
        import gc

        jax.clear_caches()
        gc.collect()
