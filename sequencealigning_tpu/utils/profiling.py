"""Profiling hooks: jax.profiler traces + simple phase timers (SURVEY.md §5
-- the reference's only instrumentation is wall-clock prints).

Usage:
    with trace("/tmp/trace"):          # TensorBoard-viewable device trace
        runner.scores(batch)

    with phase_timer() as t:
        ...
    t.report()                          # per-phase wall seconds to stderr
"""

from __future__ import annotations

import contextlib
import sys
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """jax.profiler device trace into logdir (no-op if logdir is falsy)."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"[profile] trace written to {logdir}", file=sys.stderr)


class PhaseTimer:
    def __init__(self) -> None:
        self.phases: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = (
                self.phases.get(name, 0.0) + time.perf_counter() - t0
            )

    def report(self, file=sys.stderr) -> None:
        for name, s in sorted(self.phases.items(), key=lambda kv: -kv[1]):
            print(f"[profile] {name}: {s:.3f}s", file=file)


@contextlib.contextmanager
def phase_timer() -> Iterator[PhaseTimer]:
    t = PhaseTimer()
    yield t
