"""Weighted-A* aligner.

Reference: align (src/align.rs:19-57).  The search itself is inherently
sequential heap-driven host work (kept bit-exact in ops.oracle_astar,
including Rust BinaryHeap pop order); the TPU-scale equivalent is
models.banded.BandedAligner (fixed corridor instead of a heap frontier).

The reference's main always calls align() with local=false regardless of
--mode (src/main.rs:64); compat mode reproduces that.  With compat=False,
Mode.SEMI_GLOBAL selects the free-end-gaps expansion (align.rs:59-123)."""

from __future__ import annotations

from typing import List, Tuple

from sequencealigning_tpu.config import Mode
from sequencealigning_tpu.errors import AlignerError
from sequencealigning_tpu.models.base import Aligner
from sequencealigning_tpu.ops.oracle_astar import astar_align


class AStarAligner(Aligner):
    def _align_batch_impl(self, pairs: List[Tuple[bytes, bytes]]):
        if self.config.compat:
            semi = False  # main.rs:64 hardcodes local=false
        else:
            semi = self.config.mode is Mode.SEMI_GLOBAL
        out = []
        for s1, s2 in pairs:
            try:
                score, a1, a2 = astar_align(
                    s1, s2, scheme=self.config.scoring, semi_global=semi
                )
                out.append(dict(score=score, aligned_query=a1, aligned_db=a2))
            except AlignerError as e:
                out.append(e)
        return out
