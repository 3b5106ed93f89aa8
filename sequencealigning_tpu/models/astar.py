"""Weighted-A* aligner.

Reference: align (src/align.rs:19-57).  The search itself is inherently
sequential heap-driven host work (kept bit-exact in ops.oracle_astar,
including Rust BinaryHeap pop order); the TPU-scale equivalent is
models.banded.BandedAligner (fixed corridor instead of a heap frontier).

The reference's main always calls align() with local=false regardless of
--mode (src/main.rs:64); compat mode reproduces that.  With compat=False,
Mode.SEMI_GLOBAL selects the free-end-gaps expansion (align.rs:59-123)."""

from __future__ import annotations

import os
from typing import List, Tuple

from sequencealigning_tpu.config import Mode
from sequencealigning_tpu.errors import AlignerError, AlignmentError
from sequencealigning_tpu.models.base import Aligner
from sequencealigning_tpu.ops.oracle_astar import astar_align


class AStarAligner(Aligner):
    def _astar_one(self, s1: bytes, s2: bytes, semi: bool):
        """Native C search when available (bit-identical heap order,
        fuzz-pinned in tests/test_native.py; ~2 orders of magnitude the
        Python oracle's speed), Python oracle otherwise."""
        sch = self.config.scoring
        if not os.environ.get("SEQALIGN_NO_NATIVE"):
            try:
                from sequencealigning_tpu import native

                r = native.astar_align_native(
                    s1, s2, sch.match_, sch.mismatch, sch.gap_open,
                    sch.gap_extend, sch.epsilon, semi_global=semi,
                )
                if r is not None:
                    return r
            except AlignmentError:
                raise  # search-semantics failure, same as the oracle's
            except Exception:
                pass  # library/load anomaly: fall back
        return astar_align(s1, s2, scheme=sch, semi_global=semi)

    def _align_batch_impl(self, pairs: List[Tuple[bytes, bytes]]):
        if self.config.compat:
            semi = False  # main.rs:64 hardcodes local=false
        else:
            semi = self.config.mode is Mode.SEMI_GLOBAL
        out = []
        for s1, s2 in pairs:
            try:
                score, a1, a2 = self._astar_one(s1, s2, semi)
                out.append(dict(score=score, aligned_query=a1, aligned_db=a2))
            except AlignerError as e:
                out.append(e)
        return out
