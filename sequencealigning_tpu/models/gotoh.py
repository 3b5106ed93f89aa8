"""Affine-gap NW (Gotoh) aligner -- the flagship model family.

Reference: n_w_align (src/needleman_wunsch_affine.rs:424-437).  Global mode
runs the batched TPU fill (ops.nw_affine) + host co-optimal traceback;
Local/SemiGlobal raise "not implemented" exactly like the reference
(:433-434)."""

from __future__ import annotations

from typing import List, Tuple

from sequencealigning_tpu.config import Mode
from sequencealigning_tpu.errors import AlignerError, AlignmentError
from sequencealigning_tpu.io.encode import pack_batch
from sequencealigning_tpu.models.base import Aligner
from sequencealigning_tpu.ops.nw_affine import nw_affine_batch
from sequencealigning_tpu.ops.traceback import traceback_batch


class GotohAligner(Aligner):
    def _align_batch_impl(self, pairs: List[Tuple[bytes, bytes]]):
        if self.config.mode is not Mode.GLOBAL:
            return [AlignmentError("not implemented") for _ in pairs]
        batch = pack_batch(pairs, batch_size=max(8, -(-len(pairs) // 8) * 8))
        res = nw_affine_batch(
            batch.query, batch.db, batch.query_len, batch.db_len,
            scheme=self.config.scoring,
            compat=self.config.compat,
            with_dirs=True,
        )
        tb = traceback_batch(
            res.dirs, res.finals,
            [p[0] for p in pairs], [p[1] for p in pairs],
            compat=self.config.compat,
        )
        out = []
        for r in tb:
            if isinstance(r, AlignerError):
                out.append(r)
                continue
            score, alns = r
            if not alns:
                out.append(AlignmentError("traceback produced no alignment"))
                continue
            out.append(
                dict(
                    score=score,
                    aligned_query=alns[0][0],
                    aligned_db=alns[0][1],
                    alignments=alns,
                )
            )
        return out
