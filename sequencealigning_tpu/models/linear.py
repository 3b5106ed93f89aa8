"""Linear/gap-state NW aligner (the reference's dead module, revived).

Reference: src/needleman_wunsch.rs.  Global and Local (Smith-Waterman-style)
modes; SemiGlobal raises like the unimplemented slots elsewhere."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from sequencealigning_tpu.config import Mode
from sequencealigning_tpu.errors import AlignmentError
from sequencealigning_tpu.io.encode import pack_batch
from sequencealigning_tpu.models.base import Aligner
from sequencealigning_tpu.ops.nw_linear import nw_linear_batch
from sequencealigning_tpu.ops.traceback import linear_traceback_pair


class LinearNWAligner(Aligner):
    def _align_batch_impl(self, pairs: List[Tuple[bytes, bytes]]):
        if self.config.mode is Mode.SEMI_GLOBAL:
            return [AlignmentError("not implemented") for _ in pairs]
        local = self.config.mode is Mode.LOCAL
        batch = pack_batch(pairs, batch_size=max(8, -(-len(pairs) // 8) * 8))
        res = nw_linear_batch(
            batch.query, batch.db, batch.query_len, batch.db_len,
            scheme=self.config.scoring,
            compat=self.config.compat,
            local=local,
        )
        dirs = np.asarray(res.dirs)
        scores = np.asarray(res.score)
        out = []
        for b, (s1, s2) in enumerate(pairs):
            hits = linear_traceback_pair(dirs[:, b, :], s1, s2, local=local)
            if not hits:
                out.append(AlignmentError("no hits"))
                continue
            a1, a2, siq, sid = hits[0]
            out.append(
                dict(
                    score=int(scores[b]),
                    aligned_query=a1,
                    aligned_db=a2,
                    alignments=[(h[0], h[1]) for h in hits],
                )
            )
        return out
