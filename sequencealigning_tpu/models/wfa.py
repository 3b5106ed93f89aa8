"""WFA aligner.

Reference: wfa_align (src/wfa.rs:23-42), Global mode only (:24-27).

* compat=True: the bit-faithful host emulation (ops.oracle_wfa), score
  reported as len(wavefronts) with the reference's convergence quirks.
* compat=False: the batched TPU textbook engine (ops.wfa) -- correct
  penalties, static-band pruning, host traceback from offset histories;
  band escapes fall back to the exact scalar oracle."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from sequencealigning_tpu.config import Mode
from sequencealigning_tpu.errors import AlignerError, AlignmentError
from sequencealigning_tpu.io.encode import pack_batch
from sequencealigning_tpu.models.base import Aligner
from sequencealigning_tpu.ops import oracle_wfa
from sequencealigning_tpu.ops.wfa import wfa_textbook_batch, wfa_traceback_host


class WfaAligner(Aligner):
    def _align_batch_impl(self, pairs: List[Tuple[bytes, bytes]]):
        if self.config.mode is not Mode.GLOBAL:
            return [AlignmentError("not implemented") for _ in pairs]
        if self.config.compat:
            return self._compat_batch(pairs)
        return self._textbook_batch(pairs)

    def _compat_batch(self, pairs):
        import os

        use_native = not os.environ.get("SEQALIGN_NO_NATIVE")
        if use_native:
            try:
                from sequencealigning_tpu import native

                use_native = native.available()
            except Exception:
                use_native = False

        out = []
        for s1, s2 in pairs:
            try:
                if use_native:
                    from sequencealigning_tpu import native

                    r = native.wfa_compat_align_native(
                        s1, s2, self.config.wfa_penalties,
                        self.config.wfa_pruning, self.config.wfa_max_steps,
                    )
                    if r is not None:
                        score, a1, a2 = r
                        out.append(
                            dict(score=score, aligned_query=a1, aligned_db=a2)
                        )
                        continue
                score, ocean = oracle_wfa.wfa_align(
                    s1, s2,
                    penalties=self.config.wfa_penalties,
                    pruning=self.config.wfa_pruning,
                    max_steps=self.config.wfa_max_steps,
                )
                a1, a2 = oracle_wfa.wfa_traceback(ocean, s1, s2)
                out.append(dict(score=score, aligned_query=a1, aligned_db=a2))
            except AlignerError as e:
                out.append(e)
        return out

    def _textbook_batch(self, pairs):
        batch = pack_batch(pairs, batch_size=max(8, -(-len(pairs) // 8) * 8))
        res = wfa_textbook_batch(
            batch.query, batch.db, batch.query_len, batch.db_len,
            penalties=self.config.wfa_penalties,
            band=self.config.band,
        )
        converged = np.asarray(res.converged)
        out = []
        for b, (s1, s2) in enumerate(pairs):
            try:
                if converged[b]:
                    score, a1, a2 = wfa_traceback_host(
                        res, b, s1, s2, self.config.wfa_penalties
                    )
                else:
                    # Band escape: exact scalar fallback.
                    score = oracle_wfa.wfa_textbook_score(
                        s1, s2, self.config.wfa_penalties
                    )
                    a1 = a2 = None
                out.append(dict(score=score, aligned_query=a1, aligned_db=a2))
            except AlignerError as e:
                out.append(e)
        return out
