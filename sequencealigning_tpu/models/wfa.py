"""WFA aligner.

Reference: wfa_align (src/wfa.rs:23-42), Global mode only (:24-27).

* compat=True: the bit-faithful host emulation (ops.oracle_wfa), score
  reported as len(wavefronts) with the reference's convergence quirks.
* compat=False: the batched TPU textbook engine (ops.wfa) -- correct
  penalties, static-band pruning, host traceback from the offset log.
  Band escapes re-run with a doubled band (the adaptive behavior of the
  reference's trim, src/wfa.rs:490-623, as retry instead of in-loop
  reallocation); pairs that still escape fall through to the exact
  Gotoh engine under the penalty-converted scheme (match=0), so every
  pair always gets BOTH an exact penalty and an alignment (round 1
  returned a score with no alignment on escape)."""

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

    # Band-doubling cap for escape retries (larger bands square the
    # run-length table's memory; beyond this the Gotoh fallback is both
    # exact and cheaper).
    wfa_max_band = 256

    def _textbook_batch(self, pairs):
        out = [None] * len(pairs)
        pending = list(range(len(pairs)))
        band = self.config.band
        while pending and band <= self.wfa_max_band:
            sub = [pairs[i] for i in pending]
            batch = pack_batch(
                sub, batch_size=max(8, -(-len(sub) // 8) * 8)
            )
            try:
                res = wfa_textbook_batch(
                    batch.query, batch.db, batch.query_len, batch.db_len,
                    penalties=self.config.wfa_penalties, band=band,
                )
            except AlignmentError:
                break  # beyond the int16 offset cap: exact fallback below
            converged = np.asarray(res.converged)
            still = []
            for j, i in enumerate(pending):
                if not converged[j]:
                    still.append(i)
                    continue
                try:
                    score, a1, a2 = wfa_traceback_host(
                        res, j, pairs[i][0], pairs[i][1],
                        self.config.wfa_penalties,
                    )
                    out[i] = dict(
                        score=score, aligned_query=a1, aligned_db=a2
                    )
                except AlignerError as e:
                    out[i] = e
            pending = still
            band *= 2
        if pending:
            self._gotoh_fallback(pairs, pending, out)
        return out

    def _gotoh_fallback(self, pairs, pending, out):
        """Exact escape path: gap-affine min-penalty == negated textbook
        Gotoh under (match=0, -x, -o, -e), so the Gotoh engine provides
        both the exact penalty and an alignment for any pair.

        Model caveat (mirrors the reference's own internal inconsistency,
        PARITY.md): WFA's combined M-wavefront is the standard affine
        model, Gotoh opens gaps from M only; the two coincide whenever
        mismatch <= 2*gap_extend (true for the reference's 4/2/6 defaults
        and any realistic DNA penalties)."""
        import dataclasses

        from sequencealigning_tpu.config import ScoringScheme
        from sequencealigning_tpu.models.gotoh import GotohAligner

        pen = self.config.wfa_penalties
        cfg = dataclasses.replace(
            self.config,
            scoring=ScoringScheme(
                match_=0, mismatch=-pen.mismatch,
                gap_open=-pen.gap_open, gap_extend=-pen.gap_extend,
            ),
            compat=False,
            first_only=True,
        )
        sub = [pairs[i] for i in pending]
        for i, r in zip(pending, GotohAligner(cfg)._align_batch_impl(sub)):
            if isinstance(r, AlignerError):
                out[i] = r
            elif r.get("aligned_query") is None:
                out[i] = dict(
                    score=-r["score"], aligned_query=None, aligned_db=None
                )
            else:
                out[i] = dict(
                    score=-r["score"],
                    aligned_query=r["aligned_query"],
                    aligned_db=r["aligned_db"],
                )
