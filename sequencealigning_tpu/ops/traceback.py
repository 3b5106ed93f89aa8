"""Host-side traceback from packed direction words.

The TPU kernel emits one byte of direction bits per DP cell (ops.dirbits);
traceback is O(n+m) pointer-chasing per alignment -- inherently sequential
and data-dependent, so it runs on the host (SURVEY.md §7 "hard parts"),
reading the packed words the fill streamed to HBM.

The walk replicates the reference's LIFO co-optimal enumeration
(needleman_wunsch_affine.rs:242-334) exactly, like ops.oracle_gotoh's
score-recomputing walker -- the two walkers validate each other in tests.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from sequencealigning_tpu.config import ScoringScheme
from sequencealigning_tpu.errors import AlignmentError
from sequencealigning_tpu.ops import dirbits

M, I, D = 0, 1, 2


def _byte(dirs_b: np.ndarray, d: int, x: int) -> int:
    return int(dirs_b[d >> 2, x] >> (8 * (d & 3))) & 0xFF


def traceback_pair(
    dirs_b: np.ndarray,
    finals_b: np.ndarray,
    seq1: bytes,
    seq2: bytes,
    compat: bool = True,
    max_alignments: int = 64,
) -> Tuple[int, List[Tuple[str, str]]]:
    """Co-optimal global traceback for one pair.

    dirs_b: (D4, P) uint32 slice for this pair; finals_b: (3,) int32 M/I/D
    at (n2, n1).  Returns (score, [(aligned_seq1, aligned_seq2), ...]) in
    the reference's print order.
    """
    n1, n2 = len(seq1), len(seq2)
    score = int(finals_b.max())

    def parents(x: int, y: int, plane: int) -> List[int]:
        if x == 0 or y == 0:
            # Boundary chains (closed-form; the kernel's boundary bits for
            # IEXT..DOPEN are not meaningful there).
            if compat:
                if x == 0 and y > 0 and plane == D:
                    return [D]
                if y == 0 and x > 0 and plane == I:
                    return [I]
            else:
                if x == 0 and y > 0 and plane == I:
                    return [I]
                if y == 0 and x > 0 and plane == D:
                    return [D]
            return []
        if plane == M:
            b = _byte(dirs_b, x + y - 2, x - 1)  # H-argmax of cell (x-1,y-1)
            out = []
            if b & dirbits.HM:
                out.append(M)
            if b & dirbits.HI:
                out.append(I)
            if b & dirbits.HD:
                out.append(D)
            return out
        if plane == I:
            b = _byte(dirs_b, x + y, x)
            out = []
            if b & dirbits.IEXT:
                out.append(I)
            if b & dirbits.IOPEN:
                out.append(M)
            return out
        b = _byte(dirs_b, x + y, x)
        out = []
        if b & dirbits.DEXT:
            out.append(D)
        if b & dirbits.DOPEN:
            out.append(M)
        return out

    stack: List[Tuple[bytes, bytes, int, int, int]] = []
    for plane in (I, M, D):  # seed push order (reference :251-280)
        if int(finals_b[plane]) == score:
            stack.append((b"", b"", plane, n2, n1))

    out: List[Tuple[str, str]] = []
    while stack:
        a1, a2, plane, x, y = stack.pop()
        if x == 0 and y == 0:
            out.append((a1.decode("latin-1"), a2.decode("latin-1")))
            if len(out) >= max_alignments:
                break
        for parent in parents(x, y, plane):
            if plane == M:
                if x == 0 or y == 0:
                    raise AlignmentError(
                        "reference would panic: M-cell traceback at boundary"
                    )
                s1c, s2c, nx, ny = seq1[y - 1 : y], seq2[x - 1 : x], x - 1, y - 1
            elif plane == D:
                if x == 0:
                    raise AlignmentError(
                        "reference would panic: boundary-chain traceback"
                    )
                s1c, s2c, nx, ny = b"-", seq2[x - 1 : x], x - 1, y
            else:
                if y == 0:
                    raise AlignmentError(
                        "reference would panic: boundary-chain traceback"
                    )
                s1c, s2c, nx, ny = seq1[y - 1 : y], b"-", x, y - 1
            stack.append((s1c + a1, s2c + a2, parent, nx, ny))
    return score, out


def traceback_batch(
    dirs: np.ndarray,
    finals: np.ndarray,
    seqs1: List[bytes],
    seqs2: List[bytes],
    compat: bool = True,
    max_alignments: int = 64,
    first_only: bool = False,
):
    """Traceback for a whole batch.  Returns a list of per-pair results:
    (score, alignments) or an AlignmentError instance (per-pair failure
    isolation, like the reference driver loop src/main.rs:68-76)."""
    dirs = np.asarray(dirs)
    finals = np.asarray(finals)
    results = []
    for b, (s1, s2) in enumerate(zip(seqs1, seqs2)):
        try:
            results.append(
                traceback_pair(
                    dirs[:, b, :],
                    finals[b],
                    s1,
                    s2,
                    compat=compat,
                    max_alignments=1 if first_only else max_alignments,
                )
            )
        except AlignmentError as e:
            results.append(e)
    return results
