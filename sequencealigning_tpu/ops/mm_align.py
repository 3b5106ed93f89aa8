"""Myers-Miller divide-and-conquer alignment: exact affine-gap CIGARs in
O(n1 + n2) memory for pairs of ANY length.

The tiled engines (ops.nw_affine_tiled) give exact SCORES at any length,
but a full direction tensor for a 200 kb pair is ~40 GB -- alignments for
long pairs normally come from the band-doubling verified path
(models.gotoh._long_batch).  This module is the guaranteed fallback when
the optimum escapes every band: the classic Myers-Miller (1988) recursion
over the split row, with the linear-memory score rows computed as a jitted
row sweep (the in-row D chain linearized to a lane prefix-max exactly as in
ops.nw_banded).

Compilation discipline: subproblem sequences are passed as TRACED OFFSETS
into the full device-resident arrays, and the row width is bucketed to
powers of two -- the whole recursion reuses ~log2(n) compiled fills
instead of one per subproblem shape.

Conventions (match ops.traceback._apply_ops): ops string over
{'M': consume query+db, 'I': consume query (gap in db),
 'D': consume db (gap in query)}.  The state that crosses a horizontal
split row is an 'I' run; `tb`/`te` are the gap-open costs at a
subproblem's top/bottom boundary (0 when a crossing run is already open --
the Myers-Miller boundary subsidy).

Scoring model: the STANDARD affine-gap model (gap of length L costs
o + L*e, gaps may open from any state).  The reference's engines are
stricter -- their i/d_score recurrences open gaps from the M plane only
(needleman_wunsch_affine.rs:87-94), which makes adjacent cross-direction
gap runs (…I D… / …D I…) unreachable.  The standard model is a relaxation:
its optimum is >= the reference's, with equality whenever adjacent
cross-direction runs are not profitable -- i.e. for every realistic DNA
scheme (k mismatches beat I^k D^k whenever k*mismatch >= 2*(open + k*ext);
at the defaults -4k >= -16 - 12k always).  The compat boundary quirk
(open + (L+1)*ext on the outer chains) also does not decompose over cuts.
models.gotoh therefore RESCORES the produced alignment (with the compat
leading-chain adjustment) and keeps it only if it reaches the engine-exact
score -- adversarial schemes degrade to score-only, never to a wrong
answer.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from sequencealigning_tpu.config import NEG_INF, ScoringScheme
from sequencealigning_tpu.io.encode import encode_seq

NEG = NEG_INF


def _pow2(x: int, lo: int = 128) -> int:
    n = lo
    while n < x:
        n *= 2
    return n


@functools.lru_cache(maxsize=64)
def _rows_fn(n_pad: int, lq: int, ld: int, scheme: ScoringScheme):
    """Jitted forward score rows over a subproblem given by offsets:
    fn(q_ext (1, lq), d_ext (1, ld), q_off, m, d_off, n, tb) -> (CC, DD)
    each (1, n_pad + 1): H and I values after m query rows (column j = db
    chars consumed).  q_ext/d_ext are the full padded sequences (d_ext
    left-padded by one so the window read lands on d[d_off + j - 1])."""
    o = jnp.int32(scheme.gap_open)
    e = jnp.int32(scheme.gap_extend)
    match_ = jnp.int32(scheme.match_)
    mism = jnp.int32(scheme.mismatch)
    W = n_pad + 1

    def run(q_ext, d_ext, q_off, m, d_off, n, tb):
        jv = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        lane0 = jv == 0
        # dsh[j] = d[d_off + j - 1] (d_ext is left-padded by one).
        dsh = jax.lax.dynamic_slice(d_ext, (0, d_off), (1, W))
        CC = jnp.where(lane0, 0, o + jv * e)
        DD = jnp.full((1, W), NEG, jnp.int32)

        def body(i, carry):
            CC, DD = carry
            qc = jax.lax.dynamic_slice(q_ext, (0, q_off + i - 1), (1, 1))
            sub = jnp.where(dsh == qc, match_, mism)
            # I (crossing state): same column, previous row.  STANDARD
            # affine model: gaps open from H (the reference's engines open
            # from M only, forbidding adjacent cross-direction runs -- a
            # strictly smaller feasible set; models.gotoh's rescoring gate
            # reconciles the two, see the module docstring).
            DDn = jnp.maximum(CC + o, DD) + e
            chain = tb + i * e
            DDn = jnp.where(lane0, chain, DDn)
            # M from the previous row's H, shifted.
            Mrow = jnp.where(
                lane0, NEG,
                jnp.pad(CC, ((0, 0), (1, 0)), constant_values=NEG)[:, :W]
                + sub,
            )
            B = jnp.maximum(Mrow, DDn)
            B = jnp.where(lane0, chain, B)
            # In-row D chain: E[j] = max(c[j], E[j-1] + e) with
            # c[j] = B[j-1] + o + e, linearized via a prefix max.
            c = jnp.where(
                lane0, NEG,
                jnp.pad(B, ((0, 0), (1, 0)), constant_values=NEG)[:, :W]
                + o + e,
            )
            E = jax.lax.cummax(c - jv * e, axis=1) + jv * e
            CCn = jnp.maximum(B, E)
            CCn = jnp.where(lane0, chain, CCn)
            return CCn, DDn

        CC, DD = jax.lax.fori_loop(1, m + 1, body, (CC, DD))
        return CC, DD

    return jax.jit(run)


class _Seqs:
    """Device-resident forward and reversed sequence arrays for one
    mm_align problem (one upload; subproblems address them by offset)."""

    def __init__(self, q_codes: np.ndarray, d_codes: np.ndarray,
                 scheme: ScoringScheme):
        self.scheme = scheme
        self.m0 = len(q_codes)
        self.n0 = len(d_codes)
        self.n_pad_max = _pow2(self.n0 + 1)
        lq = self.m0 + 8
        ld = self.n0 + self.n_pad_max + 2
        qf = np.full((1, lq), -2, np.int32)
        qf[0, : self.m0] = q_codes
        qr = np.full((1, lq), -2, np.int32)
        qr[0, : self.m0] = q_codes[::-1]
        df = np.full((1, ld), -3, np.int32)
        df[0, 1 : 1 + self.n0] = d_codes  # left pad of one for the window
        dr = np.full((1, ld), -3, np.int32)
        dr[0, 1 : 1 + self.n0] = d_codes[::-1]
        self.qf = jnp.asarray(qf)
        self.qr = jnp.asarray(qr)
        self.df = jnp.asarray(df)
        self.dr = jnp.asarray(dr)
        self.lq = lq
        self.ld = ld

    def rows(self, reverse: bool, q_off: int, m: int, d_off: int, n: int,
             tb: int):
        """(CC, DD) numpy rows (n+1,).  With reverse=True the offsets index
        the REVERSED arrays (caller maps coordinates)."""
        n_pad = _pow2(n + 1)
        fn = _rows_fn(n_pad, self.lq, self.ld, self.scheme)
        q = self.qr if reverse else self.qf
        d = self.dr if reverse else self.df
        CC, DD = fn(q, d, jnp.int32(q_off), jnp.int32(m),
                    jnp.int32(d_off), jnp.int32(n), jnp.int32(tb))
        return (
            np.asarray(CC)[0, : n + 1].astype(np.int64),
            np.asarray(DD)[0, : n + 1].astype(np.int64),
        )


# Subproblems below this cell count solve directly (vectorized numpy DP +
# traceback): the recursion is dispatch-bound otherwise (two device fills
# per node, O(m) nodes).
_DIRECT_CELLS = 1 << 20


def _direct_ops(q, d, tb: int, te: int, scheme: ScoringScheme) -> str:
    """Full-DP solve of a small subproblem under the standard affine model
    with boundary-subsidized pure-I prefix (tb) / suffix (te) runs.
    Returns the forward ops string."""
    m, n = len(q), len(d)
    o, e = scheme.gap_open, scheme.gap_extend
    mat, mis = scheme.match_, scheme.mismatch
    jv = np.arange(n + 1)
    CC = np.where(jv == 0, 0, o + jv * e).astype(np.int64)
    DD = np.full(n + 1, NEG, np.int64)
    # Per-cell walk info, row-major (m+1, n+1): bits 0-1 H-plane code
    # (0=M, 1=I, 2=E), bit 2 I-extend, bit 3 E-extend.
    dirs = np.zeros((m + 1, n + 1), np.uint8)
    last_col = np.empty(m + 1, np.int64)
    last_col[0] = CC[n]
    sub_eq = np.not_equal.outer(q, d)  # (m, n) True where mismatch
    for i in range(1, m + 1):
        iopen = CC + o
        DDn = np.maximum(iopen, DD) + e
        iext = (DD >= iopen).astype(np.uint8) << 2
        chain = tb + i * e
        DDn[0] = chain
        sub = np.where(sub_eq[i - 1], mis, mat)
        Mrow = np.concatenate(([NEG], CC[:-1] + sub))
        B = np.maximum(Mrow, DDn)
        B[0] = chain
        # E[j] = max(B[j-1] + o + e, E[j-1] + e), linearized by prefix max.
        c = np.concatenate(([NEG], B[:-1] + o + e))
        E = np.maximum.accumulate(c - jv * e) + jv * e
        CCn = np.maximum(B, E)
        CCn[0] = chain
        b = np.where(Mrow >= CCn, 0, np.where(DDn >= CCn, 1, 2)).astype(
            np.uint8
        )
        b |= iext
        # E-extend: the prefix max did NOT restart at j (E != c).
        b |= ((E != c).astype(np.uint8)) << 3
        dirs[i] = b
        CC, DD = CCn, DDn
        last_col[i] = CCn[n]
    # Trailing pure-I run (te-subsidized): ends the alignment at column n.
    trail_i = -1
    best = CC[n]
    for i in range(m):
        s = last_col[i] + te + (m - i) * e
        if s > best:
            best = s
            trail_i = i
    ops: List[str] = []
    i, j = (trail_i, n) if trail_i >= 0 else (m, n)
    if trail_i >= 0:
        ops.append("I" * (m - trail_i))
    state = "H"
    while i > 0 or j > 0:
        if i == 0:
            ops.append("D" * j)
            break
        if j == 0:
            ops.append("I" * i)
            break
        b = int(dirs[i][j])
        if state == "H":
            state = ("M", "I", "E")[b & 3]
        elif state == "M":
            ops.append("M")
            i -= 1
            j -= 1
            state = "H"
        elif state == "I":
            ops.append("I")
            state = "I" if (b & 4) else "H"
            i -= 1
        else:  # E
            ops.append("D")
            state = "E" if (b & 8) else "H"
            j -= 1
    return "".join(reversed("".join(ops)))


def _diff(sq: _Seqs, q_codes, d_codes, qa: int, qb: int, da: int, db_: int,
          tb: int, te: int, ops: List[str]):
    """Myers-Miller recursion on q[qa:qb] x d[da:db_]; appends ops."""
    scheme = sq.scheme
    m = qb - qa
    n = db_ - da
    o, e = scheme.gap_open, scheme.gap_extend
    if m == 0:
        ops.append("D" * n)
        return
    if n == 0:
        ops.append("I" * m)
        return
    if m == 1 or m * n <= _DIRECT_CELLS:
        # Small enough for a quadratic-memory host solve: the recursion is
        # dispatch-bound below this (two device fills per node).
        ops.append(
            _direct_ops(q_codes[qa:qb], d_codes[da:db_], tb, te, scheme)
        )
        return
    mid = m // 2
    CC, DD = sq.rows(False, qa, mid, da, n, tb)
    # Backward: reversed-array offsets.  q[qa+mid:qb] reversed starts at
    # m0 - qb; d[da:db_] reversed starts at n0 - db_.
    RR, SS = sq.rows(True, sq.m0 - qb, m - mid, sq.n0 - db_, n, te)
    type1 = CC + RR[::-1]
    type2 = DD + SS[::-1] - o
    j1 = int(np.argmax(type1))
    j2 = int(np.argmax(type2))
    if type1[j1] >= type2[j2]:
        _diff(sq, q_codes, d_codes, qa, qa + mid, da, da + j1, tb, o, ops)
        _diff(sq, q_codes, d_codes, qa + mid, qb, da + j1, db_, o, te, ops)
    else:
        _diff(sq, q_codes, d_codes, qa, qa + mid - 1, da, da + j2, tb, 0, ops)
        ops.append("II")
        _diff(sq, q_codes, d_codes, qa + mid + 1, qb, da + j2, db_, 0, te, ops)


def mm_align(
    query: bytes,
    db: bytes,
    scheme: ScoringScheme = ScoringScheme(),
) -> str:
    """Exact textbook affine-gap global alignment of one pair, any length,
    O(n1 + n2) memory.  Returns the forward ops string."""
    q = np.asarray(encode_seq(query), np.int32)
    d = np.asarray(encode_seq(db), np.int32)
    if len(q) == 0:
        return "D" * len(d)
    if len(d) == 0:
        return "I" * len(q)
    sq = _Seqs(q, d, scheme)
    ops: List[str] = []
    _diff(sq, q, d, 0, len(q), 0, len(d), scheme.gap_open, scheme.gap_open,
          ops)
    return "".join(ops)


def mm_score_ops(ops: str, query: bytes, db: bytes,
                 scheme: ScoringScheme) -> int:
    """Textbook rescore of an ops string (validation helper)."""
    s = 0
    qi = di = 0
    prev = None
    for c in ops:
        if c == "M":
            s += scheme.match_ if query[qi] == db[di] else scheme.mismatch
            qi += 1
            di += 1
        elif c == "I":
            s += scheme.gap_extend + (scheme.gap_open if prev != "I" else 0)
            qi += 1
        else:
            s += scheme.gap_extend + (scheme.gap_open if prev != "D" else 0)
            di += 1
        prev = c
    assert qi == len(query) and di == len(db), (qi, di)
    return s
