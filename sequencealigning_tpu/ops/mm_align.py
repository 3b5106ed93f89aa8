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

Conventions (match ops.traceback._apply_ops): ops string over
{'M': consume query+db, 'I': consume query (gap in db),
 'D': consume db (gap in query)}.  The state that crosses a horizontal
split row is an 'I' run; `tb`/`te` are the gap-open costs at a
subproblem's top/bottom boundary (0 when a crossing run is already open --
the Myers-Miller boundary subsidy).

Textbook gap model only (gap of length L costs o + L*e): the compat
boundary quirk (open + (L+1)*e on the outer chains,
needleman_wunsch_affine.rs:195,207) is positional and does not decompose
over cuts; models.gotoh rescoring decides whether a produced alignment is
also compat-optimal.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from sequencealigning_tpu.config import NEG_INF, ScoringScheme
from sequencealigning_tpu.io.encode import encode_seq, round_up

NEG = NEG_INF


@functools.lru_cache(maxsize=64)
def _rows_fn(n_pad: int, m_pad: int, scheme: ScoringScheme):
    """Jitted forward score rows: fn(q (1, m_pad), d (1, n_pad), m, n, tb)
    -> (CC, DD) each (1, n_pad + 1): H and I values at row m (0-based
    column j = db chars consumed).  Shapes are bucketed so the recursion
    reuses a handful of compilations."""
    o = jnp.int32(scheme.gap_open)
    e = jnp.int32(scheme.gap_extend)
    match_ = jnp.int32(scheme.match_)
    mism = jnp.int32(scheme.mismatch)
    W = n_pad + 1

    def run(q, d, m, n, tb):
        jv = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        lane0 = jv == 0
        # dsh[j] = d[j-1]
        dsh = jnp.pad(d, ((0, 0), (1, 0)), constant_values=-1)[:, :W]
        CC = jnp.where(lane0, 0, o + jv * e)
        DD = jnp.full((1, W), NEG, jnp.int32)

        def body(i, carry):
            CC, DD = carry
            qc = jax.lax.dynamic_slice(q, (0, i - 1), (1, 1))
            sub = jnp.where(dsh == qc, match_, mism)
            # I (crossing state): same column, previous row.
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


def _score_rows(q_codes: np.ndarray, d_codes: np.ndarray, tb: int,
                scheme: ScoringScheme):
    """(CC, DD) numpy rows (n+1,) for aligning all of q against prefixes
    of d, with the column-0 (query-gap) chain opened at cost tb."""
    m, n = len(q_codes), len(d_codes)
    if m == 0:
        jv = np.arange(n + 1)
        CC = np.where(jv == 0, 0, scheme.gap_open + jv * scheme.gap_extend)
        return CC.astype(np.int64), np.full(n + 1, NEG, np.int64)
    m_pad = round_up(max(m, 8), 128)
    n_pad = round_up(max(n, 8), 128)
    qp = np.full((1, m_pad), -2, np.int32)
    qp[0, :m] = q_codes
    dp = np.full((1, n_pad), -3, np.int32)
    dp[0, :n] = d_codes
    fn = _rows_fn(n_pad, m_pad, scheme)
    CC, DD = fn(jnp.asarray(qp), jnp.asarray(dp), jnp.int32(m),
                jnp.int32(n), jnp.int32(tb))
    return (
        np.asarray(CC)[0, : n + 1].astype(np.int64),
        np.asarray(DD)[0, : n + 1].astype(np.int64),
    )


def _gap(length: int, scheme: ScoringScheme) -> int:
    return 0 if length == 0 else scheme.gap_open + length * scheme.gap_extend


def _diff(q, d, tb, te, scheme, ops: List[str]):
    """Myers-Miller recursion; appends the ops for aligning q against d
    with boundary query-gap opens tb (top) / te (bottom)."""
    m, n = len(q), len(d)
    o, e = scheme.gap_open, scheme.gap_extend
    if m == 0:
        ops.append("D" * n)
        return
    if n == 0:
        ops.append("I" * m)
        return
    if m == 1:
        # Either q[0] is gapped (one I whose open is the cheaper boundary
        # -- placed ADJACENT to that boundary so a subsidized run merges
        # with its continuation in the parent) or it matches some d[j].
        best = max(tb, te) + e + _gap(n, scheme)
        best_ops = ("D" * n + "I") if te >= tb else ("I" + "D" * n)
        for j in range(n):
            sub = scheme.match_ if q[0] == d[j] else scheme.mismatch
            s = _gap(j, scheme) + sub + _gap(n - 1 - j, scheme)
            if s > best:
                best = s
                best_ops = "D" * j + "M" + "D" * (n - 1 - j)
        ops.append(best_ops)
        return
    mid = m // 2
    CC, DD = _score_rows(q[:mid], d, tb, scheme)
    RR, SS = _score_rows(q[mid:][::-1], d[::-1], te, scheme)
    type1 = CC + RR[::-1]
    type2 = DD + SS[::-1] - o
    j1 = int(np.argmax(type1))
    j2 = int(np.argmax(type2))
    if type1[j1] >= type2[j2]:
        _diff(q[:mid], d[:j1], tb, o, scheme, ops)
        _diff(q[mid:], d[j1:], o, te, scheme, ops)
    else:
        _diff(q[: mid - 1], d[:j2], tb, 0, scheme, ops)
        ops.append("II")
        _diff(q[mid + 1 :], d[j2:], 0, te, scheme, ops)


def mm_align(
    query: bytes,
    db: bytes,
    scheme: ScoringScheme = ScoringScheme(),
) -> str:
    """Exact textbook affine-gap global alignment of one pair, any length,
    O(n1 + n2) memory.  Returns the forward ops string."""
    q = np.asarray(encode_seq(query), np.int32)
    d = np.asarray(encode_seq(db), np.int32)
    ops: List[str] = []
    _diff(q, d, scheme.gap_open, scheme.gap_open, scheme, ops)
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
