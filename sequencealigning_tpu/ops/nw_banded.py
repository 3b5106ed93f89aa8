"""Banded affine-gap NW fill (fixed-shape masked band) -- the TPU-native
analog of the reference's A* pruning (SURVEY.md §5 "long-context": a fixed
band instead of a heap search; src/align.rs's weighted heuristic effectively
explores a corridor around the main diagonal).

Design: work in band coordinates (x, k) with k = y - x in a fixed static
range [k_lo, k_hi] (the corridor that contains every pair's global-alignment
diagonal +/- the band half-width).  Sweeping rows x = 0..L2:

  * M(x,k) <- H(x-1, k)          -- same lane, previous row (k unchanged)
  * D(x,k) <- M/D(x-1, k+1)      -- lane k+1, previous row
  * I(x,k) <- M/I(x, k-1)        -- same row: a first-order (max,+)
    recurrence I[k] = max(c[k], I[k-1]+e), solved with an associative scan
    over the lane axis (function composition (m,s): x -> max(m, x+s)).

Cells with y = x + k outside [0, n1] (or outside the pair's true lengths)
are masked to -inf.  One byte of direction bits per cell (ops.dirbits
layout), packed 4 ROWS per u32 word: word = dirs[x//4, b, k-k_lo].

Scores equal the full Gotoh fill whenever the optimal path stays inside the
band (tests assert this), and are exactly the band-restricted optimum
otherwise -- the usual banded-alignment contract.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sequencealigning_tpu.config import NEG_INF, ScoringScheme
from sequencealigning_tpu.io.encode import round_up as _round_up
from sequencealigning_tpu.ops import dirbits


class BandedResult(NamedTuple):
    finals: jax.Array  # (B, 3) M/I/D at (n2, n1)
    dirs: Optional[jax.Array]  # (X4, B, K) uint32
    k_lo: int


def _scan_maxplus(c: jax.Array, e) -> jax.Array:
    """I[k] = max(c[k], I[k-1] + e) along the last axis via associative scan
    of (m, s) function composition: (m2,s2) o (m1,s1) = (max(m2, m1+s2),
    s1+s2)."""
    B, K = c.shape
    s0 = jnp.full((B, K), e, dtype=c.dtype)

    def combine(a, b):
        m1, s1 = a
        m2, s2 = b
        return jnp.maximum(m2, m1 + s2), s1 + s2

    m, _ = jax.lax.associative_scan(combine, (c, s0), axis=1)
    return m


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_lo", "k_hi", "l2", "scheme", "compat", "wildcard", "with_dirs",
    ),
)
def _banded_fill_lax(
    seq1, seq2, n1v, n2v, k_lo: int, k_hi: int, l2: int,
    scheme: ScoringScheme, compat: bool, wildcard: bool, with_dirs: bool,
):
    B = seq1.shape[0]
    K = _round_up(k_hi - k_lo + 1, 128)
    o = jnp.int32(scheme.gap_open)
    e = jnp.int32(scheme.gap_extend)
    neg = jnp.int32(NEG_INF)
    NEGBIG = jnp.int32(-(2 ** 24))  # band-mask -inf, must stay << any score
    kv = k_lo + jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)  # lane -> k

    # Row x needs seq1[y-1] at y = x + k: contiguous in the lane axis, so
    # a dynamic slice of padded seq1 replaces a per-cell gather (XLA
    # gathers are catastrophically slow on TPU; see PERF.md).
    pad_l = max(0, 1 - k_lo)
    seq1_pad = jnp.pad(
        seq1, ((0, 0), (pad_l, max(0, K + l2 + k_lo - seq1.shape[1]))),
        constant_values=-1,
    )

    def seq1_row(x):
        """seq1 chars for row x: lane k holds seq1[x + k_lo + k - 1]."""
        return jax.lax.dynamic_slice_in_dim(
            seq1_pad, x - 1 + k_lo + pad_l, K, 1
        )

    def boundary_row0():
        """Row x=0: cell (0, y=k) for k >= 0."""
        y = kv
        on = jnp.logical_and(y >= 0, y <= n1v)
        is_origin = y == 0
        if compat:
            chain = o + (y + 1) * e
            m0 = jnp.where(is_origin, 0, neg)
            i0 = jnp.full_like(kv, neg)
            d0 = jnp.where(is_origin, neg, chain)
        else:
            chain = o + y * e
            m0 = jnp.where(is_origin, 0, neg)
            i0 = jnp.where(is_origin, neg, chain)
            d0 = jnp.full_like(kv, neg)
        mask = lambda a: jnp.where(on, a, NEGBIG)
        return mask(m0), mask(i0), mask(d0)

    M0, I0, D0 = boundary_row0()
    H0 = jnp.maximum(M0, jnp.maximum(I0, D0))

    def body(carry, x):
        Mp, Ip, Dp, Hp, fm, fi, fd = carry
        y = x + kv  # (B, K)
        valid = jnp.logical_and(y >= 1, y <= n1v)
        valid = jnp.logical_and(valid, x <= n2v)

        s1 = seq1_row(x)
        s2 = jax.lax.dynamic_slice_in_dim(seq2, jnp.clip(x - 1, 0, l2 - 1), 1, 1)
        if wildcard:
            eq = (s1 & s2) != 0
        else:
            eq = s1 == s2
        sub = jnp.where(eq, jnp.int32(scheme.match_), jnp.int32(scheme.mismatch))

        M = Hp + sub
        # D: lane k+1 of previous row = shift left by 1 (band edge -> -inf).
        Mp_r = jnp.concatenate([Mp[:, 1:], jnp.full((B, 1), NEGBIG)], axis=1)
        Dp_r = jnp.concatenate([Dp[:, 1:], jnp.full((B, 1), NEGBIG)], axis=1)
        dd = Mp_r + o
        D = jnp.maximum(dd, Dp_r) + e

        # Column boundary y=0 (k = -x): chain values.
        is_col0 = y == 0
        if compat:
            chain = o + (x + 1) * e
            m_c = jnp.where(x == 0, 0, neg)
            i_c = jnp.where(x == 0, neg, chain)
            d_c = neg
        else:
            chain = o + x * e
            m_c = jnp.where(x == 0, 0, neg)
            i_c = neg
            d_c = jnp.where(x == 0, neg, chain)
        M = jnp.where(is_col0, m_c, jnp.where(valid, M, NEGBIG))
        D = jnp.where(is_col0, d_c, jnp.where(valid, D, NEGBIG))

        # I: in-row scan. c[k] = M(x, k-1) + o + e; the lane just right of
        # the column boundary is additionally seeded with i_chain + e so the
        # chain continues into the band (the scan's own value at the col0
        # lane is garbage and overridden after).
        M_l = jnp.concatenate([jnp.full((B, 1), NEGBIG), M[:, :-1]], axis=1)
        right_of_col0 = jnp.concatenate(
            [jnp.full((B, 1), False), is_col0[:, :-1]], axis=1
        )
        seed = jnp.where(right_of_col0, jnp.broadcast_to(i_c, (B, K)) + e, NEGBIG)
        c = jnp.maximum(M_l + o + e, seed)
        I = _scan_maxplus(c, e)
        I = jnp.where(is_col0, i_c, jnp.where(valid, I, NEGBIG))

        H = jnp.maximum(M, jnp.maximum(I, D))

        cap = jnp.logical_and(x == n2v, kv == (n1v - n2v))
        fm = fm + jnp.where(cap, M, 0)
        fi = fi + jnp.where(cap, I, 0)
        fd = fd + jnp.where(cap, D, 0)

        if with_dirs:
            b = (M == H).astype(jnp.int32) * dirbits.HM
            b |= (I == H).astype(jnp.int32) * dirbits.HI
            b |= (D == H).astype(jnp.int32) * dirbits.HD
            # I-parent bits: I == I_prev_lane + e (ext) / == M_prev_lane+o+e.
            I_l = jnp.concatenate([jnp.full((B, 1), NEGBIG), I[:, :-1]], axis=1)
            b |= (I == I_l + e).astype(jnp.int32) * dirbits.IEXT
            b |= (I == M_l + o + e).astype(jnp.int32) * dirbits.IOPEN
            b |= (D == Dp_r + e).astype(jnp.int32) * dirbits.DEXT
            b |= (D == dd + e).astype(jnp.int32) * dirbits.DOPEN
            byte = b.astype(jnp.uint8)
        else:
            byte = jnp.zeros((), jnp.uint8)
        return (M, I, D, H, fm, fi, fd), byte

    zeros = jnp.zeros((B, K), jnp.int32)
    # Corner capture for pairs with n2 == 0 lives on row 0.
    cap0 = jnp.logical_and(n2v == 0, kv == n1v)
    carry0 = (
        M0, I0, D0, H0,
        jnp.where(cap0, M0, 0),
        jnp.where(cap0, I0, 0),
        jnp.where(cap0, D0, 0),
    )
    carry, bytes_ = jax.lax.scan(
        body, carry0, jnp.arange(1, l2 + 1, dtype=jnp.int32)
    )
    _, _, _, _, fm, fi, fd = carry
    finals = jnp.stack([fm.sum(1), fi.sum(1), fd.sum(1)], axis=1)

    if with_dirs:
        # Row 0 byte: H-argmax of the boundary row (needed by M cells at
        # x=1).
        b0 = (M0 == H0).astype(jnp.int32) * dirbits.HM
        b0 |= (I0 == H0).astype(jnp.int32) * dirbits.HI
        b0 |= (D0 == H0).astype(jnp.int32) * dirbits.HD
        bytes_ = jnp.concatenate(
            [b0.astype(jnp.uint8)[None], bytes_], axis=0
        )
        X = l2 + 1
        X4 = _round_up(X, 4) // 4
        pad = X4 * 4 - X
        bytes_ = jnp.pad(bytes_, ((0, pad), (0, 0), (0, 0)))
        w = bytes_.reshape(X4, 4, B, K).astype(jnp.uint32)
        dirs = w[:, 0] | (w[:, 1] << 8) | (w[:, 2] << 16) | (w[:, 3] << 24)
    else:
        dirs = None
    return finals, dirs


def nw_banded_batch(
    query: np.ndarray,
    db: np.ndarray,
    query_len: np.ndarray,
    db_len: np.ndarray,
    band: int = 128,
    scheme: ScoringScheme = ScoringScheme(),
    compat: bool = True,
    wildcard: bool = False,
    with_dirs: bool = True,
) -> BandedResult:
    """Banded Gotoh fill.  band = half-width around each pair's global
    diagonal corridor; the static lane range covers
    [min(0, n1-n2)-band, max(0, n1-n2)+band] over the batch."""
    qlen = np.asarray(query_len)
    dlen = np.asarray(db_len)
    diff = qlen.astype(np.int64) - dlen.astype(np.int64)
    k_lo = int(min(0, diff.min()) - band)
    k_hi = int(max(0, diff.max()) + band)
    B, L1 = query.shape
    _, L2 = db.shape

    finals, dirs = _banded_fill_lax(
        jnp.asarray(query, dtype=jnp.int32),
        jnp.asarray(db, dtype=jnp.int32),
        jnp.asarray(qlen, dtype=jnp.int32)[:, None],
        jnp.asarray(dlen, dtype=jnp.int32)[:, None],
        k_lo, k_hi, L2, scheme, compat, wildcard, with_dirs,
    )
    return BandedResult(finals=finals, dirs=dirs, k_lo=k_lo)
