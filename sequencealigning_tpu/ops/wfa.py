"""Batched wavefront alignment (WFA, gap-affine) for TPU -- textbook mode.

TPU-native re-design of the reference's WFA (src/wfa.rs): instead of
score-indexed Vec<Option<...>> wavefronts with dynamic lo/hi bands, the
wavefronts are fixed-shape (B, K) offset vectors over a static diagonal band
k in [k_lo, k_hi] (absent diagonals = -inf mask), the score loop is a
jax.lax.while_loop, the greedy match-extension is an inner vectorized
while_loop (all diagonals of all pairs extend simultaneously, one char per
iteration), and the full offset history is kept in HBM as three
(S_max, B, K) tensors for host traceback.

Coordinates (clean convention, unlike the reference's min(x,y) offsets --
see ops.oracle_wfa's module docstring for why the reference's own convention
is geometrically inconsistent): diag k = y - x, offset t = x (db chars
consumed), y = t + k.  Recurrence (Marco-Sola et al. 2021):

    I[s][k] = max(M[s-o-e][k-1], I[s-e][k-1])        (consume seq1)
    D[s][k] = max(M[s-o-e][k+1], D[s-e][k+1]) + 1    (consume seq2)
    M[s][k] = extend(max(M[s-x][k] + 1, I[s][k], D[s][k]))

Converged when M[s][k_target = n1-n2] == n2.  The static band plays the
role of the reference's adaptive trim (wfa.rs:490-623) as the pruning
device; band escapes are reported via the `converged` mask and fall back to
the exact host oracle in the model layer.

The reference-compat WFA (bit-parity with the Rust, including its
convergence/trim/score quirks) lives in ops.oracle_wfa.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sequencealigning_tpu.config import WfaPenalties
from sequencealigning_tpu.errors import AlignmentError

NEG = -(2 ** 20)


class WfaBatchResult(NamedTuple):
    score: jax.Array       # (B,) int32 penalty (valid where converged)
    converged: jax.Array   # (B,) bool
    m_hist: jax.Array      # (S_max, B, K) int32 offsets (NEG = absent)
    i_hist: jax.Array
    d_hist: jax.Array
    k_lo: int


@functools.partial(
    jax.jit, static_argnames=("k_lo", "k_hi", "s_max", "penalties")
)
def _wfa_textbook_jax(
    seq1, seq2, n1v, n2v, k_lo: int, k_hi: int, s_max: int,
    penalties: WfaPenalties,
):
    B = seq1.shape[0]
    K = k_hi - k_lo + 1
    x_pen, o_pen, e_pen = penalties.mismatch, penalties.gap_open, penalties.gap_extend
    oe = o_pen + e_pen
    kv = k_lo + jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
    negs = jnp.full((B, K), NEG, jnp.int32)
    k_target = n1v - n2v  # (B, 1)
    target_lane = jnp.clip(k_target - k_lo, 0, K - 1)

    def ok(t):
        y = t + kv
        return jnp.logical_and(
            jnp.logical_and(t >= 0, t <= n2v),
            jnp.logical_and(y >= 0, y <= n1v),
        )

    # Greedy match extension via a precomputed per-diagonal run-length
    # table: runlen[t, b, k] = length of the exact-match run starting at
    # offset t on diagonal k.  Built with one reverse lax.scan over the db
    # axis (pure vector compares, no gathers); each WFA step then extends
    # every wavefront lane with a single O(B*K) lookup.  This replaces the
    # reference's per-character while-loop (wfa.rs:127-139), which on TPU
    # would serialize one gather per character.
    T = seq2.shape[1]
    pad_l = max(0, -k_lo)
    seq1_pad = jnp.pad(
        seq1, ((0, 0), (pad_l, max(0, K + T + k_lo - seq1.shape[1]))),
        constant_values=-1,
    )

    def _run_body(run, t):
        c2 = jax.lax.dynamic_slice_in_dim(seq2, t, 1, 1)          # (B, 1)
        s1w = jax.lax.dynamic_slice_in_dim(
            seq1_pad, t + pad_l + k_lo, K, 1
        )                                                          # (B, K)
        eq = jnp.logical_and(
            s1w == c2,
            jnp.logical_and(t < n2v, (t + kv) < n1v),
        )
        run = jnp.where(eq, run + 1, 0)
        return run, run

    _, _runs = jax.lax.scan(
        _run_body,
        jnp.zeros((B, K), jnp.int32),
        jnp.arange(T - 1, -1, -1, dtype=jnp.int32),
    )
    runlen = _runs[::-1]  # (T, B, K); runlen[t] = match run starting at t

    def extend(t):
        idx = jnp.clip(t, 0, T - 1)[None]
        run = jnp.take_along_axis(runlen, idx, axis=0)[0]
        return t + jnp.where(jnp.logical_and(t >= 0, t < T), run, 0)

    def shift_left(a):  # lane k reads k+1
        return jnp.concatenate([a[:, 1:], jnp.full((B, 1), NEG, a.dtype)], 1)

    def shift_right(a):  # lane k reads k-1
        return jnp.concatenate([jnp.full((B, 1), NEG, a.dtype), a[:, :-1]], 1)

    def get_hist(hist, s):
        row = jax.lax.dynamic_slice(
            hist, (jnp.maximum(s, 0), 0, 0), (1, B, K)
        )[0]
        return jnp.where(s >= 0, row, negs)

    BIG = 2 ** 20  # parks absent lanes out of bounds so extend() skips them

    # s = 0 seed.
    t00 = jnp.where(kv == 0, 0, BIG)
    m0 = extend(t00)
    m0 = jnp.where(jnp.logical_and(kv == 0, ok(m0)), m0, NEG)

    m_hist = jnp.full((s_max, B, K), NEG, jnp.int32).at[0].set(m0)
    i_hist = jnp.full((s_max, B, K), NEG, jnp.int32)
    d_hist = jnp.full((s_max, B, K), NEG, jnp.int32)

    done0 = (
        jnp.take_along_axis(m0, target_lane, 1) >= n2v
    )[:, 0]
    score0 = jnp.where(done0, 0, -1).astype(jnp.int32)

    def cond(state):
        s, done, _, _, _, _ = state
        return jnp.logical_and(s < s_max, jnp.logical_not(jnp.all(done)))

    def body(state):
        s, done, score, m_hist, i_hist, d_hist = state
        m_oe = get_hist(m_hist, s - oe)
        m_x = get_hist(m_hist, s - x_pen)
        i_e = get_hist(i_hist, s - e_pen)
        d_e = get_hist(d_hist, s - e_pen)

        i_new = jnp.maximum(shift_right(m_oe), shift_right(i_e))
        i_new = jnp.where(jnp.logical_and(i_new > NEG, ok(i_new)), i_new, NEG)
        d_src = jnp.maximum(shift_left(m_oe), shift_left(d_e))
        d_new = jnp.where(d_src > NEG, d_src + 1, NEG)
        d_new = jnp.where(ok(d_new), d_new, NEG)
        m_cand = jnp.maximum(
            jnp.where(m_x > NEG, m_x + 1, NEG), jnp.maximum(i_new, d_new)
        )
        m_cand = jnp.where(ok(m_cand), m_cand, NEG)
        m_new = extend(jnp.where(m_cand > NEG, m_cand, BIG))
        m_new = jnp.where(m_cand > NEG, m_new, NEG)

        live = jnp.logical_not(done)[:, None]
        m_hist = m_hist.at[s].set(jnp.where(live, m_new, NEG))
        i_hist = i_hist.at[s].set(jnp.where(live, i_new, NEG))
        d_hist = d_hist.at[s].set(jnp.where(live, d_new, NEG))

        hit = (jnp.take_along_axis(m_new, target_lane, 1) >= n2v)[:, 0]
        newly = jnp.logical_and(hit, jnp.logical_not(done))
        score = jnp.where(newly, s, score)
        done = jnp.logical_or(done, hit)
        return s + 1, done, score, m_hist, i_hist, d_hist

    s, done, score, m_hist, i_hist, d_hist = jax.lax.while_loop(
        cond, body, (jnp.int32(1), done0, score0, m_hist, i_hist, d_hist)
    )
    return score, done, m_hist, i_hist, d_hist


def wfa_textbook_batch(
    query: np.ndarray,
    db: np.ndarray,
    query_len: np.ndarray,
    db_len: np.ndarray,
    penalties: WfaPenalties = WfaPenalties(),
    band: int = 64,
    s_max: int = 512,
) -> WfaBatchResult:
    """Batched exact gap-affine WFA.  band = half-width of the static
    diagonal window beyond the batch's length-difference range."""
    qlen = np.asarray(query_len)
    dlen = np.asarray(db_len)
    diff = qlen.astype(np.int64) - dlen.astype(np.int64)
    k_lo = int(min(0, diff.min()) - band)
    k_hi = int(max(0, diff.max()) + band)

    score, done, m_hist, i_hist, d_hist = _wfa_textbook_jax(
        jnp.asarray(query, jnp.int32),
        jnp.asarray(db, jnp.int32),
        jnp.asarray(qlen, jnp.int32)[:, None],
        jnp.asarray(dlen, jnp.int32)[:, None],
        k_lo, k_hi, s_max, penalties,
    )
    return WfaBatchResult(
        score=score, converged=done, m_hist=m_hist, i_hist=i_hist,
        d_hist=d_hist, k_lo=k_lo,
    )


def wfa_traceback_host(
    result: WfaBatchResult,
    b: int,
    seq1: bytes,
    seq2: bytes,
    penalties: WfaPenalties = WfaPenalties(),
) -> Tuple[int, str, str]:
    """Reconstruct one pair's alignment from the offset histories.

    Returns (penalty, aligned_seq1, aligned_seq2).  Tie priority:
    mismatch > I > D (deterministic, documented).
    """
    m_hist = np.asarray(result.m_hist[:, b, :])
    i_hist = np.asarray(result.i_hist[:, b, :])
    d_hist = np.asarray(result.d_hist[:, b, :])
    k_lo = result.k_lo
    if not bool(np.asarray(result.converged)[b]):
        raise AlignmentError("WFA did not converge within band/s_max")
    s = int(np.asarray(result.score)[b])
    n1, n2 = len(seq1), len(seq2)
    x_pen, o_pen, e_pen = penalties.mismatch, penalties.gap_open, penalties.gap_extend
    oe = o_pen + e_pen

    def hist(h, s_, k_):
        lane = k_ - k_lo
        if s_ < 0 or lane < 0 or lane >= h.shape[1] or s_ >= h.shape[0]:
            return NEG
        return int(h[s_, lane])

    a1: List[str] = []
    a2: List[str] = []
    state = "M"
    k = n1 - n2
    t = n2

    def emit_matches(n: int, t_end: int) -> None:
        # Matches ending at offset t_end (exclusive) on diagonal k.  The
        # whole walk is emitted back-to-front and reversed at the end, so
        # runs are appended last-column-first.
        for tt in range(t_end - 1, t_end - n - 1, -1):
            a1.append(chr(seq1[tt + k]))
            a2.append(chr(seq2[tt]))

    guard = 0
    while True:
        guard += 1
        if guard > 4 * (n1 + n2) + s + 16:
            raise AlignmentError("WFA traceback did not terminate")
        if state == "M":
            if s == 0:
                # initial seed: t leading matches on diag 0
                assert k == 0
                emit_matches(t, t)
                break
            mx = hist(m_hist, s - x_pen, k)
            iv = hist(i_hist, s, k)
            dv = hist(d_hist, s, k)
            t_pre = max(mx + 1 if mx > NEG else NEG, iv, dv)
            emit_matches(t - t_pre, t)
            t = t_pre
            if mx > NEG and t_pre == mx + 1:
                # mismatch column
                a1.append(chr(seq1[t - 1 + k]))
                a2.append(chr(seq2[t - 1]))
                s, t = s - x_pen, t - 1
            elif t_pre == iv:
                state = "I"
            else:
                state = "D"
        elif state == "I":
            # consume seq1[t + k - 1]; came from k-1 with same t
            a1.append(chr(seq1[t + k - 1]))
            a2.append("-")
            m_src = hist(m_hist, s - oe, k - 1)
            if m_src == t:
                s, k, state = s - oe, k - 1, "M"
            else:
                s, k = s - e_pen, k - 1
        else:  # D: consume seq2[t-1]; came from k+1 with t-1
            a1.append("-")
            a2.append(chr(seq2[t - 1]))
            m_src = hist(m_hist, s - oe, k + 1)
            if m_src == t - 1:
                s, k, t, state = s - oe, k + 1, t - 1, "M"
            else:
                s, k, t = s - e_pen, k + 1, t - 1

    return int(np.asarray(result.score)[b]), "".join(reversed(a1)), "".join(
        reversed(a2)
    )
