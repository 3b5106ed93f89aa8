"""Batched wavefront alignment (WFA, gap-affine) for TPU -- textbook mode.

TPU-native re-design of the reference's WFA (src/wfa.rs): instead of
score-indexed Vec<Option<...>> wavefronts with dynamic lo/hi bands, the
wavefronts are fixed-shape (B, K) offset vectors over a static diagonal band
k in [k_lo, k_hi] (absent diagonals = -inf mask), the greedy match-extension
is a precomputed run-length-table lookup (all diagonals of all pairs extend
simultaneously), and the score loop runs in fixed-size CHUNKS:

  * on-device fill state is a RING of the last max(o+e, e, x) + 1
    wavefronts per plane -- O(B * K), independent of the final score -- so
    the fill itself has no score ceiling (round-1 kept full (s_max, B, K)
    histories x3, making s_max a memory-bound divergence ceiling);
  * each chunk additionally emits its (S_CHUNK, B, K) int16 offset history
    (the compact traceback log -- offsets fit i16 for pairs <= 32 kb);
    the host accumulates chunks and the adaptive Python loop stops as soon
    as every live pair converged, so the `s_max` argument is only a
    safety cap, not an allocation size.

Coordinates (clean convention, unlike the reference's min(x,y) offsets --
see ops.oracle_wfa's module docstring for why the reference's own convention
is geometrically inconsistent): diag k = y - x, offset t = x (db chars
consumed), y = t + k.  Recurrence (Marco-Sola et al. 2021):

    I[s][k] = max(M[s-o-e][k-1], I[s-e][k-1])        (consume seq1)
    D[s][k] = max(M[s-o-e][k+1], D[s-e][k+1]) + 1    (consume seq2)
    M[s][k] = extend(max(M[s-x][k] + 1, I[s][k], D[s][k]))

Converged when M[s][k_target = n1-n2] == n2.  The static band plays the
role of the reference's adaptive trim (wfa.rs:490-623) as the pruning
device; band escapes are reported via the `converged` mask, and the model
layer retries escapees with a doubled band before the exact Gotoh fallback
(models.wfa).

The reference-compat WFA (bit-parity with the Rust, including its
convergence/trim/score quirks) lives in ops.oracle_wfa.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sequencealigning_tpu.config import WfaPenalties
from sequencealigning_tpu.errors import AlignmentError

NEG = -(2 ** 14)  # fits int16; parked far below any offset
S_CHUNK = 256


class WfaBatchResult:
    """score: (B,) int32 penalty (valid where converged); converged: (B,)
    bool; hist: (S_total, 3, B, K) int16 offsets (M, I, D) -- fetched from
    device lazily on first access, so score-only consumers never pay the
    history transfer."""

    def __init__(self, score, converged, hist_chunks, k_lo: int):
        self.score = score
        self.converged = converged
        self._chunks = hist_chunks
        self.k_lo = k_lo

    @property
    def hist(self) -> np.ndarray:
        if self._chunks is not None:
            self._hist = np.concatenate(
                [np.asarray(c) for c in self._chunks], axis=0
            )
            self._chunks = None
        return self._hist


def _build_runlen(seq1, seq2, n1v, n2v, k_lo: int, K: int):
    """runlen[t, b, k] = exact-match run length starting at offset t on
    diagonal k, via one reverse scan over the db axis (pure vector
    compares, no gathers).  Replaces the reference's per-character
    while-loop (wfa.rs:127-139)."""
    B = seq1.shape[0]
    T = seq2.shape[1]
    kv = k_lo + jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
    pad_l = max(0, -k_lo)
    seq1_pad = jnp.pad(
        seq1, ((0, 0), (pad_l, max(0, K + T + k_lo - seq1.shape[1]))),
        constant_values=-1,
    )

    def body(run, t):
        c2 = jax.lax.dynamic_slice_in_dim(seq2, t, 1, 1)
        s1w = jax.lax.dynamic_slice_in_dim(seq1_pad, t + pad_l + k_lo, K, 1)
        eq = jnp.logical_and(
            s1w == c2, jnp.logical_and(t < n2v, (t + kv) < n1v)
        )
        run = jnp.where(eq, run + 1, 0)
        return run, run.astype(jnp.int16)

    _, runs = jax.lax.scan(
        body,
        jnp.zeros((B, K), jnp.int32),
        jnp.arange(T - 1, -1, -1, dtype=jnp.int32),
    )
    return runs[::-1]  # (T, B, K) int16


@functools.partial(
    jax.jit, static_argnames=("k_lo", "k_hi", "penalties")
)
def _wfa_seed_jax(seq1, seq2, n1v, n2v, k_lo: int, k_hi: int,
                  penalties: WfaPenalties):
    """Seed s=0: leading match run on diagonal 0.  Returns (runlen, ring
    buffers preloaded with s=0, done0, score0, seed history row)."""
    B = seq1.shape[0]
    K = k_hi - k_lo + 1
    kv = k_lo + jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
    runlen = _build_runlen(seq1, seq2, n1v, n2v, k_lo, K)
    T = seq2.shape[1]
    k_target = n1v - n2v
    target_lane = jnp.clip(k_target - k_lo, 0, K - 1)

    run0 = runlen[0].astype(jnp.int32) if T > 0 else jnp.zeros((B, K), jnp.int32)
    m0 = jnp.where(kv == 0, run0, NEG)
    ok0 = jnp.logical_and(
        jnp.logical_and(m0 >= 0, m0 <= n2v),
        jnp.logical_and((m0 + kv) >= 0, (m0 + kv) <= n1v),
    )
    m0 = jnp.where(jnp.logical_and(kv == 0, ok0), m0, NEG)

    rl = max(penalties.gap_open + penalties.gap_extend,
             penalties.gap_extend, penalties.mismatch) + 1
    negs = jnp.full((rl, B, K), NEG, jnp.int32)
    ring_m = negs.at[0].set(m0)
    ring_i = negs
    ring_d = negs

    done0 = (jnp.take_along_axis(m0, target_lane, 1) >= n2v)[:, 0]
    done0 = jnp.logical_and(done0, (k_target >= k_lo)[:, 0])
    done0 = jnp.logical_and(done0, (k_target <= k_hi)[:, 0])
    score0 = jnp.where(done0, 0, -1).astype(jnp.int32)
    seed_row = jnp.stack(
        [m0, jnp.full((B, K), NEG, jnp.int32), jnp.full((B, K), NEG, jnp.int32)],
        axis=0,
    ).astype(jnp.int16)[None]  # (1, 3, B, K)
    return runlen, ring_m, ring_i, ring_d, done0, score0, seed_row


@functools.partial(
    jax.jit, static_argnames=("k_lo", "k_hi", "penalties")
)
def _wfa_chunk_jax(
    runlen, ring_m, ring_i, ring_d, s0, done, score,
    n1v, n2v, k_lo: int, k_hi: int, penalties: WfaPenalties,
):
    """Advance S_CHUNK score steps (s = s0 .. s0+S_CHUNK-1).  Fill state is
    the rings; the chunk's per-step offsets are emitted as an
    (S_CHUNK, 3, B, K) int16 history block for host traceback."""
    B, K = ring_m.shape[1:]
    x_pen = penalties.mismatch
    o_pen = penalties.gap_open
    e_pen = penalties.gap_extend
    oe = o_pen + e_pen
    rl = ring_m.shape[0]
    kv = k_lo + jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
    negs = jnp.full((B, K), NEG, jnp.int32)
    k_target = n1v - n2v
    target_lane = jnp.clip(k_target - k_lo, 0, K - 1)
    in_band = jnp.logical_and(k_target >= k_lo, k_target <= k_hi)[:, 0]
    T = runlen.shape[0]
    BIG = 2 ** 14  # parks absent lanes out of bounds so extend() skips them

    def ok(t):
        y = t + kv
        return jnp.logical_and(
            jnp.logical_and(t >= 0, t <= n2v),
            jnp.logical_and(y >= 0, y <= n1v),
        )

    def extend(t):
        idx = jnp.clip(t, 0, max(T - 1, 0))[None]
        if T == 0:
            return t
        run = jnp.take_along_axis(runlen, idx, axis=0)[0].astype(jnp.int32)
        return t + jnp.where(jnp.logical_and(t >= 0, t < T), run, 0)

    def shift_left(a):  # lane k reads k+1
        return jnp.concatenate([a[:, 1:], jnp.full((B, 1), NEG, a.dtype)], 1)

    def shift_right(a):  # lane k reads k-1
        return jnp.concatenate([jnp.full((B, 1), NEG, a.dtype), a[:, :-1]], 1)

    def ring_at(ring, s_):
        row = jax.lax.dynamic_slice(
            ring, (jnp.maximum(s_, 0) % rl, 0, 0), (1, B, K)
        )[0]
        return jnp.where(s_ >= 0, row, negs)

    def body(carry, i):
        ring_m, ring_i, ring_d, done, score = carry
        s = s0 + i
        m_oe = ring_at(ring_m, s - oe)
        m_x = ring_at(ring_m, s - x_pen)
        i_e = ring_at(ring_i, s - e_pen)
        d_e = ring_at(ring_d, s - e_pen)

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
        m_new = jnp.where(live, m_new, NEG)
        i_new = jnp.where(live, i_new, NEG)
        d_new = jnp.where(live, d_new, NEG)

        slot = s % rl
        ring_m = jax.lax.dynamic_update_slice(ring_m, m_new[None], (slot, 0, 0))
        ring_i = jax.lax.dynamic_update_slice(ring_i, i_new[None], (slot, 0, 0))
        ring_d = jax.lax.dynamic_update_slice(ring_d, d_new[None], (slot, 0, 0))

        hit = (jnp.take_along_axis(m_new, target_lane, 1) >= n2v)[:, 0]
        hit = jnp.logical_and(hit, in_band)
        newly = jnp.logical_and(hit, jnp.logical_not(done))
        score = jnp.where(newly, s, score)
        done = jnp.logical_or(done, hit)
        row = jnp.stack([m_new, i_new, d_new], axis=0).astype(jnp.int16)
        return (ring_m, ring_i, ring_d, done, score), row

    (ring_m, ring_i, ring_d, done, score), rows = jax.lax.scan(
        body, (ring_m, ring_i, ring_d, done, score),
        jnp.arange(S_CHUNK, dtype=jnp.int32),
    )
    return ring_m, ring_i, ring_d, done, score, rows


def wfa_textbook_batch(
    query: np.ndarray,
    db: np.ndarray,
    query_len: np.ndarray,
    db_len: np.ndarray,
    penalties: WfaPenalties = WfaPenalties(),
    band: int = 64,
    s_max: int = 16_384,
) -> WfaBatchResult:
    """Batched exact gap-affine WFA.  band = half-width of the static
    diagonal window beyond the batch's length-difference range; s_max is a
    safety cap on the penalty score (fill memory is score-independent)."""
    qlen = np.asarray(query_len)
    dlen = np.asarray(db_len)
    if int(dlen.max(initial=0)) >= 2 ** 14 or int(qlen.max(initial=0)) >= 2 ** 14:
        raise AlignmentError(
            "textbook WFA int16 offset log caps pairs at 16 kb; use the "
            "Gotoh engines for longer pairs"
        )
    diff = qlen.astype(np.int64) - dlen.astype(np.int64)
    k_lo = int(min(0, diff.min()) - band)
    k_hi = int(max(0, diff.max()) + band)
    # (Rounding K up to whole 128-lane vregs was tried and reverted: the
    # fill cost scales with K -- XLA handles the odd lane count fine.)

    args = (
        jnp.asarray(query, jnp.int32),
        jnp.asarray(db, jnp.int32),
        jnp.asarray(qlen, jnp.int32)[:, None],
        jnp.asarray(dlen, jnp.int32)[:, None],
    )
    runlen, ring_m, ring_i, ring_d, done, score, seed_row = _wfa_seed_jax(
        *args, k_lo, k_hi, penalties
    )
    chunks = [seed_row]
    s = 1
    # Dispatch several chunks per host convergence check: the (tiny) done
    # fetch then overlaps with chunk execution instead of stalling the
    # device once per chunk (measured: 183 -> 210 pairs/s at 10 kb).
    while s < s_max and not bool(np.asarray(done).all()):
        for _ in range(4):
            if s >= s_max:
                break
            ring_m, ring_i, ring_d, done, score, rows = _wfa_chunk_jax(
                runlen, ring_m, ring_i, ring_d, jnp.int32(s), done, score,
                args[2], args[3], k_lo, k_hi, penalties,
            )
            chunks.append(rows)
            s += S_CHUNK
    return WfaBatchResult(
        score=np.asarray(score), converged=np.asarray(done),
        hist_chunks=chunks, k_lo=k_lo,
    )


def wfa_traceback_host(
    result: WfaBatchResult,
    b: int,
    seq1: bytes,
    seq2: bytes,
    penalties: WfaPenalties = WfaPenalties(),
) -> Tuple[int, str, str]:
    """Reconstruct one pair's alignment from the offset history log.

    Returns (penalty, aligned_seq1, aligned_seq2).  Tie priority:
    mismatch > I > D (deterministic, documented).
    """
    import os

    if not bool(np.asarray(result.converged)[b]):
        raise AlignmentError("WFA did not converge within band/s_max")
    s = int(np.asarray(result.score)[b])
    if not os.environ.get("SEQALIGN_NO_NATIVE"):
        try:
            from sequencealigning_tpu import native

            if native.available():
                r = native.wfa_textbook_traceback_native(
                    result.hist, b, result.k_lo, s, seq1, seq2, penalties
                )
                if r is not None:
                    return s, r[0], r[1]
        except Exception:
            pass  # fall through to the Python walker
    hist_b = np.asarray(result.hist[:, :, b, :], np.int32)  # (S, 3, K)
    m_hist, i_hist, d_hist = hist_b[:, 0], hist_b[:, 1], hist_b[:, 2]
    k_lo = result.k_lo
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
