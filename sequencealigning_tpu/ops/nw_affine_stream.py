"""Streamed-pair batched Gotoh fill: systolic pair pipelining on the lanes.

The plain anti-diagonal sweep (ops.nw_affine) wastes ~half the VPU lanes on
a square DP matrix: diagonal length ramps 1..min(n1,n2) and back down, so
the average valid width is ~P/2.  This kernel removes that loss with a
TPU-native trick with no analogue in the reference (which aligns one pair
at a time, src/main.rs:61-78): each sublane row hosts a *pipeline* of
pairs.  A new pair is launched into the lane dimension every S =
max(L1, L2)+1 steps, so pair k's shrinking tail triangle (lanes
[d-L1, L2]) interleaves exactly with pair k+1's growing head triangle
(lanes [0, d']); the two windows tile the full lane width and never
collide because S > L1 keeps d' < d - L1.

Mechanics per step t (p = t mod S is the *younger* pair's anti-diagonal):
  * the younger pair's query char enters at lane 0 (rolling buffer s1d,
    exactly as in ops.nw_affine);
  * its db char enters at the moving column-boundary lane p -- the db
    vector s2v is *state* here, not a constant input, and each lane's db
    code flips from pair k's to pair k+1's exactly when the younger
    boundary sweeps past it (the old pair's window has already left);
  * boundary chain overrides (reference init semantics,
    needleman_wunsch_affine.rs:172-216) are applied at lanes 0 and p for
    the younger pair only; the older pair's window is interior-only by
    construction and needs none;
  * per-pair corner scores (M/I/D at (n2, n1), the reference's traceback
    seed :247-280) are captured when the *owning* pair's local diagonal
    hits n1+n2; capture accumulators alternate between an even-slot and an
    odd-slot output block so the two concurrently-capturing pairs never
    share a buffer.

Direction bytes stream to HBM in the same packed-u32 layout as
ops.nw_affine/ops.dirbits, except the byte for cell (x, y) of pair slot k
lives at word (k*S + x + y) // 4 -- a per-pair diagonal offset t0 = k*S
(ops.traceback takes it as d_offset).

Two interchangeable implementations:
  * gotoh_fill_stream_lax    -- jax.lax.scan reference (CPU tests).
  * gotoh_fill_stream_pallas -- the TPU kernel (auto-interprets off-TPU).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sequencealigning_tpu.config import NEG_INF, ScoringScheme
from sequencealigning_tpu.ops import dirbits
from sequencealigning_tpu.ops.nw_affine import _boundary_scalars, _round_up


# Empirical single-kernel lane budget at the minimum row tile (BT=8): the 7
# (8, P) int32 state buffers fit Mosaic's VMEM allocator up to ~48k lanes
# (round-1 measurement).  Larger row tiles scale the limit down by 8/BT.
_STATE_LANE_BUDGET = 49_152


class StreamPlan(NamedTuple):
    """Layout of a streamed fill.  Pair b is slot (b % np_slots) of row
    (b // np_slots); its direction bytes use d_offset = slot * s."""

    n_pairs: int      # true pair count (before padding)
    np_slots: int     # pairs per row (pipeline depth)
    n_rows: int       # rows (>= n_pairs_padded / np_slots, multiple of 8)
    s: int            # launch period in steps (multiple of chunk, > L1)
    chunk: int
    n_slots_g: int    # np_slots + drain slots
    t_total: int      # total sweep steps = n_slots_g * s
    l1: int
    l2: int
    p: int            # lane width (multiple of 128, >= l2 + 2)

    def pair_coords(self, b: int) -> Tuple[int, int, int]:
        """(row, slot, d_offset) for pair b."""
        r, k = divmod(b, self.np_slots)
        return r, k, k * self.s


def plan_stream(
    n_pairs: int, l1: int, l2: int,
    chunk: int = 128, np_slots: Optional[int] = None,
) -> StreamPlan:
    if np_slots is None:
        # Deep enough to amortize the drain slot, shallow enough to keep
        # >= 8 rows (one full sublane tile).
        np_slots = max(1, min(8, n_pairs // 8))
    n_padded = _round_up(n_pairs, np_slots * 8)
    n_rows = n_padded // np_slots
    s = _round_up(max(l1, l2) + 1, chunk)
    d_total = l1 + l2 + 1
    # The last pair (slot np_slots-1) finishes at t = (np_slots-1)*s +
    # d_total - 1; round the sweep up to whole slots.
    t_need = (np_slots - 1) * s + d_total
    n_slots_g = -(-t_need // s)
    p = _round_up(l2 + 2, 128)
    # The VMEM feasibility check lives in gotoh_fill_stream_pallas where the
    # row-tile BT is known (scratch is 7 * BT * P * 4 bytes); plan_stream
    # only rejects widths that no BT can carry.
    if p > _STATE_LANE_BUDGET:
        raise ValueError(
            f"pair length {l2} exceeds the single-kernel VMEM budget "
            f"(~{_STATE_LANE_BUDGET // 1024}k lanes); use "
            "nw_affine_tiled_batch (ops.nw_affine_tiled) for long pairs"
        )
    return StreamPlan(
        n_pairs=n_pairs, np_slots=np_slots, n_rows=n_rows, s=s, chunk=chunk,
        n_slots_g=n_slots_g, t_total=n_slots_g * s, l1=l1, l2=l2, p=p,
    )


class StreamResult(NamedTuple):
    finals: np.ndarray             # (B, 3) int32 -- M/I/D at (n2, n1)
    dirs: Optional[jax.Array]      # (T4, n_rows, P) uint32 or None
    plan: StreamPlan


def stream_i16_neg(scheme: ScoringScheme, plan: StreamPlan) -> Optional[int]:
    """The -inf sentinel for int16 stream state, or None if the scheme x
    shape cannot be certified to fit int16.

    int16 state doubles VPU lane density (PERF.md's #1 lever, pending a
    Mosaic that compiles i16 vector ops).  Certification is closed-form:

    * every REAL DP cell is bounded below by per-consumed-char worst cost
      (a path to (x, y) consumes x+y chars at >= min(mismatch, e) each,
      plus two opens) and by the compat boundary chain o + (S+1)e;
    * the sentinel sits 64 below that, and one pre-clamp step can dip at
      most |o| + |e| + |mismatch| further -- all of which must stay above
      INT16_MIN (the per-step floor clamp in _stream_step stops any
      further decay);
    * stale (drain-window) lanes can GROW by at most match per step for S
      steps between boundary refreshes on top of the real maximum
      min(l1,l2) * match, which must stay below INT16_MAX.
    """
    o, e = scheme.gap_open, scheme.gap_extend
    mm, mt = scheme.mismatch, scheme.match_
    per_char = min(mm, e, 0)
    min_cell = (plan.l1 + plan.l2) * per_char + 2 * min(o, 0)
    chain_min = min(o, 0) + (plan.s + 1) * min(e, 0)
    neg = min(min_cell, chain_min) - 64
    dip = abs(o) + abs(e) + max(abs(mm), abs(mt))
    # Growth uses the largest POSITIVE per-step substitution: a scheme
    # with mismatch > match (CLI-expressible) grows by mismatch.
    max_cell = max(mt, mm, 0) * (min(plan.l1, plan.l2) + plan.s) + dip
    if neg - dip <= -(1 << 15) or max_cell >= (1 << 15):
        return None
    return neg


@functools.lru_cache(maxsize=1)
def stream_i16_supported() -> bool:
    """Whether the current backend compiles the int16 vector ops the
    streamed kernel needs (add/roll/compare/select on (16, 128) i16).

    The dev rig's remote Mosaic rejects ALL i16 vector arithmetic
    (PERF.md, re-probed every round); interpret mode always supports it.
    The probe compiles once per process and is cheap under the
    persistent compilation cache."""
    if jax.default_backend() != "tpu":
        return True

    def k(x_ref, o_ref):
        v = x_ref[...]
        # jnp.roll, matching the kernel's i16 path: this rig's remote
        # Mosaic compiles i16 jnp.roll but crashes on i16 pltpu.roll
        # (probed 2026-08-18; i32 keeps the measured-good pltpu.roll).
        w = jnp.roll(v, 1, axis=1) + jnp.asarray(1, jnp.int16)
        o_ref[...] = jnp.where(v >= w, jnp.maximum(v, w), v)

    try:
        x = jnp.zeros((16, 128), jnp.int16)
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int16)
        )(x)
        np.asarray(out)
        return True
    except Exception:
        return False


def resolve_stream_state(state_dtype, scheme: ScoringScheme, plan: StreamPlan):
    """Map a stream-state request to a concrete dtype.

    "i32"/None -> int32.  "i16" -> int16 (the fill raises if the scheme x
    shape is not certified).  "auto" -> int16 iff certified AND the
    backend compiles i16 vectors, else int32.  A concrete dtype passes
    through."""
    if state_dtype in (None, "i32"):
        return jnp.int32
    if state_dtype == "i16":
        return jnp.int16
    if state_dtype == "auto":
        if stream_i16_neg(scheme, plan) is None:
            return jnp.int32
        if jax.default_backend() == "tpu" and plan.n_rows % 16:
            # The (16, 128) minimum int16 sublane tile needs n_rows
            # divisible by 16 on real Mosaic; auto falls back silently.
            return jnp.int32
        return jnp.int16 if stream_i16_supported() else jnp.int32
    return state_dtype


# ---------------------------------------------------------------------------
# Shared single-step (state includes s2v; merged-roll D recurrence)
# ---------------------------------------------------------------------------


def _stream_step(
    H2, H1, M1, I1, D1, s1d, s2v,
    qc, dc, col_iota, lane_0, p,
    scheme: ScoringScheme, compat: bool, wildcard: bool,
    roll, dirs_mode,
    mode: str = "global",
    neg_sent: int = NEG_INF,
):
    """One anti-diagonal step.  qc/dc: (B, 1) younger query/db codes for
    this step.  lane_0: hoisted loop-invariant (col_iota == 0) mask.
    p: scalar, younger pair's local anti-diagonal.  dirs_mode: False/None
    (score only), "full" (7 tie bits/cell, co-optimal enumeration), or
    "fast4" (4 bits/cell: H-argmax plane code with M>I>D priority + the
    two extend flags -- exactly what a first-path walk needs).  Returns
    (M, I, D, H, s1d_new, s2v_new, byte).

    ``mode`` picks the boundary semantics at lanes 0 and p (the same hook
    as ops.nw_affine._gotoh_step): "global" = the compat/textbook gap
    chains; "semi" = free end gaps (M = 0, I = D = -inf); "local" adds
    the Smith-Waterman clamp M = max(M, 0) with restarts recorded as the
    LSTART dirs bit ("full" layout only).

    The state dtype is taken from the score buffers (int32, or int16 for
    2x VPU lane density when ``stream_i16_neg`` certifies the scheme x
    shape range).  In int16, ``neg_sent`` is the -inf sentinel and the
    accumulating I/D gap chains are floor-clamped to it each step so a
    never-refreshed lane cannot decay past INT16_MIN (the int32 sentinel
    survives S steps of decay for free; int16 does not)."""
    sdt = H2.dtype
    i16 = sdt == jnp.int16
    o = jnp.asarray(scheme.gap_open, sdt)
    e = jnp.asarray(scheme.gap_extend, sdt)
    sneg = jnp.asarray(neg_sent, sdt)

    lane_p = col_iota == p

    s1d_n = jnp.where(lane_0, qc, roll(s1d))
    s2v_n = jnp.where(lane_p, dc, s2v)

    if wildcard:
        eq = (s1d_n & s2v_n) != 0  # N-matches-anything (align.rs:298-304)
    else:
        eq = s1d_n == s2v_n
    sub = jnp.where(
        eq, jnp.asarray(scheme.match_, sdt), jnp.asarray(scheme.mismatch, sdt)
    )

    # Merged-roll Gotoh: D needs max(M,D)[x-1] so the max commutes with the
    # lane shift -- one roll instead of two (vs ops.nw_affine._gotoh_step).
    # In dirs modes the I/D maxes are written as compare+select so the
    # compares double as the extend flags (shared, not recomputed).
    t0 = M1 + o
    M = roll(H2) + sub
    restart = None
    if mode == "local":
        # int32, not bool: Mosaic cannot broadcast/rotate i1 vectors.
        restart = (M < 0).astype(jnp.int32)
        M = jnp.maximum(M, 0)
    if dirs_mode:
        ci = I1 >= t0
        cd = D1 >= t0
        D = roll(jnp.where(cd, D1, t0)) + e
        I = jnp.where(ci, I1, t0) + e
    else:
        D = roll(jnp.maximum(t0, D1)) + e
        I = jnp.maximum(t0, I1) + e
    if i16:
        # Floor the accumulating chains at the sentinel: the extend/open
        # flags above are computed pre-clamp (the clamp only binds on
        # invalid lanes, where the flags are never walked).
        I = jnp.maximum(I, sneg)
        D = jnp.maximum(D, sneg)

    if mode == "global":
        row0, col0 = _boundary_scalars(p, scheme, compat)
        if i16:
            row0 = tuple(
                jnp.maximum(v, jnp.int32(neg_sent)).astype(sdt) for v in row0
            )
            col0 = tuple(
                jnp.maximum(v, jnp.int32(neg_sent)).astype(sdt) for v in col0
            )
        M = jnp.where(lane_p, col0[0], M)
        I = jnp.where(lane_p, col0[1], I)
        D = jnp.where(lane_p, col0[2], D)
        M = jnp.where(lane_0, row0[0], M)
        # The I override at lane 0 cannot be dropped even in compat mode
        # (where row0's I is -inf): the origin's M = 0 seeds the *textbook*
        # I chain (o + p*e) through the recurrence at every slot restart.
        I = jnp.where(lane_0, row0[1], I)
        D = jnp.where(lane_0, row0[2], D)
    else:
        # Free end gaps (semi/local): boundary rows and columns hold M = 0
        # -- also the barrier that keeps the previous slot's garbage from
        # flowing into this pair's window (same role as the global chains).
        on_b = jnp.logical_or(lane_0, lane_p)
        M = jnp.where(on_b, 0, M)
        I = jnp.where(on_b, sneg, I)
        D = jnp.where(on_b, sneg, D)
        if mode == "local":
            restart = jnp.where(on_b, 1, restart)

    H = jnp.maximum(M, jnp.maximum(I, D))

    byte = None
    if dirs_mode == "full" or dirs_mode is True:
        b = (M == H).astype(jnp.int32) * dirbits.HM
        b |= (I == H).astype(jnp.int32) * dirbits.HI
        b |= (D == H).astype(jnp.int32) * dirbits.HD
        b |= ci.astype(jnp.int32) * dirbits.IEXT
        b |= (t0 >= I1).astype(jnp.int32) * dirbits.IOPEN
        dpre = cd.astype(jnp.int32) * dirbits.DEXT
        dpre |= (t0 >= D1).astype(jnp.int32) * dirbits.DOPEN
        b |= roll(dpre)
        if mode == "local":
            b |= restart * dirbits.LSTART
        byte = b
    elif dirs_mode == "fast4":
        code = jnp.where(
            M == H, 0, jnp.where(I == H, 1, 2)
        )  # argmax plane, priority M > I > D
        b = code
        b |= ci.astype(jnp.int32) * 4   # I from extend
        b |= roll(cd.astype(jnp.int32)) * 8  # D from extend
        byte = b

    return M, I, D, H, s1d_n, s2v_n, byte


# ---------------------------------------------------------------------------
# lax.scan reference implementation
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan", "scheme", "compat", "wildcard", "dirs_mode", "state_dtype"
    ),
)
def gotoh_fill_stream_lax(
    qstream, dstream, dsums, n2s,
    plan: StreamPlan, scheme: ScoringScheme,
    compat: bool, wildcard: bool, dirs_mode,
    state_dtype=jnp.int32,
):
    """qstream/dstream: (n_rows, t_total) int32 -- slot k's codes at
    [k*s+1, k*s+1+len); dsums/n2s: (np_slots, n_rows) int32.  Returns
    (fm, fi, fd) each (np_slots, n_rows) plus packed dirs or None."""
    R = qstream.shape[0]
    P = plan.p
    neg_sent = NEG_INF
    if state_dtype == jnp.int16:
        neg_sent = stream_i16_neg(scheme, plan)
        if neg_sent is None:
            raise ValueError("scheme x shape does not fit int16 state")
    neg = jnp.full((R, P), neg_sent, state_dtype)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (R, P), 1)
    lane_0 = col_iota == 0
    roll = lambda a: jnp.roll(a, 1, axis=1)
    s = jnp.int32(plan.s)

    def body(carry, t):
        H2, H1, M1, I1, D1, s1d, s2v, fm, fi, fd = carry
        p = t % s
        qc = jax.lax.dynamic_slice_in_dim(qstream, t, 1, axis=1)
        dc = jax.lax.dynamic_slice_in_dim(dstream, t, 1, axis=1)
        M, I, D, H, s1d, s2v, byte = _stream_step(
            H2, H1, M1, I1, D1, s1d, s2v, qc, dc, col_iota, lane_0, p,
            scheme, compat, wildcard, roll, dirs_mode,
            neg_sent=neg_sent,
        )
        for k in range(plan.np_slots):
            cap = jnp.logical_and(
                t == k * plan.s + dsums[k][:, None],
                col_iota == n2s[k][:, None],
            )
            fm = fm.at[k].add(
                jnp.where(cap, M, 0).sum(axis=1).astype(jnp.int32)
            )
            fi = fi.at[k].add(
                jnp.where(cap, I, 0).sum(axis=1).astype(jnp.int32)
            )
            fd = fd.at[k].add(
                jnp.where(cap, D, 0).sum(axis=1).astype(jnp.int32)
            )
        out = byte.astype(jnp.uint8) if dirs_mode else jnp.zeros((), jnp.uint8)
        return (H1, H, M, I, D, s1d, s2v, fm, fi, fd), out

    zeros = jnp.zeros((R, P), jnp.int32)
    fz = jnp.zeros((plan.np_slots, R), jnp.int32)
    carry0 = (neg, neg, neg, neg, neg, zeros, zeros, fz, fz, fz)
    carry, bytes_ = jax.lax.scan(
        body, carry0, jnp.arange(plan.t_total, dtype=jnp.int32)
    )
    fm, fi, fd = carry[7:]
    if dirs_mode == "fast4":
        T8 = plan.t_total // 8
        w = bytes_.reshape(T8, 8, R, P).astype(jnp.uint32)
        dirs = w[:, 0]
        for u in range(1, 8):
            dirs = dirs | (w[:, u] << (4 * u))
    elif dirs_mode:
        T4 = plan.t_total // 4
        w = bytes_.reshape(T4, 4, R, P).astype(jnp.uint32)
        dirs = w[:, 0] | (w[:, 1] << 8) | (w[:, 2] << 16) | (w[:, 3] << 24)
    else:
        dirs = None
    return (fm, fi, fd), dirs


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _stream_kernel(
    # inputs
    dsy_ref, n2y_ref, dso_ref, n2o_ref, q_ref, d2_ref,
    # outputs
    fm_e, fi_e, fd_e, fm_o, fi_o, fd_o, dirs_ref,
    # scratch
    H2, H1, M1, I1, D1, s1d, s2v,
    *, plan: StreamPlan,
    scheme: ScoringScheme, compat: bool, wildcard: bool, dirs_mode,
    unroll: int = 0,
    neg_sent: int = NEG_INF,
):
    upack = 8 if dirs_mode == "fast4" else 4
    shift = 32 // upack
    # Steps per fori_loop iteration: each loop iteration carries a fixed
    # overhead of a few microseconds (state spill/reload), so unroll more
    # steps than one dirs word covers.
    U = unroll if unroll else upack
    assert U % upack == 0 and plan.chunk % U == 0, (U, upack, plan.chunk)
    k = pl.program_id(1)
    cc = pl.program_id(2)
    BT, P = s2v.shape
    chunk = plan.chunk
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, P), 1)
    lane_0 = col_iota == 0
    # i16 state uses jnp.roll: this Mosaic crashes on i16 pltpu.roll
    # while i32 pltpu.roll is the measured-good fast path.
    roll = lambda a: (
        jnp.roll(a, 1, axis=1)
        if a.dtype == jnp.int16
        else pltpu.roll(a, 1, axis=1)
    )

    sdt = H2.dtype

    @pl.when(jnp.logical_and(k == 0, cc == 0))
    def _init_state():
        neg = jnp.full((BT, P), neg_sent, dtype=sdt)
        H2[...] = neg
        H1[...] = neg
        M1[...] = neg
        I1[...] = neg
        D1[...] = neg
        s1d[...] = jnp.zeros((BT, P), jnp.int32)
        s2v[...] = jnp.zeros((BT, P), jnp.int32)

    zero = jnp.zeros((BT, P), jnp.int32)

    @pl.when(jnp.logical_and(cc == 0, k % 2 == 0))
    def _init_even():
        fm_e[0] = zero
        fi_e[0] = zero
        fd_e[0] = zero

    @pl.when(jnp.logical_and(cc == 0, jnp.logical_or(k == 0, k % 2 == 1)))
    def _init_odd():
        fm_o[0] = zero
        fi_o[0] = zero
        fd_o[0] = zero

    dsy = dsy_ref[0]          # (BT, 1): younger pair's n1+n2 (or -1)
    n2y = n2y_ref[0]
    dso = dso_ref[0]          # older pair (slot k-1)
    n2o = n2o_ref[0]
    ymin, ymax = jnp.min(dsy), jnp.max(dsy)
    omin, omax = jnp.min(dso), jnp.max(dso)
    k_even = k % 2 == 0

    p0 = cc * chunk
    lanec = jax.lax.broadcasted_iota(jnp.int32, (BT, chunk), 1)
    # One masked lane-reduce per step instead of two: the q and d chunk
    # blocks are packed into one int32 word per lane (char codes are
    # 4-bit, io.encode), hoisted out of the step loop.
    qd_pack = q_ref[...] | (d2_ref[...] << 8)

    def gather_qd(i):
        v = jnp.sum(
            jnp.where(lanec == i, qd_pack, 0), axis=1, keepdims=True
        )
        return v & 0xFF, v >> 8

    def group_body(g, carry):
        vH2, vH1, vM1, vI1, vD1, vs1d, vs2v = carry
        wacc = None
        for u in range(U):
            i = g * U + u          # step index within chunk
            p = p0 + i             # younger local diagonal
            qc, dc = gather_qd(i)
            M, I, D, H, vs1d, vs2v, byte = _stream_step(
                vH2, vH1, vM1, vI1, vD1, vs1d, vs2v,
                qc, dc, col_iota, lane_0, p,
                scheme, compat, wildcard, roll, dirs_mode,
                neg_sent=neg_sent,
            )
            vH2, vH1, vM1, vI1, vD1 = vH1, H, M, I, D

            # Younger-pair capture (this slot k): parity of k picks the
            # even/odd accumulator block.  Older pair = slot k-1 at local
            # diagonal p + s, opposite parity.  All four branches are
            # chunk-rare (gated on the capture window).
            gy = jnp.logical_and(p >= ymin, p <= ymax)
            po = p + plan.s
            go = jnp.logical_and(po >= omin, po <= omax)

            @pl.when(jnp.logical_and(gy, k_even))
            def _cap_ye(M=M, I=I, D=D, p=p):
                cap = jnp.logical_and(dsy == p, col_iota == n2y)
                fm_e[0] += jnp.where(cap, M, 0).astype(jnp.int32)
                fi_e[0] += jnp.where(cap, I, 0).astype(jnp.int32)
                fd_e[0] += jnp.where(cap, D, 0).astype(jnp.int32)

            @pl.when(jnp.logical_and(gy, jnp.logical_not(k_even)))
            def _cap_yo(M=M, I=I, D=D, p=p):
                cap = jnp.logical_and(dsy == p, col_iota == n2y)
                fm_o[0] += jnp.where(cap, M, 0).astype(jnp.int32)
                fi_o[0] += jnp.where(cap, I, 0).astype(jnp.int32)
                fd_o[0] += jnp.where(cap, D, 0).astype(jnp.int32)

            @pl.when(jnp.logical_and(go, jnp.logical_not(k_even)))
            def _cap_oe(M=M, I=I, D=D, po=po):
                cap = jnp.logical_and(dso == po, col_iota == n2o)
                fm_e[0] += jnp.where(cap, M, 0).astype(jnp.int32)
                fi_e[0] += jnp.where(cap, I, 0).astype(jnp.int32)
                fd_e[0] += jnp.where(cap, D, 0).astype(jnp.int32)

            @pl.when(jnp.logical_and(go, k_even))
            def _cap_oo(M=M, I=I, D=D, po=po):
                cap = jnp.logical_and(dso == po, col_iota == n2o)
                fm_o[0] += jnp.where(cap, M, 0).astype(jnp.int32)
                fi_o[0] += jnp.where(cap, I, 0).astype(jnp.int32)
                fd_o[0] += jnp.where(cap, D, 0).astype(jnp.int32)

            if dirs_mode:
                word = byte.astype(jnp.uint32) << (shift * (u % upack))
                wacc = word if u % upack == 0 else wacc | word
                if (u + 1) % upack == 0:
                    dirs_ref[pl.ds(g * (U // upack) + u // upack, 1), :, :] = (
                        wacc[None]
                    )
        return (vH2, vH1, vM1, vI1, vD1, vs1d, vs2v)

    carry0 = (H2[...], H1[...], M1[...], I1[...], D1[...], s1d[...], s2v[...])
    carry = jax.lax.fori_loop(0, chunk // U, group_body, carry0)
    H2[...], H1[...], M1[...], I1[...], D1[...], s1d[...], s2v[...] = carry


def gotoh_fill_stream_pallas(
    qstream, dstream, dsy, n2y, dso, n2o,
    plan: StreamPlan, scheme: ScoringScheme,
    compat: bool, wildcard: bool, dirs_mode,
    interpret: Optional[bool] = None,
    bt: int = 8,
    unroll: int = 32,
    state_dtype=jnp.int32,
):
    """qstream/dstream: (n_rows, t_total) int32; dsy/n2y/dso/n2o:
    (n_slots_g, n_rows, 1) int32 per-slot capture params (younger and
    older = shifted-by-one views).  Returns ((fm, fi, fd) each
    (J, n_rows, P) where J = (n_slots_g+1)//2 -- index k//2, parity k%2
    picks even/odd -- and dirs).

    state_dtype=jnp.int16 halves the score-state vreg footprint (2x VPU
    lane density) when stream_i16_neg certifies the scheme x shape;
    finals and dirs layouts are unchanged (still int32/uint32)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R = qstream.shape[0]
    P = plan.p
    neg_sent = NEG_INF
    if state_dtype == jnp.int16:
        neg_sent = stream_i16_neg(scheme, plan)
        if neg_sent is None:
            raise ValueError("scheme x shape does not fit int16 state")
        if bt < 16:
            bt = 16  # int16 min sublane tile is (16, 128)
    BT = bt if R % bt == 0 else (8 if R % 8 == 0 else R)
    if not interpret and state_dtype == jnp.int16 and BT % 16:
        # The BT fallback for non-multiple row counts would drop below the
        # int16 (16, 128) minimum sublane tile; fail with guidance rather
        # than an opaque Mosaic lowering error.
        raise ValueError(
            f"int16 state needs n_rows divisible by 16 (got {R}); raise "
            "np_slots/batch so n_rows is a multiple of 16, or use int32"
        )
    # VMEM feasibility at the actual row tile and dtype: scratch is
    # 5 score buffers of the state dtype + 2 int32 char buffers per lane
    # (ADVICE round 1: the plan-time guard assumed BT=8/int32 and let
    # larger tiles hit an opaque Mosaic allocation error).  The empirical
    # budget constant was measured with 28 bytes/lane (int32).
    bytes_per_lane = 5 * jnp.dtype(state_dtype).itemsize + 2 * 4
    if not interpret and BT * P * bytes_per_lane > (
        8 * _STATE_LANE_BUDGET * 28
    ):
        raise ValueError(
            f"lane width {P} with row tile bt={BT} exceeds the VMEM state "
            f"budget ({8 * _STATE_LANE_BUDGET * 28 // (BT * bytes_per_lane)}"
            " lanes at this bt/dtype); lower bt or use ops.nw_affine_tiled "
            "for long pairs"
        )
    NB = R // BT
    NCC = plan.s // plan.chunk
    J = (plan.n_slots_g + 1) // 2
    upack = 8 if dirs_mode == "fast4" else 4
    T4 = plan.t_total // upack

    grid = (NB, plan.n_slots_g, NCC)
    kernel = functools.partial(
        _stream_kernel, plan=plan, scheme=scheme,
        compat=compat, wildcard=wildcard, dirs_mode=dirs_mode,
        unroll=unroll, neg_sent=neg_sent,
    )
    bspec = lambda shp, imap: pl.BlockSpec(shp, imap, memory_space=pltpu.VMEM)
    in_specs = [
        bspec((1, BT, 1), lambda b, k, cc: (k, b, 0)),        # dsy
        bspec((1, BT, 1), lambda b, k, cc: (k, b, 0)),        # n2y
        bspec((1, BT, 1), lambda b, k, cc: (k, b, 0)),        # dso (shifted)
        bspec((1, BT, 1), lambda b, k, cc: (k, b, 0)),        # n2o (shifted)
        bspec((BT, plan.chunk), lambda b, k, cc: (b, k * NCC + cc)),
        bspec((BT, plan.chunk), lambda b, k, cc: (b, k * NCC + cc)),
    ]
    fspec_e = bspec((1, BT, P), lambda b, k, cc: (k // 2, b, 0))
    fspec_o = bspec(
        (1, BT, P), lambda b, k, cc: (jnp.maximum(k - 1, 0) // 2, b, 0)
    )
    out_specs = [
        fspec_e, fspec_e, fspec_e, fspec_o, fspec_o, fspec_o,
        bspec(
            (plan.chunk // upack if dirs_mode else 1, BT, P),
            (lambda b, k, cc: (k * NCC + cc, b, 0))
            if dirs_mode
            else (lambda b, k, cc: (0, b, 0)),
        ),
    ]
    out_shape = [jax.ShapeDtypeStruct((J, R, P), jnp.int32)] * 6 + [
        jax.ShapeDtypeStruct((T4 if dirs_mode else 1, R, P), jnp.uint32)
    ]
    # 5 score buffers in the state dtype; the two char buffers stay int32.
    scratch = [pltpu.VMEM((BT, P), state_dtype) for _ in range(5)] + [
        pltpu.VMEM((BT, P), jnp.int32) for _ in range(2)
    ]
    fm_e, fi_e, fd_e, fm_o, fi_o, fd_o, dirs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(dsy, n2y, dso, n2o, qstream, dstream)
    return (fm_e, fi_e, fd_e, fm_o, fi_o, fd_o), (dirs if dirs_mode else None)


@functools.lru_cache(maxsize=64)
def _jitted_stream_pallas(plan, scheme, compat, wildcard, dirs_mode):
    """One jitted dispatch per configuration: eager per-op dispatch through
    a remote-device tunnel costs ~0.7 s flat (PERF.md), so the whole fill
    must go out as one executable."""
    return jax.jit(
        functools.partial(
            gotoh_fill_stream_pallas,
            plan=plan, scheme=scheme, compat=compat,
            wildcard=wildcard, dirs_mode=dirs_mode,
        )
    )


def _device_stream_inputs(q_all, d_all, qlen, dlen, plan: StreamPlan):
    """JAX-side equivalent of build_stream_inputs, fused into the jitted
    fill so each call ships only the raw 1-byte/char padded sequences --
    the (R, t_total) int32 streams are ~5x fatter, and host->device
    transfer per call dominates small-batch fills (PERF.md)."""
    NP, R, S = plan.np_slots, plan.n_rows, plan.s
    L1 = q_all.shape[1]
    L2 = d_all.shape[1]
    q_r = q_all.astype(jnp.int32).reshape(R, NP, L1)
    d_r = d_all.astype(jnp.int32).reshape(R, NP, L2)
    qstream = jnp.zeros((R, plan.t_total), jnp.int32)
    dstream = jnp.zeros((R, plan.t_total), jnp.int32)
    for k in range(NP):
        qstream = jax.lax.dynamic_update_slice(
            qstream, q_r[:, k], (0, k * S + 1)
        )
        dstream = jax.lax.dynamic_update_slice(
            dstream, d_r[:, k], (0, k * S + 1)
        )
    G = plan.n_slots_g
    dsum_k = (qlen + dlen).astype(jnp.int32).reshape(R, NP).T  # (NP, R)
    n2_k = dlen.astype(jnp.int32).reshape(R, NP).T
    fill = jnp.full((G, R), -1, jnp.int32)
    dsy = fill.at[:NP].set(dsum_k)[:, :, None]
    n2y = fill.at[:NP].set(n2_k)[:, :, None]
    hi = min(NP + 1, G)
    dso = fill.at[1:hi].set(dsum_k[: hi - 1])[:, :, None]
    n2o = fill.at[1:hi].set(n2_k[: hi - 1])[:, :, None]
    return qstream, dstream, dsy, n2y, dso, n2o


@functools.lru_cache(maxsize=64)
def _jitted_stream_prep_pallas(
    plan, scheme, compat, wildcard, dirs_mode, state_dtype=jnp.int32
):
    """Device-side stream prep + fill as ONE jitted dispatch."""

    def run(q_all, d_all, qlen, dlen):
        ins = _device_stream_inputs(q_all, d_all, qlen, dlen, plan)
        return gotoh_fill_stream_pallas(
            *ins, plan=plan, scheme=scheme, compat=compat,
            wildcard=wildcard, dirs_mode=dirs_mode, state_dtype=state_dtype,
        )

    return jax.jit(run)


# ---------------------------------------------------------------------------
# Host-side input prep and device-side finals assembly
# ---------------------------------------------------------------------------


def build_stream_inputs(
    query: np.ndarray, db: np.ndarray,
    query_len: np.ndarray, db_len: np.ndarray,
    plan: StreamPlan,
):
    """Lay the padded batch out as per-row code streams + per-slot capture
    params.  query/db must already be padded to plan.n_rows * plan.np_slots
    pairs.  Returns (qstream, dstream, dsy, n2y, dso, n2o) numpy arrays."""
    NP, R, S = plan.np_slots, plan.n_rows, plan.s
    L1 = query.shape[1]
    L2 = db.shape[1]
    q_r = np.asarray(query, np.int32).reshape(R, NP, L1)
    d_r = np.asarray(db, np.int32).reshape(R, NP, L2)
    qstream = np.zeros((R, plan.t_total), np.int32)
    dstream = np.zeros((R, plan.t_total), np.int32)
    for k in range(NP):
        qstream[:, k * S + 1 : k * S + 1 + L1] = q_r[:, k]
        dstream[:, k * S + 1 : k * S + 1 + L2] = d_r[:, k]
    return (qstream, dstream) + capture_params(query_len, db_len, plan)


def capture_params(query_len, db_len, plan: StreamPlan):
    """Per-slot capture parameters: (dsy, n2y, dso, n2o), the younger and
    older (shifted-by-one-slot) views of each pair's n1+n2 / n2, padded
    with -1 for the drain slots."""
    NP, R, G = plan.np_slots, plan.n_rows, plan.n_slots_g
    dsum_k = (
        np.asarray(query_len, np.int32) + np.asarray(db_len, np.int32)
    ).reshape(R, NP).T
    n2_k = np.asarray(db_len, np.int32).reshape(R, NP).T
    dsy = np.full((G, R, 1), -1, np.int32)
    n2y = np.full((G, R, 1), -1, np.int32)
    dsy[:NP, :, 0] = dsum_k
    n2y[:NP, :, 0] = n2_k
    dso = np.full((G, R, 1), -1, np.int32)
    n2o = np.full((G, R, 1), -1, np.int32)
    hi = min(NP + 1, G)
    dso[1:hi, :, 0] = dsum_k[: hi - 1]
    n2o[1:hi, :, 0] = n2_k[: hi - 1]
    return dsy, n2y, dso, n2o


def stream_finals(outs, np_slots: int) -> jax.Array:
    """Assemble (R*np_slots, 3) pair finals from the kernel's six parity
    output blocks (jnp, jit/shard_map-safe).  Pair order is row-major
    (pair b = slot b % np_slots of row b // np_slots)."""
    fm_e, fi_e, fd_e, fm_o, fi_o, fd_o = outs
    idx = np.arange(np_slots)
    even = jnp.asarray((idx % 2 == 0)[:, None])
    j = idx // 2

    def pick(e, o):
        e = e.sum(axis=2)  # (J, R)
        o = o.sum(axis=2)
        return jnp.where(even, jnp.take(e, j, axis=0), jnp.take(o, j, axis=0))

    fm = pick(fm_e, fm_o)  # (NP, R)
    fi = pick(fi_e, fi_o)
    fd = pick(fd_e, fd_o)
    return jnp.stack(
        [fm.T.reshape(-1), fi.T.reshape(-1), fd.T.reshape(-1)], axis=1
    )


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


def nw_affine_stream_batch(
    query: np.ndarray,
    db: np.ndarray,
    query_len: np.ndarray,
    db_len: np.ndarray,
    scheme: ScoringScheme = ScoringScheme(),
    compat: bool = True,
    wildcard: bool = False,
    with_dirs = True,
    backend: str = "auto",
    np_slots: Optional[int] = None,
    chunk: int = 128,
    state_dtype=jnp.int32,
) -> StreamResult:
    """Streamed batched Gotoh fill.  Same contract as
    ops.nw_affine.nw_affine_batch but ~2x the lane efficiency on uniform
    batches.  Pads the batch to a multiple of np_slots*8 pairs internally
    (padded lanes are stripped from finals).  state_dtype: a dtype or
    "i32"/"i16"/"auto" (resolve_stream_state)."""
    B, L1 = query.shape
    _, L2 = db.shape
    plan = plan_stream(B, L1, L2, chunk=chunk, np_slots=np_slots)
    state_dtype = resolve_stream_state(state_dtype, scheme, plan)
    NP, R = plan.np_slots, plan.n_rows
    n_padded = NP * R

    q_all = np.zeros((n_padded, L1), np.int8)
    d_all = np.zeros((n_padded, L2), np.int8)
    q_all[:B] = query
    d_all[:B] = db
    qlen = np.ones(n_padded, np.int32)
    dlen = np.ones(n_padded, np.int32)
    qlen[:B] = np.asarray(query_len, np.int32)
    dlen[:B] = np.asarray(db_len, np.int32)

    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "lax"

    dirs_mode = "full" if with_dirs is True else with_dirs
    if backend == "pallas":
        fn = _jitted_stream_prep_pallas(
            plan, scheme, compat, wildcard, dirs_mode, state_dtype
        )
        outs, dirs = fn(
            jnp.asarray(q_all), jnp.asarray(d_all),
            jnp.asarray(qlen), jnp.asarray(dlen),
        )
        finals = np.asarray(stream_finals(outs, NP))
    elif backend == "lax":
        qstream, dstream, dsy, n2y, dso, n2o = build_stream_inputs(
            q_all.astype(np.int32), d_all.astype(np.int32), qlen, dlen, plan
        )
        (fm, fi, fd), dirs = gotoh_fill_stream_lax(
            jnp.asarray(qstream), jnp.asarray(dstream),
            jnp.asarray(dsy[:NP, :, 0]), jnp.asarray(n2y[:NP, :, 0]),
            plan, scheme, compat, wildcard, dirs_mode,
            state_dtype=state_dtype,
        )
        fm, fi, fd = np.asarray(fm), np.asarray(fi), np.asarray(fd)
        finals = np.stack(
            [fm.T.reshape(-1), fi.T.reshape(-1), fd.T.reshape(-1)], axis=1
        )
    else:
        raise ValueError(f"unknown backend {backend!r}")

    return StreamResult(
        finals=np.asarray(finals)[:B].astype(np.int32), dirs=dirs, plan=plan
    )
