"""Oracle validation.

Strategy (mirrors + extends the reference's test DNA, SURVEY.md §4):
  (a) exact hand-computed golden cells/scores for tiny cases,
  (b) the reference's own algebraic tests ported (WFA recurrence equivalence
      and exact one-step tensors, src/wfa.rs:1003-1186),
  (c) brute-force enumeration cross-checks for the textbook modes,
  (d) properties: score(x,x), cross-algorithm agreement.
"""

import random

import numpy as np
import pytest

from sequencealigning_tpu.config import NEG_INF, ScoringScheme, WfaPenalties
from sequencealigning_tpu.errors import AlignmentError
from sequencealigning_tpu.ops import oracle_astar, oracle_gotoh, oracle_linear, oracle_wfa
from sequencealigning_tpu.ops.oracle_wfa import Element, Ocean, Tensor, WaveFront, tensor_new

SCHEME = ScoringScheme()


# --- brute force ground truth -------------------------------------------------


def brute_force_affine(seq1, seq2, match=5, mismatch=-4, o=-8, e=-6):
    """Max-score global affine alignment by exhaustive memoized recursion:
    state = (i, j, last_op). Textbook semantics: a gap of length L costs
    o + L*e; I->D and D->I transitions allowed (matching the oracle's
    recurrence which permits them only through M -- so restrict the same
    way: gaps may only open from M)."""
    from functools import lru_cache

    n1, n2 = len(seq1), len(seq2)

    @lru_cache(maxsize=None)
    def go(y, x, state):  # state: 0=M,1=I(consume seq1),2=D(consume seq2)
        if y == n1 and x == n2:
            return 0
        best = -(10 ** 9)
        if y < n1 and x < n2:
            sub = match if seq1[y] == seq2[x] else mismatch
            best = max(best, sub + go(y + 1, x + 1, 0))
        if y < n1 and state != 2:
            cost = e if state == 1 else o + e
            best = max(best, cost + go(y + 1, x, 1))
        if x < n2 and state != 1:
            cost = e if state == 2 else o + e
            best = max(best, cost + go(y, x + 1, 2))
        return best

    return go(0, 0, 0)


# --- Gotoh -------------------------------------------------------------------


def test_gotoh_hand_ac_ac():
    """Hand-computed full 3-plane matrix for AC x AC (compat)."""
    m, i_, d = oracle_gotoh.gotoh_fill(b"AC", b"AC", SCHEME, compat=True)
    assert m[0, 0] == 0 and i_[0, 0] == NEG_INF and d[0, 0] == NEG_INF
    assert d[0, 1] == -20 and d[0, 2] == -26  # row chain in D, o+(j+1)e
    assert i_[1, 0] == -20 and i_[2, 0] == -26
    assert m[1, 1] == 5 and i_[1, 1] == -26 and d[1, 1] == -26
    assert m[1, 2] == -24 and i_[1, 2] == -9 and d[1, 2] == -32
    assert m[2, 1] == -24 and i_[2, 1] == -32 and d[2, 1] == -9
    assert m[2, 2] == 10 and i_[2, 2] == -38 and d[2, 2] == -38
    assert oracle_gotoh.gotoh_score(b"AC", b"AC") == 10


def test_gotoh_identity_score():
    for s in (b"A", b"ACGT", b"ACGTACGTACGT"):
        assert oracle_gotoh.gotoh_score(s, s) == 5 * len(s)
        assert oracle_gotoh.gotoh_score(s, s, compat=False) == 5 * len(s)


def test_gotoh_textbook_matches_brute_force():
    rng = random.Random(0)
    for _ in range(25):
        n1 = rng.randint(1, 7)
        n2 = rng.randint(1, 7)
        s1 = bytes(rng.choice(b"ACGT") for _ in range(n1))
        s2 = bytes(rng.choice(b"ACGT") for _ in range(n2))
        expect = brute_force_affine(s1, s2)
        got = oracle_gotoh.gotoh_score(s1, s2, compat=False)
        assert got == expect, (s1, s2, got, expect)


def test_gotoh_compat_boundary_quirk():
    """Empty db: score is the compat D-chain o+(n+1)e, textbook o+n*e."""
    assert oracle_gotoh.gotoh_score(b"A", b"") == -20
    assert oracle_gotoh.gotoh_score(b"A", b"", compat=False) == -14
    assert oracle_gotoh.gotoh_score(b"", b"AA") == -26
    assert oracle_gotoh.gotoh_score(b"", b"AA", compat=False) == -20


def test_gotoh_traceback_simple():
    score, alns = oracle_gotoh.gotoh_traceback_all(b"ACGT", b"ACGT")
    assert score == 20
    assert alns == [("ACGT", "ACGT")]


def test_gotoh_traceback_mismatch_and_gap():
    score, alns = oracle_gotoh.gotoh_traceback_all(b"ACGT", b"AGT")
    # one deletion of C from query: 3 matches + gap(o+e)
    assert score == 3 * 5 - 14
    assert ("ACGT", "A-GT") in alns


def test_gotoh_traceback_co_optimal():
    """Equal-score placements of the gap must all be enumerated.

    In compat mode the boundary quirk (leading gap costs o+(k+1)e, one extra
    extend) makes the leading-gap placement '-AA' strictly worse, so the
    reference enumerates only the two interior placements; textbook mode
    has all three co-optimal."""
    score, alns = oracle_gotoh.gotoh_traceback_all(b"AAA", b"AA")
    assert score == 2 * 5 - 14
    assert {a for a, _ in alns} == {"AAA"}
    assert {b for _, b in alns} == {"AA-", "A-A"}

    score_t, alns_t = oracle_gotoh.gotoh_traceback_all(b"AAA", b"AA", compat=False)
    assert score_t == 2 * 5 - 14
    assert {b for _, b in alns_t} == {"AA-", "A-A", "-AA"}


def test_gotoh_textbook_boundary_traceback():
    score, alns = oracle_gotoh.gotoh_traceback_all(b"A", b"", compat=False)
    assert score == -14
    assert alns == [("A", "-")]


def test_gotoh_match_is_plain_equality():
    """No N-wildcard in the NW aligners (needleman_wunsch_affine.rs:220)."""
    assert oracle_gotoh.gotoh_score(b"N", b"A") == -4
    assert oracle_gotoh.gotoh_score(b"N", b"N") == 5


# --- linear NW ---------------------------------------------------------------


def test_linear_hand_ac_ac_compat():
    scores, paths, gaps = oracle_linear.linear_fill(b"AC", b"AC")
    assert scores[0, 0] == -16  # double-init quirk
    assert scores[0, 1] == -14 and scores[1, 0] == -14
    assert scores[1, 1] == -11
    assert scores[2, 2] == -6
    assert oracle_linear.linear_score(b"AC", b"AC") == -6


def test_linear_textbook():
    assert oracle_linear.linear_score(b"AC", b"AC", compat=False) == 10
    assert oracle_linear.linear_score(b"ACGT", b"ACGT", compat=False) == 20


def test_linear_local_smith_waterman():
    """Local mode: negative cells reset; best local exact match found."""
    score = oracle_linear.linear_score(b"TTTACGTTTT", b"GGACGGG", local=True)
    assert score == 15  # "ACG" exact local match
    hits = oracle_linear.linear_traceback(b"TTTACGTTTT", b"GGACGGG", local=True)
    assert any(h[0] == "ACG" and h[1] == "ACG" for h in hits)


def test_linear_global_traceback():
    hits = oracle_linear.linear_traceback(b"ACGT", b"ACGT", compat=False)
    assert hits[0][0] == "ACGT" and hits[0][1] == "ACGT"


# --- WFA: reference's own tests ported (executable spec) ---------------------


def _wf(hi, lo, elements):
    return WaveFront(hi=hi, lo=lo, elements=elements)


def _el(offset, parents, state):
    return Element(offset=offset, parents=parents, state=state)


M, I, D = oracle_wfa.M, oracle_wfa.I, oracle_wfa.D


def test_wavefront_tensor_new_all_none():
    """wfa.rs:994-1000."""
    assert tensor_new(None, None, None) is None


def test_recurrence_equivalence():
    """wfa.rs:1003-1102: the recurrence reads only M from the s-o-e and s-x
    predecessors and only I/D from s-e."""
    full = Tensor(
        i=_wf(-1, 2, [_el(1, [], I)] * 4),
        d=_wf(-2, 3, [_el(1, [], D)]),
        m=_wf(3, -2, [_el(1, [], I) for _ in range(6)]),
    )
    simple = Tensor(i=None, d=None, m=_wf(3, -2, [_el(1, [], I) for _ in range(6)]))
    simple_gap = Tensor(
        i=_wf(-1, 2, [_el(1, [], I)] * 4),
        d=_wf(-2, 3, [_el(1, [], D)]),
        m=None,
    )
    assert tensor_new(simple, None, None) == tensor_new(full, None, None)
    assert tensor_new(None, None, simple) == tensor_new(None, None, full)
    assert tensor_new(None, simple_gap, None) == tensor_new(None, full, None)


def test_initial_tensors():
    """wfa.rs:1105-1186: exact expected {I,D,M} tensors one step from the
    seed."""
    initial = Tensor(i=None, d=None, m=_wf(0, 0, [_el(0, [], M)]))
    res_o = tensor_new(initial, None, None)
    assert res_o == Tensor(
        i=_wf(1, 1, [_el(1, [M], I)]),
        d=_wf(-1, -1, [_el(0, [M], D)]),
        m=_wf(1, -1, [_el(0, [D], M), None, _el(1, [I], M)]),
    )
    res_m = tensor_new(None, None, initial)
    assert res_m == Tensor(i=None, d=None, m=_wf(0, 0, [_el(1, [M], M)]))


def test_iteration_smoke():
    """wfa.rs:1269-1286."""
    ocean = Ocean.global_()
    for _ in range(6):
        ocean.expand(b"AAAATTTTCCCC", b"AAAATCTCC")  # must not raise


def test_fresh_ocean_not_converged():
    """wfa.rs:1289-1294."""
    ocean = Ocean.global_()
    assert ocean.converged_element(b"AACATCA", b"ATAGTAG") is None


# --- WFA compat behaviour ------------------------------------------------------


def test_wfa_compat_aaa_score_17():
    """Hand-traced through the reference's arithmetic: identical 'AAA' pays
    its way to s=16 before a D-element lands exactly on (len-1, len-1), and
    the reported score is len(wfs) == 17.  (True WFA penalty would be 0.)"""
    score, ocean = oracle_wfa.wfa_align(b"AAA", b"AAA")
    assert score == 17


def test_wfa_compat_reference_pair():
    """The reference's own test pair (wfa.rs:1272-1273) converges."""
    s1, s2 = b"AAAATTTTCCCC", b"AAAATCTCC"
    score, ocean = oracle_wfa.wfa_align(s1, s2)
    assert score == len(ocean.wfs) == 25
    a1, a2 = oracle_wfa.wfa_traceback(ocean, s1, s2)
    assert isinstance(a1, str) and isinstance(a2, str)


def test_wfa_compat_nonconvergence_is_real():
    """Greedy extension overshoots the len-1 convergence cell whenever the
    final characters match (wfa.rs:127-139 vs :189), so identical 'ACGT'
    pairs never converge in the reference -- the emulation must reproduce
    that (bounded by max_steps here; the Rust binary hangs)."""
    with pytest.raises(AlignmentError):
        oracle_wfa.wfa_align(b"ACGT", b"ACGT", max_steps=500)


def test_wfa_compat_empty_raises():
    with pytest.raises(AlignmentError):
        oracle_wfa.wfa_align(b"", b"A")


def test_wfa_compat_deterministic():
    s1, s2 = b"AAAATTTTCCCC", b"AAAATCTCC"
    r1 = oracle_wfa.wfa_align(s1, s2)
    r2 = oracle_wfa.wfa_align(s1, s2)
    assert r1[0] == r2[0]
    t1 = oracle_wfa.wfa_traceback(r1[1], s1, s2)
    t2 = oracle_wfa.wfa_traceback(r2[1], s1, s2)
    assert t1 == t2


# --- WFA textbook -------------------------------------------------------------


def brute_force_wfa(seq1, seq2, x=4, o=2, e=6):
    """Min-penalty global alignment, penalties {0, x, o+e*L}, gaps open only
    from M (matching the WFA recurrence)."""
    from functools import lru_cache

    n1, n2 = len(seq1), len(seq2)

    @lru_cache(maxsize=None)
    def go(y, xx, state):
        if y == n1 and xx == n2:
            return 0
        best = 10 ** 9
        if y < n1 and xx < n2:
            sub = 0 if seq1[y] == seq2[xx] else x
            best = min(best, sub + go(y + 1, xx + 1, 0))
        if y < n1 and state != 2:
            cost = e if state == 1 else o + e
            best = min(best, cost + go(y + 1, xx, 1))
        if xx < n2 and state != 1:
            cost = e if state == 2 else o + e
            best = min(best, cost + go(y, xx + 1, 2))
        return best

    return go(0, 0, 0)


def test_wfa_textbook_identity():
    assert oracle_wfa.wfa_textbook_score(b"ACGTACGT", b"ACGTACGT") == 0


def test_wfa_textbook_single_mismatch():
    assert oracle_wfa.wfa_textbook_score(b"ACGTA", b"ACCTA") == 4


def test_wfa_textbook_single_gap():
    # one-char gap: o + e = 8
    assert oracle_wfa.wfa_textbook_score(b"ACGT", b"ACT") == 8


def test_wfa_textbook_matches_brute_force():
    rng = random.Random(1)
    for _ in range(25):
        n1 = rng.randint(1, 7)
        n2 = rng.randint(1, 7)
        s1 = bytes(rng.choice(b"ACGT") for _ in range(n1))
        s2 = bytes(rng.choice(b"ACGT") for _ in range(n2))
        expect = brute_force_wfa(s1, s2)
        got = oracle_wfa.wfa_textbook_score(s1, s2)
        assert got == expect, (s1, s2, got, expect)


# --- A* ------------------------------------------------------------------------


def test_astar_identity():
    score, a1, a2 = oracle_astar.astar_align(b"ACGT", b"ACGT")
    assert score == 20
    assert a1 == "ACGT" and a2 == "ACGT"


def test_astar_n_wildcard():
    score, _, _ = oracle_astar.astar_align(b"ANGT", b"ACGT")
    assert score == 20  # N matches anything (align.rs:298-304)


def test_astar_empty_raises():
    with pytest.raises(AlignmentError):
        oracle_astar.astar_align(b"", b"ACGT")


def test_astar_mismatch_vs_gotoh():
    """On well-behaved pairs the greedy-weighted search still lands on the
    optimal score; check agreement with Gotoh textbook on random
    low-divergence pairs."""
    rng = random.Random(2)
    for _ in range(10):
        n = rng.randint(4, 24)
        s1 = bytes(rng.choice(b"ACGT") for _ in range(n))
        l = list(s1)
        # 1 random substitution
        pos = rng.randrange(n)
        l[pos] = rng.choice([c for c in b"ACGT" if c != s1[pos]])
        s2 = bytes(l)
        score, a1, a2 = oracle_astar.astar_align(s1, s2)
        # A* uses N-wildcard matching but these have no N; alignment cost of
        # the returned path must be reproducible from the path itself.
        recomputed = 0
        gap_q = gap_d = False
        for cq, cd in zip(a1, a2):
            if cq == "-":
                recomputed += -6 if gap_q else -14
                gap_q, gap_d = True, gap_d
            elif cd == "-":
                recomputed += -6 if gap_d else -14
                gap_d = True
            else:
                recomputed += 5 if cq == cd else -4
                gap_q = gap_d = False
        assert score == recomputed


def test_astar_heap_is_max_heap():
    """align.rs:323-352 (test_queue): higher f pops first."""
    h = oracle_astar.RustBinaryHeap()
    s1 = oracle_astar.State(-10, 0, 0, 0, None, False, False)
    s2 = oracle_astar.State(-5, 4, 2, 3, None, False, False)
    h.push(s1)
    h.push(s2)
    assert h.pop() is s2


# --- cross-algorithm property -------------------------------------------------


def test_gotoh_compat_vs_textbook_interior():
    """When the optimal alignment has no boundary-touching gaps, compat and
    textbook agree."""
    rng = random.Random(3)
    for _ in range(10):
        n = rng.randint(4, 10)
        s = bytes(rng.choice(b"ACGT") for _ in range(n))
        assert oracle_gotoh.gotoh_score(s, s) == oracle_gotoh.gotoh_score(
            s, s, compat=False
        )


def test_astar_heuristic_bound():
    """Port of the reference's test_heuristic (align.rs:311-321):
    heuristic_d("AATG", "AATGAA", 0, 0) <= 2*gap_ext + 4*match.  Our
    _get_h = (1 + eps*w) * heuristic_d is even smaller (d < 0, weight > 1),
    so the same bound holds for the weighted value."""
    from sequencealigning_tpu.config import ScoringScheme
    from sequencealigning_tpu.ops.oracle_astar import _get_h

    scheme = ScoringScheme()
    bound = 2 * scheme.gap_extend + 4 * scheme.match_
    len1, len2 = 4, 6  # AATG vs AATGAA
    d = -((len1 - 0) + (len2 - 0))
    assert d <= bound
    h = _get_h(len1, len2, 0, 0, max(len1, len2), scheme.epsilon)
    assert h <= bound


def test_gotoh_textbook_symmetry():
    """Global textbook Gotoh is symmetric in its arguments (swap = transpose
    of the DP matrix; boundary chains are symmetric without the compat
    plane-swap quirk)."""
    rng = random.Random(9)
    for _ in range(8):
        s1 = bytes(rng.choice(b"ACGT") for _ in range(rng.randint(2, 12)))
        s2 = bytes(rng.choice(b"ACGT") for _ in range(rng.randint(2, 12)))
        assert oracle_gotoh.gotoh_score(
            s1, s2, compat=False
        ) == oracle_gotoh.gotoh_score(s2, s1, compat=False)


def test_wfa_penalty_equals_negated_affine_score():
    """Cross-algorithm identity: the WFA penalty equals -(affine NW score)
    under the equivalent maximizing scheme (match=0, mismatch=-x,
    open=-o, extend=-e) -- the correctness anchor BENCH config 3 uses."""
    from sequencealigning_tpu.config import ScoringScheme, WfaPenalties

    pen = WfaPenalties()
    eq = ScoringScheme(
        match_=0, mismatch=-pen.mismatch,
        gap_open=-pen.gap_open, gap_extend=-pen.gap_extend,
    )
    rng = random.Random(13)
    for _ in range(8):
        s1 = bytes(rng.choice(b"ACGT") for _ in range(rng.randint(2, 14)))
        s2 = bytes(rng.choice(b"ACGT") for _ in range(rng.randint(2, 14)))
        p = oracle_wfa.wfa_textbook_score(s1, s2, pen)
        g = oracle_gotoh.gotoh_score(s1, s2, scheme=eq, compat=False)
        assert p == -g, (s1, s2, p, g)
