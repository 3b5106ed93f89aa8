"""Anti-diagonal banded kernel (ops.nw_banded_diag) vs the row kernel."""

import random

import numpy as np
import pytest

from sequencealigning_tpu.config import ScoringScheme
from sequencealigning_tpu.io.encode import pack_batch
from sequencealigning_tpu.ops.nw_banded import nw_banded_batch
from sequencealigning_tpu.ops.nw_banded_diag import nw_banded_diag_batch
from sequencealigning_tpu.ops.traceback import (
    banded_diag_fast4_traceback_pair,
)


def _pairs(seed, n=8, lo=3, hi=40, maxdiff=6):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        n1 = rng.randint(lo, hi)
        n2 = rng.randint(max(lo, n1 - maxdiff), n1 + maxdiff)
        out.append(
            (
                bytes(rng.choice(b"ACGT") for _ in range(n1)),
                bytes(rng.choice(b"ACGT") for _ in range(n2)),
            )
        )
    return out


def _rescore(a1, a2, scheme, compat):
    s = 0
    in_gap = None
    for c1, c2 in zip(a1, a2):
        if c1 == "-" or c2 == "-":
            g = "1" if c1 == "-" else "2"
            s += scheme.gap_extend + (scheme.gap_open if in_gap != g else 0)
            in_gap = g
        else:
            s += scheme.match_ if c1 == c2 else scheme.mismatch
            in_gap = None
    if compat and a1 and (a1[0] == "-" or a2[0] == "-"):
        s += scheme.gap_extend  # leading-chain extra extension quirk
    return s


@pytest.mark.parametrize("compat", [True, False])
@pytest.mark.parametrize("band", [4, 16])
def test_diag_finals_equal_row_kernel(compat, band):
    pairs = _pairs(11 + band, n=8)
    b = pack_batch(pairs, batch_size=8)
    row = nw_banded_batch(
        b.query, b.db, b.query_len, b.db_len, band=band,
        compat=compat, with_dirs=False,
    )
    diag = nw_banded_diag_batch(
        b.query, b.db, b.query_len, b.db_len, band=band,
        compat=compat, with_dirs=False,
    )
    assert np.array_equal(np.asarray(row.finals), np.asarray(diag.finals))


@pytest.mark.parametrize("compat", [True, False])
def test_diag_pallas_interpret_matches_lax(compat):
    pairs = _pairs(29, n=8)
    b = pack_batch(pairs, batch_size=8)
    lax = nw_banded_diag_batch(
        b.query, b.db, b.query_len, b.db_len, band=8,
        compat=compat, with_dirs="fast4", backend="lax",
    )
    pal = nw_banded_diag_batch(
        b.query, b.db, b.query_len, b.db_len, band=8,
        compat=compat, with_dirs="fast4", backend="pallas",
    )
    assert np.array_equal(np.asarray(lax.finals), np.asarray(pal.finals))
    dl = np.asarray(lax.dirs)
    dp = np.asarray(pal.dirs)
    n = min(dl.shape[0], dp.shape[0])
    assert np.array_equal(dl[:n], dp[:n, :, : dl.shape[2]])


@pytest.mark.parametrize("compat", [True, False])
def test_diag_fast4_walker_valid_optimal(compat):
    scheme = ScoringScheme()
    pairs = _pairs(37, n=8, lo=4, hi=50, maxdiff=5)
    b = pack_batch(pairs, batch_size=8)
    res = nw_banded_diag_batch(
        b.query, b.db, b.query_len, b.db_len, band=16,
        compat=compat, with_dirs="fast4",
    )
    full = nw_banded_batch(
        b.query, b.db, b.query_len, b.db_len, band=16,
        compat=compat, with_dirs=False,
    )
    dirs = np.asarray(res.dirs)
    finals = np.asarray(res.finals)
    for j, (s1, s2) in enumerate(pairs):
        score, alns = banded_diag_fast4_traceback_pair(
            dirs[:, j, :], finals[j], s1, s2, res.k_lo_even, compat=compat
        )
        a1, a2 = alns[0]
        assert score == int(np.asarray(full.finals)[j].max())
        assert a1.replace("-", "").encode() == s1
        assert a2.replace("-", "").encode() == s2
        assert _rescore(a1, a2, scheme, compat) == score


def test_diag_band_covers_full_matrix_equals_unbanded():
    from sequencealigning_tpu.ops import oracle_gotoh

    pairs = _pairs(43, n=8, lo=3, hi=24, maxdiff=24)
    b = pack_batch(pairs, batch_size=8)
    res = nw_banded_diag_batch(
        b.query, b.db, b.query_len, b.db_len, band=64,
        compat=False, with_dirs=False,
    )
    for j, (s1, s2) in enumerate(pairs):
        want = oracle_gotoh.gotoh_score(s1, s2, compat=False)
        assert int(np.asarray(res.finals)[j].max()) == want


def test_diag_native_walker_matches_python():
    from sequencealigning_tpu import native
    from sequencealigning_tpu.ops.traceback import (
        banded_diag_fast4_traceback_batch,
    )

    if not native.available():
        pytest.skip("native library unavailable")
    pairs = _pairs(51, n=16, lo=4, hi=60, maxdiff=6)
    b = pack_batch(pairs, batch_size=16)
    res = nw_banded_diag_batch(
        b.query, b.db, b.query_len, b.db_len, band=16,
        compat=False, with_dirs="fast4",
    )
    dirs = np.asarray(res.dirs)
    finals = np.asarray(res.finals)
    batch_out = banded_diag_fast4_traceback_batch(
        dirs, finals, [p[0] for p in pairs], [p[1] for p in pairs],
        res.k_lo_even, compat=False,
    )
    for j, (s1, s2) in enumerate(pairs):
        score_py, alns_py = banded_diag_fast4_traceback_pair(
            dirs[:, j, :], finals[j], s1, s2, res.k_lo_even, compat=False
        )
        score_nat, alns_nat = batch_out[j]
        assert (score_nat, alns_nat) == (score_py, alns_py)


@pytest.mark.parametrize("compat", [True, False])
def test_diag_steady_state_body_matches_row_kernel(compat):
    """Pairs long enough that the kernel's peeled steady-state (no
    boundary selects) body runs: n1+n2 must exceed a_bnd ~ 2L (~250 at
    the minimum 128-lane width)."""
    pairs = _pairs(61, n=8, lo=150, hi=180, maxdiff=8)
    b = pack_batch(pairs, batch_size=8)
    row = nw_banded_batch(
        b.query, b.db, b.query_len, b.db_len, band=12,
        compat=compat, with_dirs=False, backend="lax",
    )
    diag = nw_banded_diag_batch(
        b.query, b.db, b.query_len, b.db_len, band=12,
        compat=compat, with_dirs="fast4", backend="pallas",
    )
    # The diag kernel clips its lanes to the row kernel's padded range,
    # so the two engines' finals agree EXACTLY at any requested band.
    assert np.array_equal(np.asarray(row.finals), np.asarray(diag.finals))
    dirs = np.asarray(diag.dirs)
    finals = np.asarray(diag.finals)
    scheme = ScoringScheme()
    for j, (s1, s2) in enumerate(pairs):
        want = int(finals[j].max())
        score, alns = banded_diag_fast4_traceback_pair(
            dirs[:, j, :], finals[j], s1, s2, diag.k_lo_even, compat=compat
        )
        a1, a2 = alns[0]
        assert _rescore(a1, a2, scheme, compat) == score == want


def test_diag_wildcard_matches_row_kernel():
    """BandedAligner runs the diag kernel with wildcard=True (N matches
    anything); finals must equal the row kernel's under the same flag."""
    rng = random.Random(73)
    pairs = []
    for _ in range(8):
        n1 = rng.randint(10, 50)
        mk = lambda n: bytes(rng.choice(b"ACGTN") for _ in range(n))
        pairs.append((mk(n1), mk(rng.randint(max(3, n1 - 5), n1 + 5))))
    b = pack_batch(pairs, batch_size=8)
    row = nw_banded_batch(
        b.query, b.db, b.query_len, b.db_len, band=8,
        compat=True, wildcard=True, with_dirs=False, backend="lax",
    )
    diag = nw_banded_diag_batch(
        b.query, b.db, b.query_len, b.db_len, band=8,
        compat=True, wildcard=True, with_dirs=False, backend="pallas",
    )
    assert np.array_equal(np.asarray(row.finals), np.asarray(diag.finals))


@pytest.mark.parametrize("compat", [True, False])
def test_diag_full_dirs_cooptimal_matches_row_layout(compat):
    """Full 7-bit diag layout: pallas == lax dirs, and the co-optimal
    enumeration (scores, alignments, ORDER) is identical to the row
    layout's -- the bytes encode the same cell values."""
    from sequencealigning_tpu.ops.traceback import (
        banded_diag_traceback_pair,
        banded_traceback_pair,
    )

    pairs = _pairs(83, n=8, lo=4, hi=60, maxdiff=6)
    b = pack_batch(pairs, batch_size=8)
    lax = nw_banded_diag_batch(
        b.query, b.db, b.query_len, b.db_len, band=16,
        compat=compat, with_dirs="full", backend="lax",
    )
    pal = nw_banded_diag_batch(
        b.query, b.db, b.query_len, b.db_len, band=16,
        compat=compat, with_dirs="full", backend="pallas",
    )
    dl = np.asarray(lax.dirs)
    dp = np.asarray(pal.dirs)
    # Compare the real wavefront range only: the pallas run's rounded-up
    # iteration count emits junk codes for all-invalid wavefronts past
    # the lax range (cells are NEGBIG == NEGBIG there); walkers address
    # aidx = x+y-1 < n1+n2 and never read them.
    n = (b.query.shape[1] + b.db.shape[1]) // 4
    n = min(n, dl.shape[0], dp.shape[0])
    assert np.array_equal(dl[:n], dp[:n, :, : dl.shape[2]])
    row = nw_banded_batch(
        b.query, b.db, b.query_len, b.db_len, band=16,
        compat=compat, with_dirs=True,
    )
    rdirs = np.asarray(row.dirs)
    rf = np.asarray(row.finals)
    df = np.asarray(pal.finals)
    assert np.array_equal(rf, df)
    for j, (s1, s2) in enumerate(pairs):
        want = banded_traceback_pair(
            rdirs[:, j, :], rf[j], s1, s2, row.k_lo, compat=compat,
            max_alignments=8,
        )
        got = banded_diag_traceback_pair(
            dp[:, j, :], df[j], s1, s2, pal.k_lo_even, compat=compat,
            max_alignments=8,
        )
        assert got == want


@pytest.mark.parametrize("unroll", [8, 16])
def test_diag_unroll_variants_match_default(unroll):
    """Bigger fori-body unrolls must be bit-identical to unroll=4 (finals
    AND packed dirs words) -- the unroll only regroups loop iterations."""
    pairs = _pairs(61, n=8)
    b = pack_batch(pairs, batch_size=8)
    base = nw_banded_diag_batch(
        b.query, b.db, b.query_len, b.db_len, band=8,
        compat=True, with_dirs="fast4", backend="pallas", unroll=4,
    )
    var = nw_banded_diag_batch(
        b.query, b.db, b.query_len, b.db_len, band=8,
        compat=True, with_dirs="fast4", backend="pallas", unroll=unroll,
    )
    assert np.array_equal(np.asarray(base.finals), np.asarray(var.finals))
    assert np.array_equal(np.asarray(base.dirs), np.asarray(var.dirs))
