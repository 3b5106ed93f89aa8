"""Banded affine-NW tests: wide band == full Gotoh; narrow band contract."""

import random

import numpy as np
import pytest

from sequencealigning_tpu.errors import AlignmentError
from sequencealigning_tpu.io.encode import pack_batch
from sequencealigning_tpu.ops import oracle_gotoh
from sequencealigning_tpu.ops.nw_banded import nw_banded_batch
from sequencealigning_tpu.ops.traceback import banded_traceback_pair


def _pairs(seed, n=8, lo=2, hi=28, maxdiff=6):
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


@pytest.mark.parametrize("compat", [True, False])
def test_wide_band_equals_full_gotoh(compat):
    pairs = _pairs(41)
    batch = pack_batch(pairs, batch_size=8)
    r = nw_banded_batch(
        batch.query, batch.db, batch.query_len, batch.db_len,
        band=64, compat=compat,
    )
    finals = np.asarray(r.finals)
    for b, (s1, s2) in enumerate(pairs):
        m, i_, d = oracle_gotoh.gotoh_fill(s1, s2, compat=compat)
        exp = (int(m[-1, -1]), int(i_[-1, -1]), int(d[-1, -1]))
        assert tuple(int(v) for v in finals[b]) == exp, (b, s1, s2)


@pytest.mark.parametrize("compat", [True, False])
def test_wide_band_traceback_matches_oracle(compat):
    pairs = _pairs(43, n=6, hi=18)
    batch = pack_batch(pairs, batch_size=8)
    r = nw_banded_batch(
        batch.query, batch.db, batch.query_len, batch.db_len,
        band=48, compat=compat,
    )
    dirs = np.asarray(r.dirs)
    finals = np.asarray(r.finals)
    for b, (s1, s2) in enumerate(pairs):
        try:
            exp = oracle_gotoh.gotoh_traceback_all(s1, s2, compat=compat)
        except AlignmentError:
            exp = "ERR"
        try:
            got = banded_traceback_pair(
                dirs[:, b, :], finals[b], s1, s2, r.k_lo, compat=compat
            )
        except AlignmentError:
            got = "ERR"
        assert exp == got, (b, s1, s2)


def test_narrow_band_restricts_gaps():
    """A long indel outside the band must not be found; the banded score is
    the in-band optimum (here: mismatches instead of a 6-gap)."""
    s1 = b"AAAAAAACCCCCCCCCCCCCCCC"
    s2 = b"ACCCCCCCCCCCCCCCC"  # needs a 6-long leading query gap
    batch = pack_batch([(s1, s2)], batch_size=8)
    full = nw_banded_batch(
        batch.query, batch.db, batch.query_len, batch.db_len, band=32
    )
    narrow = nw_banded_batch(
        batch.query, batch.db, batch.query_len, batch.db_len, band=2
    )
    full_score = int(np.asarray(full.finals)[0].max())
    narrow_score = int(np.asarray(narrow.finals)[0].max())
    assert full_score == oracle_gotoh.gotoh_score(s1, s2)
    assert narrow_score <= full_score


def test_wildcard_band():
    batch = pack_batch([(b"NNNN", b"ACGT")], batch_size=8)
    r = nw_banded_batch(
        batch.query, batch.db, batch.query_len, batch.db_len,
        band=8, wildcard=True,
    )
    assert int(np.asarray(r.finals)[0].max()) == 20
