"""Linear/gap-state NW kernel tests vs the oracle."""

import random

import numpy as np
import pytest

from sequencealigning_tpu.io.encode import pack_batch
from sequencealigning_tpu.ops import oracle_linear
from sequencealigning_tpu.ops.nw_linear import nw_linear_batch
from sequencealigning_tpu.ops.traceback import linear_traceback_pair


def _random_pairs(seed, n=8, lo=2, hi=25):
    rng = random.Random(seed)
    return [
        (
            bytes(rng.choice(b"ACGT") for _ in range(rng.randint(lo, hi))),
            bytes(rng.choice(b"ACGT") for _ in range(rng.randint(lo, hi))),
        )
        for _ in range(n)
    ]


@pytest.mark.parametrize("compat", [True, False])
def test_global_scores_match_oracle(compat):
    pairs = _random_pairs(23)
    batch = pack_batch(pairs, batch_size=8)
    r = nw_linear_batch(
        batch.query, batch.db, batch.query_len, batch.db_len, compat=compat
    )
    for b, (s1, s2) in enumerate(pairs):
        exp = oracle_linear.linear_score(s1, s2, compat=compat)
        assert int(np.asarray(r.score)[b]) == exp, (b, s1, s2)


def test_local_scores_match_oracle():
    pairs = _random_pairs(29)
    batch = pack_batch(pairs, batch_size=8)
    r = nw_linear_batch(
        batch.query, batch.db, batch.query_len, batch.db_len, local=True
    )
    for b, (s1, s2) in enumerate(pairs):
        exp = oracle_linear.linear_score(s1, s2, local=True)
        assert int(np.asarray(r.score)[b]) == exp, (b, s1, s2)


@pytest.mark.parametrize("local", [False, True])
def test_traceback_matches_oracle(local):
    pairs = _random_pairs(31, n=4, hi=12)
    batch = pack_batch(pairs, batch_size=8)
    r = nw_linear_batch(
        batch.query, batch.db, batch.query_len, batch.db_len, local=local
    )
    dirs = np.asarray(r.dirs)
    for b, (s1, s2) in enumerate(pairs):
        exp = oracle_linear.linear_traceback(s1, s2, local=local)
        got = linear_traceback_pair(dirs[:, b, :], s1, s2, local=local)
        assert exp == got, (b, s1, s2, exp[:2], got[:2])


def test_local_exact_match_hit():
    pairs = [(b"TTTACGTTTT", b"GGACGGG")]
    batch = pack_batch(pairs, batch_size=8)
    r = nw_linear_batch(
        batch.query, batch.db, batch.query_len, batch.db_len, local=True
    )
    assert int(np.asarray(r.score)[0]) == 15
    hits = linear_traceback_pair(np.asarray(r.dirs)[:, 0, :], *pairs[0], local=True)
    assert any(h[0] == "ACG" and h[1] == "ACG" for h in hits)


def test_compat_origin_quirk():
    batch = pack_batch([(b"AC", b"AC")], batch_size=8)
    r = nw_linear_batch(batch.query, batch.db, batch.query_len, batch.db_len)
    assert int(np.asarray(r.score)[0]) == -6  # double-init origin propagates
    r2 = nw_linear_batch(
        batch.query, batch.db, batch.query_len, batch.db_len, compat=False
    )
    assert int(np.asarray(r2.score)[0]) == 10
