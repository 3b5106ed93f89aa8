"""Debug-guard and profiling-hook tests."""

import numpy as np
import pytest

from sequencealigning_tpu.config import AlignConfig, Algo, ScoringScheme
from sequencealigning_tpu.io.fasta import Record
from sequencealigning_tpu.models import get_aligner
from sequencealigning_tpu.utils.guards import GuardError, check_finals, score_bounds
from sequencealigning_tpu.utils.profiling import PhaseTimer, trace


def test_score_bounds_bracket_oracle():
    from sequencealigning_tpu.ops import oracle_gotoh
    import random

    rng = random.Random(5)
    for _ in range(10):
        s1 = bytes(rng.choice(b"ACGT") for _ in range(rng.randint(2, 16)))
        s2 = bytes(rng.choice(b"ACGT") for _ in range(rng.randint(2, 16)))
        lo, hi = score_bounds(len(s1), len(s2), ScoringScheme())
        s = oracle_gotoh.gotoh_score(s1, s2, compat=False)
        assert lo <= s <= hi, (s1, s2, lo, s, hi)


def test_check_finals_rejects_bogus():
    finals = np.array([[10_000, 0, 0]], np.int32)
    with pytest.raises(GuardError):
        check_finals(finals, [4], [4])


def test_debug_mode_aligner_passes():
    cfg = AlignConfig(algo=Algo.NEEDLEMAN_WUNSCH, debug=True)
    al = get_aligner(cfg)
    q = Record(seq=b"ACGTACGT", name=b">q")
    d = Record(seq=b"ACGTCGT", name=b">d")
    res = al.align_pair(q, d)
    assert res.ok and res.score is not None


def test_phase_timer_and_trace_noop():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    assert "a" in t.phases
    with trace(None):
        pass
