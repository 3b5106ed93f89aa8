"""On-device WFA traceback from the offset-history log (VERDICT r4
item 7): the (S, 3, B, K) int16 log never leaves the device; a lax.scan
walks all pairs at once (3 history gathers per step, branchless state
machine) and emits RLE op runs that feed the same
rle_expand_packed + decode_packed_alignments pipeline as the Gotoh
device walks.  Contract: bit-identical alignments to
ops.wfa.wfa_traceback_host (same mismatch > I > D tie priority, same
open-vs-extend probes)."""

import numpy as np

from sequencealigning_tpu.config import AlignConfig, Algo, WfaPenalties
from sequencealigning_tpu.io.encode import pack_batch
from sequencealigning_tpu.models.wfa import WfaAligner
from sequencealigning_tpu.ops.wfa import (
    wfa_textbook_batch,
    wfa_traceback_device,
    wfa_traceback_host,
)

ALPHA = np.frombuffer(b"ACGT", np.uint8)


def _mk_pairs(rng, n, maxlen=200, edits=8):
    pairs = []
    for _ in range(n):
        ln = int(rng.integers(20, maxlen))
        s2 = rng.choice(ALPHA, ln).tobytes()
        s1 = bytearray(s2)
        for _ in range(int(rng.integers(0, edits))):
            i = int(rng.integers(0, max(1, len(s1))))
            op = int(rng.integers(0, 3))
            if op == 0 and len(s1):
                s1[i] = int(rng.choice(ALPHA))
            elif op == 1 and len(s1) > 3:
                del s1[i]
            else:
                s1.insert(i, int(rng.choice(ALPHA)))
        pairs.append((bytes(s1), s2))
    return pairs


def test_device_walk_bit_equal_to_host_fuzz():
    """Fuzzed pairs x two penalty schemes (the reference's defaults and
    an odd all-different scheme): every converged pair's device walk
    must return exactly the host walker's alignment strings."""
    rng = np.random.default_rng(4)
    for pen in (
        WfaPenalties(),
        WfaPenalties(mismatch=5, gap_open=3, gap_extend=1),
    ):
        pairs = _mk_pairs(rng, 24)
        batch = pack_batch(pairs, batch_size=24)
        res = wfa_textbook_batch(
            batch.query, batch.db, batch.query_len, batch.db_len,
            penalties=pen, band=48,
        )
        conv = np.asarray(res.converged)
        alns = wfa_traceback_device(
            res, [p[0] for p in pairs], [p[1] for p in pairs], pen
        )
        n_ok = 0
        for j, (s1, s2) in enumerate(pairs):
            if not conv[j]:
                assert alns[j] is None
                continue
            _score, h1, h2 = wfa_traceback_host(res, j, s1, s2, pen)
            assert alns[j] == (h1, h2), (j, alns[j], (h1, h2))
            n_ok += 1
        assert n_ok >= 20  # the fuzz must actually exercise the walk


def test_device_walk_identical_and_gap_only_pairs():
    pen = WfaPenalties()
    pairs = [
        (b"ACGTACGT", b"ACGTACGT"),          # all-match
        (b"ACGTACGTAAAA", b"ACGTACGT"),      # trailing insertion run
        (b"ACGTACGT", b"TTACGTACGT"),        # leading deletion run
        (b"AAAA", b"TTTT"),                  # all-mismatch
    ]
    batch = pack_batch(pairs, batch_size=8)
    res = wfa_textbook_batch(
        batch.query, batch.db, batch.query_len, batch.db_len,
        penalties=pen, band=32,
    )
    conv = np.asarray(res.converged)
    alns = wfa_traceback_device(
        res, [p[0] for p in pairs], [p[1] for p in pairs], pen
    )
    for j, (s1, s2) in enumerate(pairs):
        assert conv[j]
        _s, h1, h2 = wfa_traceback_host(res, j, s1, s2, pen)
        assert alns[j] == (h1, h2), j


def test_device_walk_spans_returns_none():
    """Ends-free results keep the host walker (seed-window logic); the
    device entry point must decline cleanly."""
    pairs = [(b"ACGTACGT", b"GTACG")]
    batch = pack_batch(pairs, batch_size=8)
    res = wfa_textbook_batch(
        batch.query, batch.db, batch.query_len, batch.db_len,
        band=32, spans=(4, 4, 4, 4),
    )
    alns = wfa_traceback_device(
        res, [pairs[0][0]], [pairs[0][1]]
    )
    assert alns == [None]


def test_wavefront_route_uses_device_walk(monkeypatch):
    """Model layer: with traceback='device' the wavefront engine's
    alignments ride the device walk and match the host-walk run
    byte-for-byte."""
    rng = np.random.default_rng(9)
    pairs = _mk_pairs(rng, 10, maxlen=120)
    outs = {}
    for tb in ("device", "host"):
        cfg = AlignConfig(
            algo=Algo.WFA, compat=False, wfa_engine="wavefront",
            band=32, traceback=tb,
        )
        outs[tb] = WfaAligner(cfg)._align_batch_impl(pairs)
    for a, b in zip(outs["device"], outs["host"]):
        assert isinstance(a, dict) and isinstance(b, dict), (a, b)
        assert a == b
