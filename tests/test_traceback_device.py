"""On-device fast4 walker vs the host walker: bit-identical alignments."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sequencealigning_tpu.io.encode import pack_batch
from sequencealigning_tpu.ops.nw_affine_stream import nw_affine_stream_batch
from sequencealigning_tpu.ops.traceback import (
    _apply_ops,
    fast4_traceback_pair,
)
from sequencealigning_tpu.ops.traceback_device import (
    decode_packed_ops,
    fast4_stream_walk_device,
    seed_planes,
)


def _random_pairs(seed, n_pairs=24, lo=2, hi=40, alphabet=b"ACGT"):
    rng = random.Random(seed)
    out = []
    for _ in range(n_pairs):
        n1 = rng.randint(lo, hi)
        n2 = rng.randint(lo, hi)
        s1 = bytes(rng.choice(alphabet) for _ in range(n1))
        if rng.random() < 0.3:
            # High-identity mutant of s1 (the production distribution).
            s2 = bytearray(s1)
            for _ in range(max(1, n1 // 10)):
                s2[rng.randrange(n1)] = rng.choice(alphabet)
            s2 = bytes(s2[:n2]) if n2 < n1 else bytes(s2)
            s2 = s2 or b"A"
        else:
            s2 = bytes(rng.choice(alphabet) for _ in range(n2))
        out.append((s1, s2))
    return out


def _fill(pairs, compat, np_slots=3):
    batch = pack_batch(pairs, batch_size=len(pairs))
    res = nw_affine_stream_batch(
        batch.query, batch.db, batch.query_len, batch.db_len,
        compat=compat, with_dirs="fast4", backend="lax",
        np_slots=np_slots,
    )
    return res, batch


@pytest.mark.parametrize("compat", [True, False])
@pytest.mark.parametrize("seed", [7, 23])
def test_device_walk_matches_host_walker(compat, seed):
    pairs = _random_pairs(seed)
    res, batch = _fill(pairs, compat)
    dirs_host = np.asarray(res.dirs)
    n1s = np.asarray([len(a) for a, _ in pairs])
    n2s = np.asarray([len(b) for _, b in pairs])
    ops, scores = fast4_stream_walk_device(
        res.dirs, res.finals, n1s, n2s, res.plan
    )
    for b, (s1, s2) in enumerate(pairs):
        row, _slot, off = res.plan.pair_coords(b)
        want_score, want_alns = fast4_traceback_pair(
            dirs_host[:, row, :], res.finals[b], s1, s2,
            compat=compat, d_offset=off,
        )
        assert ops[b] is not None, (b, s1, s2)
        got = _apply_ops(ops[b], s1, s2)
        assert int(scores[b]) == want_score
        assert got == want_alns[0], (b, s1, s2, got, want_alns[0])


def test_device_walk_unroll_invariant():
    pairs = _random_pairs(3, n_pairs=9, hi=20)
    res, _ = _fill(pairs, True)
    n1s = np.asarray([len(a) for a, _ in pairs])
    n2s = np.asarray([len(b) for _, b in pairs])
    a, _ = fast4_stream_walk_device(res.dirs, res.finals, n1s, n2s, res.plan,
                                    unroll=1)
    b, _ = fast4_stream_walk_device(res.dirs, res.finals, n1s, n2s, res.plan,
                                    unroll=16)
    assert a == b


def test_decode_rejects_inconsistent_ops():
    # A walk that claims 2 M ops for a 1x1 pair must decode to None.
    packed = np.zeros((1, 1), np.uint32)
    packed[0, 0] = 0b0101  # two M steps
    assert decode_packed_ops(packed, np.array([1]), np.array([1])) == [None]


def test_seed_planes_priority():
    finals = np.array(
        [[5, 5, 5], [1, 5, 5], [1, 2, 5], [9, 1, 1]], np.int32
    )
    np.testing.assert_array_equal(seed_planes(finals), [0, 1, 2, 0])


def test_gotoh_model_device_route_matches_host():
    from sequencealigning_tpu.config import AlignConfig, Mode
    from sequencealigning_tpu.io.fasta import Record
    from sequencealigning_tpu.models.gotoh import GotohAligner

    pairs = _random_pairs(41, n_pairs=10, hi=24)
    recs = [
        (Record(seq=a, name=b">q"), Record(seq=b, name=b">d"))
        for a, b in pairs
    ]
    outs = {}
    for route in ("device", "host"):
        a = GotohAligner(
            AlignConfig(mode=Mode.GLOBAL, first_only=True, traceback=route)
        )
        outs[route] = a.align_batch(recs)
    for rd, rh in zip(outs["device"], outs["host"]):
        assert rd.score == rh.score
        assert rd.aligned_query == rh.aligned_query
        assert rd.aligned_db == rh.aligned_db


@pytest.mark.parametrize("compat", [True, False])
def test_vectorized_decode_matches_apply_ops(compat):
    from sequencealigning_tpu.ops.traceback_device import (
        fast4_stream_align_device,
    )

    pairs = _random_pairs(77, n_pairs=20, hi=33)
    res, _ = _fill(pairs, compat)
    s1s = [a for a, _ in pairs]
    s2s = [b for _, b in pairs]
    n1s = np.asarray([len(a) for a in s1s])
    n2s = np.asarray([len(b) for b in s2s])
    ops, scores = fast4_stream_walk_device(
        res.dirs, res.finals, n1s, n2s, res.plan
    )
    alns, scores2 = fast4_stream_align_device(
        res.dirs, res.finals, s1s, s2s, res.plan
    )
    np.testing.assert_array_equal(scores, scores2)
    for b in range(len(pairs)):
        assert ops[b] is not None and alns[b] is not None
        assert alns[b] == _apply_ops(ops[b], s1s[b], s2s[b]), b


@pytest.mark.parametrize("compat", [True, False])
def test_banded_diag_device_walk_matches_host(compat):
    from sequencealigning_tpu.ops.nw_banded_diag import nw_banded_diag_batch
    from sequencealigning_tpu.ops.traceback import (
        banded_diag_fast4_traceback_pair,
    )
    from sequencealigning_tpu.ops.traceback_device import (
        banded_diag_align_device,
    )

    rng = random.Random(55)
    pairs = []
    for _ in range(8):
        n1 = rng.randint(4, 50)
        n2 = rng.randint(max(4, n1 - 5), n1 + 5)
        pairs.append(
            (
                bytes(rng.choice(b"ACGT") for _ in range(n1)),
                bytes(rng.choice(b"ACGT") for _ in range(n2)),
            )
        )
    b = pack_batch(pairs, batch_size=8)
    res = nw_banded_diag_batch(
        b.query, b.db, b.query_len, b.db_len, band=16,
        compat=compat, with_dirs="fast4",
    )
    dirs = np.asarray(res.dirs)
    finals = np.asarray(res.finals)
    alns, scores = banded_diag_align_device(
        res.dirs, finals, [p[0] for p in pairs], [p[1] for p in pairs],
        res.k_lo_even,
    )
    for j, (s1, s2) in enumerate(pairs):
        want_score, want = banded_diag_fast4_traceback_pair(
            dirs[:, j, :], finals[j], s1, s2, res.k_lo_even, compat=compat
        )
        assert alns[j] is not None, j
        assert int(scores[j]) == want_score
        assert alns[j] == want[0], (j, s1, s2)


def test_native_decode_matches_numpy(monkeypatch):
    import os

    from sequencealigning_tpu import native
    from sequencealigning_tpu.ops.traceback_device import (
        decode_packed_alignments,
    )

    if not native.available():
        pytest.skip("native runtime unavailable")
    pairs = _random_pairs(91, n_pairs=16, hi=37)
    res, _ = _fill(pairs, True)
    n1s = np.asarray([len(a) for a, _ in pairs])
    n2s = np.asarray([len(b) for _, b in pairs])
    import jax.numpy as jnp
    import jax

    from sequencealigning_tpu.ops.traceback_device import (
        _walk_fast4, seed_planes,
    )

    bs = np.arange(len(pairs))
    (xf, yf), packed, _n_used = _walk_fast4(
        res.dirs, jnp.asarray(n2s.astype(np.int32)),
        jnp.asarray(n1s.astype(np.int32)),
        jnp.asarray(seed_planes(res.finals[: len(pairs)])),
        jnp.asarray((bs // res.plan.np_slots).astype(np.int32)),
        jnp.asarray(((bs % res.plan.np_slots) * res.plan.s).astype(np.int32)),
        t_steps=int(res.plan.l1 + res.plan.l2),
    )
    packed = np.asarray(packed)
    s1s = [a for a, _ in pairs]
    s2s = [b for _, b in pairs]
    got_native = decode_packed_alignments(packed, s1s, s2s)
    monkeypatch.setenv("SEQALIGN_NO_NATIVE", "1")
    got_numpy = decode_packed_alignments(packed, s1s, s2s)
    assert got_native == got_numpy
    # Corrupt one pair's stream (codes after the stop): both reject it.
    bad = packed.copy()
    bad[3, -1] |= np.uint32(1) << 30
    assert decode_packed_alignments(bad, s1s, s2s)[3] is None
    monkeypatch.delenv("SEQALIGN_NO_NATIVE")
    assert decode_packed_alignments(bad, s1s, s2s)[3] is None


def test_banded_model_device_route_matches_host():
    from sequencealigning_tpu.config import AlignConfig, Mode
    from sequencealigning_tpu.io.fasta import Record
    from sequencealigning_tpu.models.banded import BandedAligner

    pairs = _random_pairs(61, n_pairs=8, lo=4, hi=30)
    recs = [
        (Record(seq=a, name=b">q"), Record(seq=b, name=b">d"))
        for a, b in pairs
    ]
    outs = {}
    for route in ("device", "host"):
        a = BandedAligner(
            AlignConfig(
                mode=Mode.GLOBAL, first_only=True, traceback=route, band=16
            )
        )
        outs[route] = a.align_batch(recs)
    for rd, rh in zip(outs["device"], outs["host"]):
        assert rd.score == rh.score
        assert rd.aligned_query == rh.aligned_query
        assert rd.aligned_db == rh.aligned_db


def test_wfa_banded_route_device_matches_host():
    from sequencealigning_tpu.config import AlignConfig, Mode
    from sequencealigning_tpu.io.fasta import Record
    from sequencealigning_tpu.models.wfa import WfaAligner

    rng = random.Random(13)
    pairs = []
    for _ in range(6):
        n = rng.randint(30, 60)
        s1 = bytes(rng.choice(b"ACGT") for _ in range(n))
        s2 = bytearray(s1)
        for _ in range(max(2, n // 5)):  # divergent enough to need bands
            s2[rng.randrange(n)] = rng.choice(b"ACGT")
        pairs.append((s1, bytes(s2)))
    recs = [
        (Record(seq=a, name=b">q"), Record(seq=b, name=b">d"))
        for a, b in pairs
    ]
    outs = {}
    for route in ("device", "host"):
        a = WfaAligner(
            AlignConfig(
                mode=Mode.GLOBAL, compat=False, wfa_engine="banded",
                traceback=route,
            )
        )
        outs[route] = a.align_batch(recs)
    for rd, rh in zip(outs["device"], outs["host"]):
        assert rd.score == rh.score
        assert rd.aligned_query == rh.aligned_query
        assert rd.aligned_db == rh.aligned_db


def test_banded_diag_device_pair_idx_subset():
    from sequencealigning_tpu.ops.nw_banded_diag import nw_banded_diag_batch
    from sequencealigning_tpu.ops.traceback import (
        banded_diag_fast4_traceback_pair,
    )
    from sequencealigning_tpu.ops.traceback_device import (
        banded_diag_device_tbs,
    )

    rng = random.Random(99)
    pairs = []
    for _ in range(8):
        n1 = rng.randint(6, 40)
        n2 = rng.randint(max(6, n1 - 4), n1 + 4)
        pairs.append(
            (
                bytes(rng.choice(b"ACGT") for _ in range(n1)),
                bytes(rng.choice(b"ACGT") for _ in range(n2)),
            )
        )
    b = pack_batch(pairs, batch_size=8)
    res = nw_banded_diag_batch(
        b.query, b.db, b.query_len, b.db_len, band=16,
        compat=False, with_dirs="fast4",
    )
    dirs = np.asarray(res.dirs)
    finals = np.asarray(res.finals)
    subset = [5, 1, 6]
    tbs = banded_diag_device_tbs(
        res.dirs, finals,
        [pairs[i][0] for i in subset], [pairs[i][1] for i in subset],
        res.k_lo_even, compat=False,
        pair_idx=np.asarray(subset, np.int32),
    )
    for (i, r) in zip(subset, tbs):
        want = banded_diag_fast4_traceback_pair(
            dirs[:, i, :], finals[i], pairs[i][0], pairs[i][1],
            res.k_lo_even, compat=False,
        )
        assert r[0] == want[0] and r[1][0] == want[1][0], i


@pytest.mark.parametrize("mode_name", ["semi", "local"])
@pytest.mark.parametrize("n_pairs", [10, 36])  # plain kernel / streamed
def test_modes_device_route_matches_host(mode_name, n_pairs):
    from sequencealigning_tpu.config import AlignConfig, Mode
    from sequencealigning_tpu.io.fasta import Record
    from sequencealigning_tpu.models.gotoh import GotohAligner

    mode = Mode.SEMI_GLOBAL if mode_name == "semi" else Mode.LOCAL
    pairs = _random_pairs(17 + n_pairs, n_pairs=n_pairs, lo=3, hi=28)
    recs = [
        (Record(seq=a, name=b">q"), Record(seq=b, name=b">d"))
        for a, b in pairs
    ]
    outs = {}
    for route in ("device", "host"):
        a = GotohAligner(
            AlignConfig(mode=mode, compat=False, traceback=route)
        )
        outs[route] = a.align_batch(recs)
    for b, (rd, rh) in enumerate(zip(outs["device"], outs["host"])):
        assert rd.score == rh.score, (b, pairs[b])
        assert rd.aligned_query == rh.aligned_query, (b, pairs[b])
        assert rd.aligned_db == rh.aligned_db, (b, pairs[b])


def test_decode_empty_walk_valid_only_when_nothing_to_consume(monkeypatch):
    # A zero-op stream is a VALID walk iff both substrings are empty
    # (semi-global end cell on the grid boundary) -- both decoders.
    from sequencealigning_tpu.ops.traceback_device import (
        decode_packed_alignments,
    )

    packed = np.zeros((2, 1), np.uint32)
    for native_off in (False, True):
        if native_off:
            monkeypatch.setenv("SEQALIGN_NO_NATIVE", "1")
        got = decode_packed_alignments(packed, [b"", b"A"], [b"", b"T"])
        assert got[0] == ("", ""), native_off
        assert got[1] is None, native_off


@pytest.mark.parametrize("mode_name", ["semi", "local"])
def test_modes_device_route_extreme_pairs(mode_name):
    """Tiny / all-mismatch / boundary-end-cell pairs: device == host."""
    from sequencealigning_tpu.config import AlignConfig, Mode
    from sequencealigning_tpu.io.fasta import Record
    from sequencealigning_tpu.models.gotoh import GotohAligner

    mode = Mode.SEMI_GLOBAL if mode_name == "semi" else Mode.LOCAL
    pairs = [
        (b"A", b"T"),
        (b"A", b"A"),
        (b"AC", b"GT"),
        (b"ACGT", b"TTTT"),
        (b"T", b"ACGTACGT"),
        (b"ACGTACGT", b"G"),
        (b"AAAA", b"TTTTTTTT"),
        (b"ACACAC", b"ACACAC"),
    ]
    recs = [
        (Record(seq=a, name=b">q"), Record(seq=b, name=b">d"))
        for a, b in pairs
    ]
    outs = {}
    for route in ("device", "host"):
        a = GotohAligner(
            AlignConfig(mode=mode, compat=False, traceback=route)
        )
        outs[route] = a.align_batch(recs)
    for b, (rd, rh) in enumerate(zip(outs["device"], outs["host"])):
        assert rd.score == rh.score, (b, pairs[b])
        assert rd.aligned_query == rh.aligned_query, (b, pairs[b])
        assert rd.aligned_db == rh.aligned_db, (b, pairs[b])


def test_rle_ops_roundtrip():
    """Device RLE of the packed 2-bit op stream reconstructs the exact
    packed words, including the all-pad tail and single-step runs."""
    import numpy as np

    from sequencealigning_tpu.ops import traceback_device as tbd

    rng = np.random.default_rng(5)
    B, W = 16, 32  # T = 512 steps
    T = W * 16
    ops = np.zeros((B, T), np.uint8)
    for b in range(B):
        # realistic walks: long runs of one op with scattered edits
        t = 0
        while t < T:
            run = int(rng.integers(1, 60))
            ops[b, t : t + run] = rng.integers(0, 4)
            t += run
        end = int(rng.integers(T // 2, T))
        ops[b, end:] = 0  # pad tail
    shifts = (np.arange(16, dtype=np.uint32) * 2)[None, None, :]
    packed = (ops.reshape(B, W, 16).astype(np.uint32) << shifts).sum(
        axis=2, dtype=np.uint32
    )
    vals, lens, n_runs = jax.device_get(
        tbd.rle_pack_ops(jnp.asarray(packed))
    )
    ok = n_runs <= tbd.RLE_CAP
    assert ok.all()  # 60-step runs over 512 steps never exceed the cap
    out = tbd.rle_expand_packed(vals, lens, W)
    np.testing.assert_array_equal(out, packed)


def test_rle_overflow_detected():
    """Alternating ops (one run per step) overflow RLE_CAP and report it
    via n_runs so the caller refetches the full row."""
    import numpy as np

    from sequencealigning_tpu.ops import traceback_device as tbd

    B, W = 2, 64  # T = 1024 > RLE_CAP runs when alternating
    T = W * 16
    ops = np.tile(np.array([1, 2], np.uint8), T // 2)[None].repeat(B, 0)
    shifts = (np.arange(16, dtype=np.uint32) * 2)[None, None, :]
    packed = (ops.reshape(B, W, 16).astype(np.uint32) << shifts).sum(
        axis=2, dtype=np.uint32
    )
    _vals, _lens, n_runs = jax.device_get(
        tbd.rle_pack_ops(jnp.asarray(packed))
    )
    assert (n_runs == T).all()
    assert (n_runs > tbd.RLE_CAP).all()


def test_device_walk_rle_drain_matches_full_fetch(monkeypatch):
    """The RLE drain path (forced by a tiny size threshold) returns the
    same alignments as the full packed fetch across the mesh."""
    import numpy as np

    from sequencealigning_tpu.io.encode import pack_batch
    from sequencealigning_tpu.parallel.mesh import make_mesh
    from sequencealigning_tpu.parallel.runner import DataParallelRunner

    monkeypatch.setenv("SEQALIGN_RLE", "1")  # RLE drain is opt-in (r5)
    rng = np.random.default_rng(9)
    pairs = []
    for _ in range(16):
        n = int(rng.integers(24, 64))
        ref = rng.choice(list(b"ACGT"), n).astype(np.uint8).tobytes()
        mut = bytearray(ref)
        mut[n // 2] = b"A"[0] if ref[n // 2] != b"A"[0] else b"C"[0]
        pairs.append((bytes(mut), ref))
    runner = DataParallelRunner(
        mesh=make_mesh(), backend="lax", np_slots=2
    )
    batch = pack_batch(pairs, batch_size=16)
    seqs1 = [p[0] for p in pairs]
    seqs2 = [p[1] for p in pairs]
    finals, dirs, plan = runner.fill_with_dirs(batch)
    want = runner.device_walk_fast4(
        dirs, plan, finals, seqs1, seqs2
    )
    # Force the 'big batch' drain (RLE route) by shrinking the threshold.
    import sequencealigning_tpu.parallel.runner as runner_mod

    src_finish = runner_mod.DataParallelRunner.device_walk_fast4_finish

    fin_full = np.zeros((plan.np_slots * plan.n_rows, 3), np.int32)
    fin_full[:16] = np.asarray(finals)[:16]
    handles = runner.device_walk_fast4_dispatch(
        dirs, plan, fin_full,
        [len(s) for s in seqs1], [len(s) for s in seqs2],
    )
    assert handles[6] is not None  # rle computed on device
    import sequencealigning_tpu.ops.traceback_device as tbd_mod

    real_get = jax.device_get

    # monkeypatch the size gate: pretend every batch is big
    orig = runner_mod.DataParallelRunner.device_walk_fast4_finish

    def patched(self, handles, finals_, s1, s2):
        xf, yf, packed, dirs_, plan_, n_used, rle = handles
        assert rle is not None
        B = len(s1)
        vals_d, lens_d, n_runs_d = rle
        xf, yf, n_runs = jax.device_get((xf[:B], yf[:B], n_runs_d[:B]))
        rmax = min(max(int(n_runs.max(initial=1)), 1), tbd_mod.RLE_CAP)
        vals, lens = jax.device_get((vals_d[:B, :rmax], lens_d[:B, :rmax]))
        packed_h = tbd_mod.rle_expand_packed(vals, lens, packed.shape[1])
        over = np.flatnonzero(n_runs > tbd_mod.RLE_CAP)
        for i in over:
            packed_h[i] = np.asarray(packed[i])
        alns = tbd_mod.decode_packed_alignments(packed_h, s1, s2)
        full = jax.device_get(packed[:B])
        alns_full = tbd_mod.decode_packed_alignments(full, s1, s2)
        assert alns == alns_full
        return orig(self, handles, finals_, s1, s2)

    got = patched(runner, handles, np.asarray(finals), seqs1, seqs2)
    assert got == want
