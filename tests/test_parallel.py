"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import random

import jax
import numpy as np

from sequencealigning_tpu.io.encode import pack_batch
from sequencealigning_tpu.ops import oracle_gotoh
from sequencealigning_tpu.parallel.mesh import make_mesh
from sequencealigning_tpu.parallel.runner import DataParallelRunner
from sequencealigning_tpu.parallel.streaming import stream_align


def _pairs(seed, n):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        n1 = rng.randint(3, 24)
        n2 = rng.randint(3, 24)
        out.append(
            (
                bytes(rng.choice(b"ACGT") for _ in range(n1)),
                bytes(rng.choice(b"ACGT") for _ in range(n2)),
            )
        )
    return out


def test_mesh_all_devices():
    mesh = make_mesh()
    assert int(np.prod(mesh.devices.shape)) == 8
    assert mesh.axis_names == ("data",)


def test_runner_scores_match_oracle_across_8_devices():
    pairs = _pairs(61, 16)  # 2 pairs per device
    batch = pack_batch(pairs, batch_size=16)
    runner = DataParallelRunner(backend="lax")
    finals = np.asarray(runner.scores(batch))
    assert finals.shape == (16, 3)
    for b, (s1, s2) in enumerate(pairs):
        assert int(finals[b].max()) == oracle_gotoh.gotoh_score(s1, s2), (b, s1, s2)


def test_runner_pads_odd_batches():
    pairs = _pairs(67, 5)  # not a multiple of 8*n_devices
    batch = pack_batch(pairs, batch_size=5)
    runner = DataParallelRunner(backend="lax")
    finals = np.asarray(runner.scores(batch))
    assert finals.shape == (5, 3)
    for b, (s1, s2) in enumerate(pairs):
        assert int(finals[b].max()) == oracle_gotoh.gotoh_score(s1, s2)


def test_runner_sharded_output_mode():
    pairs = _pairs(71, 16)
    batch = pack_batch(pairs, batch_size=16)
    runner = DataParallelRunner(backend="lax", gather=False)
    finals = np.asarray(runner.scores(batch))
    for b, (s1, s2) in enumerate(pairs):
        assert int(finals[b].max()) == oracle_gotoh.gotoh_score(s1, s2)


def test_stream_align_with_checkpoint(tmp_path):
    pairs = _pairs(73, 40)
    runner = DataParallelRunner(backend="lax")
    seen = {}

    def on_result(idx, scores):
        seen[idx] = scores.copy()

    ckpt = str(tmp_path / "cursor.json")
    n = stream_align(
        iter(pairs), runner, batch_size=16, checkpoint_path=ckpt,
        on_result=on_result,
    )
    assert n == 40
    assert sorted(seen) == [0, 1, 2]
    # Resume: nothing left to do.
    n2 = stream_align(iter(pairs), runner, batch_size=16, checkpoint_path=ckpt)
    assert n2 == 0
    # Scores correct across the stream.
    flat = np.concatenate([seen[i] for i in sorted(seen)], axis=0)
    for b, (s1, s2) in enumerate(pairs):
        assert int(flat[b].max()) == oracle_gotoh.gotoh_score(s1, s2)
    # A checkpoint records its alignment semantics; resuming under
    # different ones must refuse instead of mixing output streams
    # (ADVICE r4).
    import pytest

    with pytest.raises(ValueError, match="mode"):
        stream_align(
            iter(pairs), runner, batch_size=16, checkpoint_path=ckpt,
            mode="local",
        )
    with pytest.raises(ValueError, match="cigars"):
        stream_align(
            iter(pairs), runner, batch_size=16, checkpoint_path=ckpt,
            cigars=True,
        )


def test_runner_stream_np_slots_pallas_interpret():
    """Streamed kernel under shard_map (pallas interpret), multi-slot."""
    pairs = _pairs(73, 48)
    batch = pack_batch(pairs, batch_size=48)
    runner = DataParallelRunner(backend="pallas", np_slots=3)
    finals = np.asarray(runner.scores(batch))
    assert finals.shape == (48, 3)
    for b, (s1, s2) in enumerate(pairs):
        assert int(finals[b].max()) == oracle_gotoh.gotoh_score(s1, s2)


def test_runner_plain_kernel_still_available():
    pairs = _pairs(79, 16)
    batch = pack_batch(pairs, batch_size=16)
    r_plain = DataParallelRunner(backend="lax", kernel="plain")
    r_stream = DataParallelRunner(backend="lax", kernel="stream")
    np.testing.assert_array_equal(
        np.asarray(r_plain.scores(batch)), np.asarray(r_stream.scores(batch))
    )


def test_stream_align_with_cigars():
    """The cigars path runs through the runner's explicit 8-device mesh
    (per-shard fills + row-sharded dirs -- round 1 silently filled on the
    default device)."""
    from sequencealigning_tpu.ops import oracle_gotoh
    from sequencealigning_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    assert int(np.prod(mesh.devices.shape)) == 8
    pairs = _pairs(83, 20)
    runner = DataParallelRunner(mesh=mesh, backend="lax", np_slots=2)
    got = {}

    def on_alignments(idx, tbs):
        got[idx] = tbs

    n = stream_align(
        pairs, runner=runner, batch_size=8, cigars=True,
        on_alignments=on_alignments,
    )
    assert n == 20
    flat = [t for idx in sorted(got) for t in got[idx]]
    assert len(flat) >= 20
    for b, r in enumerate(flat[:20]):
        assert not isinstance(r, Exception), (b, r)
        score, alns = r
        assert score == oracle_gotoh.gotoh_score(*pairs[b])
        a1, a2 = alns[0]
        assert a1.replace("-", "").encode() == pairs[b][0]
        assert a2.replace("-", "").encode() == pairs[b][1]


def test_runner_fill_modes_across_8_devices():
    """Semi-global/local streamed fills on the mesh equal the plain
    single-device modes engine, and the sharded dirs walk to the same
    alignments."""
    import pytest

    from sequencealigning_tpu.ops.nw_affine_modes import (
        modes_end_cell,
        nw_affine_modes_batch,
    )
    from sequencealigning_tpu.ops.traceback import (
        local_affine_traceback_pair,
        semi_global_traceback_pair,
    )

    pairs = _pairs(83, 16)
    batch = pack_batch(pairs, batch_size=16)
    runner = DataParallelRunner(backend="lax")
    for mode in ("semi", "local"):
        best, bx, by, dirs, plan = runner.fill_modes(batch, mode)
        best = np.asarray(best)
        bx = np.asarray(bx)
        by = np.asarray(by)
        dirs = np.asarray(dirs)
        plain = nw_affine_modes_batch(
            batch.query, batch.db, batch.query_len, batch.db_len,
            local=(mode == "local"),
        )
        for b, (s1, s2) in enumerate(pairs):
            score, x, y = int(best[b]), int(bx[b]), int(by[b])
            p_score, p_x, p_y = modes_end_cell(plain, b)
            assert (score, x, y) == (p_score, p_x, p_y), (mode, b, s1, s2)
            row, _slot, d_off = plan.pair_coords(b)
            if mode == "semi":
                a1, a2 = semi_global_traceback_pair(
                    dirs[:, row, :], x, y, s1, s2, d_offset=d_off
                )
            else:
                a1, a2, _, _ = local_affine_traceback_pair(
                    dirs[:, row, :], x, y, s1, s2, d_offset=d_off
                )
            assert a1.replace("-", "") in s1.decode()
            assert a2.replace("-", "") in s2.decode()


def test_runner_int16_state_matches_int32():
    """state_dtype='auto' resolves to int16 off-TPU (interpret supports
    i16) and the sharded scores are identical to the int32 runner's."""
    pairs = _pairs(73, 16)
    batch = pack_batch(pairs, batch_size=16)
    f32 = np.asarray(DataParallelRunner(backend="lax").scores(batch))
    f16 = np.asarray(
        DataParallelRunner(
            backend="lax", kernel="stream", state_dtype="auto"
        ).scores(batch)
    )
    np.testing.assert_array_equal(f32, f16)


def test_device_walk_matches_host_walk_on_mesh():
    """The sharded on-device fast4 walk (runner.device_walk_fast4) equals
    the host traceback across an explicit 8-device mesh."""
    from sequencealigning_tpu.io.encode import pack_batch
    from sequencealigning_tpu.ops.traceback import traceback_stream_batch
    from sequencealigning_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    pairs = _pairs(29, 24)
    runner = DataParallelRunner(mesh=mesh, backend="lax", np_slots=2)
    batch = pack_batch(pairs, batch_size=len(pairs))
    finals, dirs, plan = runner.fill_with_dirs(batch)
    finals = np.asarray(finals)
    s1s = [p[0] for p in pairs]
    s2s = [p[1] for p in pairs]
    got = runner.device_walk_fast4(dirs, plan, finals, s1s, s2s)
    want = traceback_stream_batch(
        np.asarray(dirs), finals, s1s, s2s, plan,
        compat=runner.compat, dirs_mode="fast4",
    )
    assert len(got) == len(want) == len(pairs)
    for b, (g, w) in enumerate(zip(got, want)):
        assert not isinstance(g, Exception), (b, g)
        assert g[0] == w[0], b
        assert g[1][0] == w[1][0], (b, pairs[b])


def test_streaming_cigars_device_walk_route():
    """stream_align(cigars=True) with runner.traceback='device' produces
    the same alignments as the host route."""
    from sequencealigning_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    pairs = _pairs(53, 16)
    outs = {}
    for route in ("device", "host"):
        runner = DataParallelRunner(
            mesh=mesh, backend="lax", np_slots=2, traceback=route
        )
        got = {}
        stream_align(
            pairs, runner=runner, batch_size=8, cigars=True,
            on_alignments=lambda idx, tbs: got.__setitem__(idx, tbs),
        )
        outs[route] = [t for idx in sorted(got) for t in got[idx]]
    for b, (d, h) in enumerate(zip(outs["device"], outs["host"])):
        assert not isinstance(d, Exception), (b, d)
        assert d[0] == h[0] and d[1][0] == h[1][0], b


def test_stream_align_prepacked_batches():
    """stream_align accepts pre-packed PairBatch objects (pack_arrays
    fast path) and produces the same scores as the byte-pair path."""
    import numpy as np

    from sequencealigning_tpu.io.encode import pack_arrays

    pairs = _pairs(71, 24)
    lens1 = np.array([len(a) for a, _ in pairs], np.int32)
    lens2 = np.array([len(b) for _, b in pairs], np.int32)
    l1 = int(lens1.max())
    l2 = int(lens2.max())
    q = np.zeros((24, l1), np.uint8)
    d = np.zeros((24, l2), np.uint8)
    q[:] = ord("A")
    d[:] = ord("A")
    for i, (a, b) in enumerate(pairs):
        q[i, : len(a)] = np.frombuffer(a, np.uint8)
        d[i, : len(b)] = np.frombuffer(b, np.uint8)

    def batches():
        for lo in range(0, 24, 8):
            yield pack_arrays(
                q[lo : lo + 8], d[lo : lo + 8],
                lens1[lo : lo + 8], lens2[lo : lo + 8], batch_size=8,
            )

    runner = DataParallelRunner(backend="lax", np_slots=1)
    got = {}
    n = stream_align(
        batches(), runner=runner, batch_size=8,
        on_result=lambda i, s: got.__setitem__(i, s),
    )
    assert n == 24
    scores = np.concatenate([got[i] for i in sorted(got)])
    want = {}
    stream_align(
        pairs, runner=runner, batch_size=8,
        on_result=lambda i, s: want.__setitem__(i, s),
    )
    np.testing.assert_array_equal(
        scores, np.concatenate([want[i] for i in sorted(want)])
    )


def test_runner_device_walk_modes_matches_host():
    """The sharded modes walk equals the host modes walkers across the
    8-device mesh (both textbook modes)."""
    from sequencealigning_tpu.io.encode import pack_batch
    from sequencealigning_tpu.ops.traceback import (
        local_affine_traceback_pair,
        semi_global_traceback_pair,
    )
    from sequencealigning_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    pairs = _pairs(37, 16)
    runner = DataParallelRunner(mesh=mesh, backend="lax", np_slots=2)
    batch = pack_batch(pairs, batch_size=len(pairs))
    for mode in ("semi", "local"):
        best, bx, by, dirs, plan = runner.fill_modes(batch, mode)
        bx = np.asarray(bx)
        by = np.asarray(by)
        walked = runner.device_walk_modes(
            dirs, plan, bx, by,
            [p[0] for p in pairs], [p[1] for p in pairs], mode,
        )
        dirs_host = np.asarray(dirs)
        for b, (s1, s2) in enumerate(pairs):
            assert walked[b] is not None, (mode, b)
            mid1, mid2, sx, sy = walked[b]
            row, _slot, d_off = plan.pair_coords(b)
            if mode == "local":
                a1, a2, wsy, wsx = local_affine_traceback_pair(
                    dirs_host[:, row, :], int(bx[b]), int(by[b]), s1, s2,
                    d_offset=d_off,
                )
                assert (mid1, mid2, sx, sy) == (a1, a2, wsx, wsy), (mode, b)
            else:
                want = semi_global_traceback_pair(
                    dirs_host[:, row, :], int(bx[b]), int(by[b]), s1, s2,
                    d_offset=d_off,
                )
                # Assemble the free end gaps around the walked segment.
                n1, n2 = len(s1), len(s2)
                x, y = int(bx[b]), int(by[b])
                a1 = (
                    s1[:sy].decode() + "-" * sx + mid1
                    + s1[y:].decode() + "-" * (n2 - x)
                )
                a2 = (
                    "-" * sy + s2[:sx].decode() + mid2
                    + "-" * (n1 - y) + s2[x:].decode()
                )
                assert (a1, a2) == want, (mode, b)


def test_stream_align_wirebatch_matches_bytes():
    """WireBatch input (fused ASCII -> 2-bit wire pack) produces the same
    scores as the byte-pair path, including N wildcards (the has_n wire
    variant) and ragged lengths."""
    import numpy as np

    from sequencealigning_tpu.io.encode import pack_wire

    rng = random.Random(5)
    pairs = []
    for _ in range(24):
        n1 = rng.randint(3, 24)
        n2 = rng.randint(3, 24)
        pairs.append(
            (
                bytes(rng.choice(b"ACGTN") for _ in range(n1)),
                bytes(rng.choice(b"ACGTN") for _ in range(n2)),
            )
        )
    lens1 = np.array([len(a) for a, _ in pairs], np.int32)
    lens2 = np.array([len(b) for _, b in pairs], np.int32)
    q = np.full((24, int(lens1.max())), ord("A"), np.uint8)
    d = np.full((24, int(lens2.max())), ord("A"), np.uint8)
    for i, (a, b) in enumerate(pairs):
        q[i, : len(a)] = np.frombuffer(a, np.uint8)
        d[i, : len(b)] = np.frombuffer(b, np.uint8)

    def batches():
        for lo in range(0, 24, 8):
            yield pack_wire(
                q[lo : lo + 8], d[lo : lo + 8],
                lens1[lo : lo + 8], lens2[lo : lo + 8], batch_size=8,
            )

    runner = DataParallelRunner(backend="lax", np_slots=1, wildcard=True)
    got = {}
    n = stream_align(
        batches(), runner=runner, batch_size=8,
        on_result=lambda i, s: got.__setitem__(i, s),
    )
    assert n == 24
    scores = np.concatenate([got[i] for i in sorted(got)])
    want = {}
    stream_align(
        pairs, runner=runner, batch_size=8,
        on_result=lambda i, s: want.__setitem__(i, s),
    )
    np.testing.assert_array_equal(
        scores, np.concatenate([want[i] for i in sorted(want)])
    )


def test_pack_wire_rejects_invalid_unless_unvalidated():
    import numpy as np
    import pytest

    from sequencealigning_tpu.io.encode import pack_wire

    q = np.frombuffer(b"ACGTXXXX", np.uint8).reshape(1, 8).copy()
    d = np.frombuffer(b"ACGTACGT", np.uint8).reshape(1, 8).copy()
    # X beyond the true length is padding garbage: allowed.
    pack_wire(q, d, np.array([4]), np.array([8]))
    with pytest.raises(ValueError, match="invalid query"):
        pack_wire(q, d, np.array([6]), np.array([8]))
    # validate=False skips the scan; the device-side length mask still
    # guarantees the invalid region never scores.
    wb = pack_wire(q, d, np.array([4]), np.array([8]), validate=False)
    assert wb.q2.shape[0] == 1


def test_stream_resume_skips_packing(tmp_path, monkeypatch):
    """Resumed runs must not re-pack already-completed byte batches
    (ADVICE r3): the pack happens after the checkpoint-cursor skip."""
    import json

    import sequencealigning_tpu.parallel.streaming as streaming

    pairs = _pairs(9, 16)
    runner = DataParallelRunner(backend="lax", np_slots=1)
    ckpt = tmp_path / "cursor.json"
    ckpt.write_text(json.dumps({"next_batch": 3}))
    calls = []
    real = streaming.pack_batch

    def counting(bp, **kw):
        calls.append(len(bp))
        return real(bp, **kw)

    monkeypatch.setattr(streaming, "pack_batch", counting)
    got = {}
    stream_align(
        pairs, runner=runner, batch_size=4,
        checkpoint_path=str(ckpt),
        on_result=lambda i, s: got.__setitem__(i, s),
    )
    assert len(calls) == 1  # only batch 3 of 0..3 packed
    assert sorted(got) == [3]


def test_stream_first_batch_index_resume():
    """Production-style resume: the input reader seeks past completed
    batches and declares the stream's starting index; batch numbering,
    checkpoint cursor, and callbacks line up with the full run."""
    import json

    pairs = _pairs(13, 16)
    runner = DataParallelRunner(backend="lax", np_slots=1)
    want = {}
    stream_align(
        pairs, runner=runner, batch_size=4,
        on_result=lambda i, s: want.__setitem__(i, s),
    )
    got = {}
    n = stream_align(
        pairs[8:], runner=runner, batch_size=4,
        first_batch_index=2,
        on_result=lambda i, s: got.__setitem__(i, s),
    )
    assert n == 8
    assert sorted(got) == [2, 3]
    for i in (2, 3):
        np.testing.assert_array_equal(got[i], want[i])


def test_stream_modes_cigars_matches_model_layer():
    """Textbook-mode streaming end-to-end (VERDICT r3 item 9): semi and
    local CIGARs streamed through stream_align(mode=...) with the sharded
    device modes walk -- no whole-dirs host fetch on the happy path --
    match the validated model layer exactly, across the 8-device mesh and
    multiple batches."""
    from sequencealigning_tpu.config import AlignConfig, Algo, Mode
    from sequencealigning_tpu.io.fasta import Record
    from sequencealigning_tpu.models.gotoh import GotohAligner
    from sequencealigning_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    pairs = _pairs(91, 24)
    recs = [
        (Record(seq=a, name=b">q"), Record(seq=b, name=b">d"))
        for a, b in pairs
    ]
    for mode, mmode in (("semi", Mode.SEMI_GLOBAL), ("local", Mode.LOCAL)):
        cfg = AlignConfig(
            algo=Algo.NEEDLEMAN_WUNSCH, mode=mmode, compat=False
        )
        want = GotohAligner(cfg).align_batch(recs)
        runner = DataParallelRunner(
            mesh=mesh, backend="lax", np_slots=2, compat=False,
            traceback="device",
        )
        got_scores = {}
        got_alns = {}
        n = stream_align(
            pairs, runner=runner, batch_size=8, cigars=True, mode=mode,
            on_result=lambda i, s: got_scores.__setitem__(i, np.asarray(s)),
            on_alignments=lambda i, a: got_alns.__setitem__(i, a),
        )
        assert n == len(pairs)
        flat = [r for i in sorted(got_alns) for r in got_alns[i]]
        assert len(flat) == len(pairs)
        for b, w in enumerate(want):
            assert w.error is None, (mode, b, w.error)
            assert not isinstance(flat[b], Exception), (mode, b, flat[b])
            score, alns = flat[b]
            assert score == w.score, (mode, b)
            assert alns[0][0] == w.aligned_query, (mode, b)
            assert alns[0][1] == w.aligned_db, (mode, b)
        scores = np.concatenate([got_scores[i] for i in sorted(got_scores)])
        np.testing.assert_array_equal(
            scores, np.asarray([w.score for w in want], scores.dtype)
        )


def test_stream_modes_scores_only():
    """Scores-only textbook-mode streaming equals the cigars route's
    scores (fill_modes with_dirs=False through the prep pipeline)."""
    from sequencealigning_tpu.config import AlignConfig, Algo, Mode
    from sequencealigning_tpu.io.fasta import Record
    from sequencealigning_tpu.models.gotoh import GotohAligner
    from sequencealigning_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    pairs = _pairs(92, 13)
    cfg = AlignConfig(
        algo=Algo.NEEDLEMAN_WUNSCH, mode=Mode.SEMI_GLOBAL, compat=False
    )
    want = GotohAligner(cfg).align_batch(
        [(Record(seq=a, name=b">q"), Record(seq=b, name=b">d"))
         for a, b in pairs]
    )
    runner = DataParallelRunner(
        mesh=mesh, backend="lax", np_slots=2, compat=False
    )
    got = {}
    n = stream_align(
        pairs, runner=runner, batch_size=8, mode="semi",
        on_result=lambda i, s: got.__setitem__(i, np.asarray(s)),
    )
    assert n == len(pairs)
    scores = np.concatenate([got[i] for i in sorted(got)])
    np.testing.assert_array_equal(
        scores, np.asarray([w.score for w in want], scores.dtype)
    )


def test_stream_align_cigars_checkpoint_resume(tmp_path):
    """Cigars streaming + checkpoint: a resumed run re-delivers only the
    unfinished batches, alignments byte-equal to an uninterrupted run,
    and the checkpoint's recorded semantics (mode/cigars) round-trip
    through the drain worker thread."""
    pairs = _pairs(101, 32)
    runner = DataParallelRunner(backend="lax", traceback="device")
    ckpt = str(tmp_path / "c.json")

    full = {}
    n = stream_align(
        pairs, runner, batch_size=8, cigars=True,
        on_alignments=lambda i, t: full.__setitem__(i, list(t)),
    )
    assert n == 32 and sorted(full) == [0, 1, 2, 3]

    # First run "crashes" after two batches: simulate by a callback that
    # raises; the drain worker surfaces the error on the main thread.
    seen = {}

    def boom(i, t):
        seen[i] = list(t)
        if i == 1:
            raise RuntimeError("simulated crash")

    import pytest

    with pytest.raises(RuntimeError, match="simulated crash"):
        stream_align(
            pairs, runner, batch_size=8, cigars=True,
            checkpoint_path=ckpt, on_alignments=boom,
        )
    assert 0 in seen  # at least one batch completed and checkpointed

    # Resume: remaining batches only, byte-equal to the full run.
    resumed = {}
    n2 = stream_align(
        pairs, runner, batch_size=8, cigars=True, checkpoint_path=ckpt,
        on_alignments=lambda i, t: resumed.__setitem__(i, list(t)),
    )
    assert n2 < 32 and n2 % 8 == 0
    for i, t in resumed.items():
        assert t == full[i], i
    assert set(seen) | set(resumed) == {0, 1, 2, 3}
