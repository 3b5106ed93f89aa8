"""Real multi-PROCESS distributed execution (VERDICT r3 item 2).

Every other mesh test in this suite is one process with 8 fake devices;
these launch 2 actual OS processes that join a process-spanning mesh via
jax.distributed.initialize (parallel.mesh.multihost_init), shard the
input per process, run the shard_map fill with Gloo-backed cross-process
collectives, and gather results on process 0 -- the DCN-facing half of
BASELINE config 5's "2-host" story, runnable on CPU.
"""

import json
import os
import random
import subprocess

import pytest
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _mk_pairs():
    rng = random.Random(21)
    pairs = []
    for _ in range(32):
        n1 = rng.randint(3, 24)
        n2 = rng.randint(3, 24)
        pairs.append(
            (
                bytes(rng.choice(b"ACGT") for _ in range(n1)),
                bytes(rng.choice(b"ACGT") for _ in range(n2)),
            )
        )
    return pairs


def _expected_scores():
    """Single-process expectation over the same 32 pairs (seed 21)."""
    from sequencealigning_tpu.io.encode import pack_batch
    from sequencealigning_tpu.parallel.runner import DataParallelRunner

    runner = DataParallelRunner(backend="lax", np_slots=2)
    finals = np.asarray(runner.scores(pack_batch(_mk_pairs())))
    return finals.max(axis=1).tolist()


def _expected_cigars():
    """Single-process cigars-streaming expectation over the same pairs,
    on the same device-walk route the workers take (traceback forced to
    'device'; per-process batch_size matches the workers' per//2 = 8)."""
    from sequencealigning_tpu.parallel.runner import DataParallelRunner
    from sequencealigning_tpu.parallel.streaming import stream_align

    runner = DataParallelRunner(
        backend="lax", np_slots=2, traceback="device"
    )
    got = {}
    n = stream_align(
        _mk_pairs(), runner=runner, batch_size=8, cigars=True,
        on_alignments=lambda i, t: got.__setitem__(i, list(t)),
    )
    assert n == 32
    out = []
    for i in sorted(got):
        for t in got[i]:
            assert isinstance(t, tuple), t
            out.append([t[0], t[1][0][0], t[1][0][1]])
    return out


def _expected_modes_cigars():
    """Single-process semi-mode cigars expectation (device walk route,
    matching the workers' batch_size)."""
    from sequencealigning_tpu.parallel.runner import DataParallelRunner
    from sequencealigning_tpu.parallel.streaming import stream_align

    runner = DataParallelRunner(
        backend="lax", np_slots=2, traceback="device"
    )
    got = {}
    n = stream_align(
        _mk_pairs(), runner=runner, batch_size=8, cigars=True,
        mode="semi",
        on_alignments=lambda i, t: got.__setitem__(i, list(t)),
    )
    assert n == 32
    out = []
    for i in sorted(got):
        for t in got[i]:
            assert isinstance(t, tuple), t
            out.append([t[0], t[1][0][0], t[1][0][1]])
    return out


def _launch_workers(nproc):
    port = 12000 + (os.getpid() + nproc) % 20000
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device count
    env.pop("JAX_PLATFORMS", None)
    return [
        subprocess.Popen(
            [sys.executable, WORKER, str(p), str(nproc), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            env=env, cwd=REPO, text=True,
        )
        for p in range(nproc)
    ]


def test_two_process_mesh_scores_and_stream():
    procs = _launch_workers(2)
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:{out}\nstderr:{err}"
    result = None
    cigars = {}
    for _, out, _ in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                result = json.loads(line[len("RESULT "):])
            for p in (0, 1):
                tag = f"CIGARS{p} "
                if line.startswith(tag):
                    cigars[p] = json.loads(line[len(tag):])
    assert result is not None, outs
    assert result["processes"] == 2
    assert result["devices"] == 8
    want = _expected_scores()
    assert result["scores"] == want, (result["scores"], want)
    assert result["stream"] == want, (result["stream"], want)
    # Multi-process CIGAR streaming (VERDICT r4 item 4): each process
    # drains its own packed-op rows; stitched local results must be
    # byte-equal to the single-process cigars run over the same pairs.
    assert sorted(cigars) == [0, 1], outs
    assert cigars[0] + cigars[1] == _expected_cigars()
    # Textbook-mode (semi) cigars across processes (r5): same contract.
    modes = {}
    for _, out, _ in outs:
        for line in out.splitlines():
            for p in (0, 1):
                tag = f"MODES{p} "
                if line.startswith(tag):
                    modes[p] = json.loads(line[len(tag):])
    assert sorted(modes) == [0, 1], outs
    assert modes[0] + modes[1] == _expected_modes_cigars()


@pytest.mark.tier2  # 4 ranks x 4 fake devices; slower Gloo setup
def test_four_process_mesh_scores():
    """Scale the process-spanning mesh to 4 ranks (16 devices): gathered
    scores and streamed scores must still match the single-process
    expectation (cigars legs are exercised by the 2-process test)."""
    procs = _launch_workers(4)
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:{out}\nstderr:{err}"
    result = None
    for _, out, _ in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                result = json.loads(line[len("RESULT "):])
    assert result is not None, outs
    assert result["processes"] == 4
    assert result["devices"] == 16
    want = _expected_scores()
    assert result["scores"] == want
    assert result["stream"] == want
