"""Sequence parallelism: one pair's DP matrix sharded over the mesh's
devices (pipelined wavefront + ppermute boundary relay) must reproduce the
full Gotoh oracle exactly."""

import random

import numpy as np
import pytest

from sequencealigning_tpu.io.encode import pack_batch
from sequencealigning_tpu.ops import oracle_gotoh
from sequencealigning_tpu.parallel.mesh import make_mesh
from sequencealigning_tpu.parallel.seqpar import seqpar_fill


def _pairs(seed, n=8, n1_hi=200, n2_lo=300, n2_hi=900):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        n1 = rng.randint(1, n1_hi)
        n2 = rng.randint(n2_lo, n2_hi)
        out.append(
            (
                bytes(rng.choice(b"ACGT") for _ in range(n1)),
                bytes(rng.choice(b"ACGT") for _ in range(n2)),
            )
        )
    return out


@pytest.mark.parametrize("compat", [True, False])
def test_seqpar_matches_oracle_across_devices(compat):
    mesh = make_mesh()
    pairs = _pairs(61)
    batch = pack_batch(pairs, batch_size=8)
    finals = seqpar_fill(
        batch.query, batch.db, batch.query_len, batch.db_len,
        mesh=mesh, tile_lanes=128, compat=compat,
    )
    for b, (s1, s2) in enumerate(pairs):
        m, i_, d = oracle_gotoh.gotoh_fill(s1, s2, compat=compat)
        exp = (int(m[-1, -1]), int(i_[-1, -1]), int(d[-1, -1]))
        assert tuple(int(v) for v in finals[b]) == exp, (b, s1, s2)


def test_seqpar_matches_tiled_single_device_engine():
    """Cross-check the two long-pair engines against each other on a batch
    with short and empty edges."""
    from sequencealigning_tpu.ops.nw_affine_tiled import nw_affine_tiled_batch

    pairs = _pairs(67, n=6, n2_lo=1, n2_hi=600) + [(b"", b"ACG"), (b"AC", b"")]
    batch = pack_batch(pairs, batch_size=8)
    sp = seqpar_fill(
        batch.query, batch.db, batch.query_len, batch.db_len,
        mesh=make_mesh(), tile_lanes=128,
    )
    ti = nw_affine_tiled_batch(
        batch.query, batch.db, batch.query_len, batch.db_len,
        tile_lanes=128, backend="lax",
    )
    assert np.array_equal(sp[: len(pairs)], ti[: len(pairs)])


@pytest.mark.parametrize("compat", [True, False])
def test_seqpar_chained_beyond_mesh_capacity(compat):
    """db longer than n_devices * tile_lanes chains rounds: the last
    device's boundary emissions seed the next round's device 0.  Pairs
    span >2x the 8 x 128-lane mesh capacity (3 rounds) with ragged
    lengths so corners land in every round; exact vs the Gotoh oracle
    (VERDICT r3 item 6)."""
    rng = random.Random(71)
    pairs = []
    for n2 in (2900, 2500, 1500, 1024, 1025, 900, 40, 2048):
        n1 = rng.randint(1, 120)
        pairs.append(
            (
                bytes(rng.choice(b"ACGT") for _ in range(n1)),
                bytes(rng.choice(b"ACGT") for _ in range(n2)),
            )
        )
    batch = pack_batch(pairs, batch_size=8)
    finals = seqpar_fill(
        batch.query, batch.db, batch.query_len, batch.db_len,
        mesh=make_mesh(), tile_lanes=128, compat=compat,
    )
    for b, (s1, s2) in enumerate(pairs):
        m, i_, d = oracle_gotoh.gotoh_fill(s1, s2, compat=compat)
        exp = (int(m[-1, -1]), int(i_[-1, -1]), int(d[-1, -1]))
        assert tuple(int(v) for v in finals[b]) == exp, (b, len(s1), len(s2))
