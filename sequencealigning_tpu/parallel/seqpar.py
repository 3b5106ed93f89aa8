"""Sequence parallelism: ONE pair's DP matrix sharded across devices.

The tiled fill (ops.nw_affine_tiled) splits the db axis into W-lane tiles
coupled only through an O(n1) boundary column.  Here each device of a mesh
axis owns one tile, and tiles run as a pipelined wavefront: in phase p,
device d computes row-chunk p - d*L of its tile (L = the skew that keeps a
consumer behind its producer), then ships the chunk of boundary values its
last lane just produced to device d+1 over ICI with jax.lax.ppermute.
After (D-1)*L + n_chunks phases every device has finished its tile and the
corner finals are psum-merged.  This is the SURVEY §2 sequence/context-
parallel axis (docs/architecture.md): wavefront halos around a ring, XLA
collectives only -- no NCCL/MPI analog needed.

The fill is score-only like the tiled engine; seqpar_align (r5) adds
the pair's ALIGNMENT by certifying a banded single-chip fill against
the mesh-exact score (band doubling; Myers-Miller exact fallback).

Capacity: one tile per device sweeps n_devices * tile_lanes db lanes per
round; longer dbs CHAIN rounds -- the last device's boundary-column
emissions (emit=True) seed the next round's device 0 (chained=True),
with one host round-trip per link.  Exactness across chains is pinned by
tests/test_seqpar.py::test_seqpar_chained_beyond_mesh_capacity.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from sequencealigning_tpu.config import NEG_INF, ScoringScheme
from sequencealigning_tpu.io.encode import round_up as _round_up
from sequencealigning_tpu.ops.nw_affine_tiled import (
    _boundary0,
    _col0_vals,
    _tile_step,
)
from sequencealigning_tpu.parallel.mesh import make_mesh


@functools.lru_cache(maxsize=16)
def _jitted_seqpar(
    mesh, axis, w, ngc, c, scheme, compat, wildcard,
    chained: bool = False, emit: bool = False,
):
    D = mesh.shape[axis]
    npc = ngc // c
    L = w // c + 2  # consumer skew (phases) that keeps producers ahead
    pt = (D - 1) * L + npc  # total phases
    blen = ngc + w  # boundary buffer, producer-step indexed

    def shard(query, db_local, n1v, n2v, x_base, bm_in, bd_in, bh_in):
        # query: (B, ngc) pre-shifted qs (replicated); db_local: (B, W)
        # this device's lane chars; n1v/n2v: (B, 1) replicated; x_base:
        # (1, 1) global lane offset of this ROUND (chained calls for db
        # longer than D * W lanes); bm/bd/bh_in: (B, blen) boundary
        # emissions of the previous round's last device (used by device 0
        # when chained -- the closed-form x=0 column otherwise).
        B = query.shape[0]
        d = jax.lax.axis_index(axis)
        x0 = x_base[0, 0] + d * w + 1
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (B, w), 1)
        lane_0 = col_iota == 0
        roll = lambda a: jnp.roll(a, 1, axis=1)
        c_m, c_i, c_d = _col0_vals(x0, col_iota, scheme, compat)
        lcap = n2v - x0
        gcap = lcap + n1v

        # Boundary buffers (producer-step indexed: consumer step g reads
        # mb/db at g + W - 1 and hb1 at the same offset of the pre-shifted
        # array).  Device 0 gets the closed-form x=0 column (round 0) or
        # the previous round's chained boundary.
        is0 = (d == 0)
        if chained:
            blm = jnp.where(is0, bm_in, 0)
            bld = jnp.where(is0, bd_in, 0)
            blh = jnp.where(is0, bh_in, 0)
        else:
            hb1_0, mb_0, db_0 = _boundary0(n1v, ngc, scheme, compat)
            pad0 = lambda a: jnp.pad(a, ((0, 0), (w - 1, 1)))
            blm = jnp.where(is0, pad0(mb_0), 0)
            bld = jnp.where(is0, pad0(db_0), 0)
            blh = jnp.where(is0, pad0(hb1_0), 0)

        neg = jnp.full((B, w), NEG_INF, jnp.int32)
        zeros = jnp.zeros((B, w), jnp.int32)

        def chunk_steps(state, j):
            """Run C steps (g = j*c + i) of this tile; returns new state,
            capture increments, and the (B, 3, C) boundary emissions."""
            H2, H1, M1, I1, D1, s1d, blm, bld, blh = state

            def body(carry, i):
                H2, H1, M1, I1, D1, s1d, fm, fi, fd = carry
                g = j * c + i
                pick = lambda a, off: jax.lax.dynamic_slice_in_dim(
                    a, g + off, 1, 1
                )
                M, I, D, H, s1d = _tile_step(
                    H2, H1, M1, I1, D1, s1d,
                    pick(query, 0), pick(blh, w - 1), pick(blm, w - 1),
                    pick(bld, w - 1), g,
                    db_local, col_iota, lane_0, c_m, c_i, c_d,
                    scheme, wildcard, roll,
                )
                cap = jnp.logical_and(g == gcap, col_iota == lcap)
                fm = fm + jnp.where(cap, M, 0)
                fi = fi + jnp.where(cap, I, 0)
                fd = fd + jnp.where(cap, D, 0)
                br = jnp.concatenate(
                    [M[:, -1:], D[:, -1:], H[:, -1:]], axis=1
                )
                return (H1, H, M, I, D, s1d, fm, fi, fd), br

            carry0 = (H2, H1, M1, I1, D1, s1d, zeros, zeros, zeros)
            carry, brs = jax.lax.scan(
                body, carry0, jnp.arange(c, dtype=jnp.int32)
            )
            return carry[:6], carry[6:], jnp.moveaxis(brs, 0, 2)

        def phase(carry, p):
            (H2, H1, M1, I1, D1, s1d, blm, bld, blh, fm, fi, fd,
             obm, obd, obh) = carry
            j = p - d * L
            active = jnp.logical_and(j >= 0, j < npc)
            jc = jnp.clip(j, 0, npc - 1)
            (nH2, nH1, nM1, nI1, nD1, ns1d), (cfm, cfi, cfd), brs = (
                chunk_steps(
                    (H2, H1, M1, I1, D1, s1d, blm, bld, blh), jc
                )
            )
            sel = lambda a, b: jnp.where(active, a, b)
            H2, H1, M1 = sel(nH2, H2), sel(nH1, H1), sel(nM1, M1)
            I1, D1, s1d = sel(nI1, I1), sel(nD1, D1), sel(ns1d, s1d)
            fm = fm + jnp.where(active, cfm, 0)
            fi = fi + jnp.where(active, cfi, 0)
            fd = fd + jnp.where(active, cfd, 0)

            # Ship this phase's boundary chunk to the right neighbor.
            brs = jnp.where(active, brs, 0)
            if emit:
                # Collect the LAST device's emissions (producer-step
                # indexed like received chunks: M/D at g, H at g + 1) --
                # the chained input for the next round's device 0.
                e_active = jnp.logical_and(active, d == D - 1)
                eoff = jc * c
                eupd = lambda buf, row, o: jnp.where(
                    e_active,
                    jax.lax.dynamic_update_slice_in_dim(
                        buf, row, o, axis=1
                    ),
                    buf,
                )
                obm = eupd(obm, brs[:, 0], eoff)
                obd = eupd(obd, brs[:, 1], eoff)
                obh = eupd(obh, brs[:, 2], eoff + 1)
            recv = jax.lax.ppermute(
                brs, axis, [(i, (i + 1) % D) for i in range(D)]
            )
            # Write the received chunk at the producer-step offset.  The
            # producer (d-1) was active iff p - (d-1)*L in [0, npc); the
            # wrap-around edge (device 0 receiving from D-1) is never
            # active because p < (D-1)*L + npc < D*L + npc... gate anyway.
            js = p - (d - 1) * L
            p_active = jnp.logical_and(
                jnp.logical_and(js >= 0, js < npc), d > 0
            )
            off = jnp.clip(js, 0, npc - 1) * c
            upd = lambda buf, row: jnp.where(
                p_active,
                jax.lax.dynamic_update_slice_in_dim(
                    buf, row, off, axis=1
                ),
                buf,
            )
            blm = upd(blm, recv[:, 0])
            bld = upd(bld, recv[:, 1])
            blh_row = recv[:, 2]
            # hb1(y) = H_b(y-1): store H one step later in the buffer.
            blh = jnp.where(
                p_active,
                jax.lax.dynamic_update_slice_in_dim(
                    blh, blh_row, off + 1, axis=1
                ),
                blh,
            )
            return (
                H2, H1, M1, I1, D1, s1d, blm, bld, blh, fm, fi, fd,
                obm, obd, obh,
            ), None

        zb = jnp.zeros((B, blen), jnp.int32)
        carry0 = (
            neg, neg, neg, neg, neg, zeros, blm, bld, blh,
            zeros, zeros, zeros, zb, zb, zb,
        )
        carry, _ = jax.lax.scan(
            phase, carry0, jnp.arange(pt, dtype=jnp.int32)
        )
        fm, fi, fd = carry[9:12]
        finals = jnp.stack([fm.sum(1), fi.sum(1), fd.sum(1)], axis=1)
        # Each pair's corner lives on exactly one device (and, chained,
        # in exactly one round -- non-owning rounds contribute zeros).
        finals = jax.lax.psum(finals, axis)
        if emit:
            obm, obd, obh = carry[12:15]
            # Live on device D-1 only (zeros elsewhere): psum replicates.
            out_b = jax.lax.psum(jnp.stack([obm, obd, obh], axis=1), axis)
            return finals, out_b
        return finals

    rep = P()
    out_specs = (rep, rep) if emit else rep
    fn = jax.jit(
        jax.shard_map(
            shard,
            mesh=mesh,
            in_specs=(rep, P(None, axis), rep, rep, rep, rep, rep, rep),
            out_specs=out_specs,
            check_vma=False,
        )
    )
    return fn


def seqpar_fill(
    query: np.ndarray,
    db: np.ndarray,
    query_len: np.ndarray,
    db_len: np.ndarray,
    mesh: Optional[Mesh] = None,
    axis: str = "data",
    tile_lanes: int = 4096,
    chunk: int = 128,
    scheme: ScoringScheme = ScoringScheme(),
    compat: bool = True,
    wildcard: bool = False,
) -> np.ndarray:
    """Exact Gotoh corner finals (B, 3) with the db axis sharded over the
    mesh -- one pair can span every chip.  db longer than
    n_devices * tile_lanes is CHAINED: the mesh sweeps D * W lanes per
    round and the last device's boundary-column emissions seed the next
    round's device 0 (same producer/consumer protocol as the in-round
    ppermute relay, one extra host round-trip per chain link)."""
    mesh = mesh if mesh is not None else make_mesh()
    D = mesh.shape[axis]
    B, L1 = query.shape
    _, L2 = db.shape
    W = _round_up(min(tile_lanes, max(-(-L2 // D), 128)), 128)
    n_rounds = max(1, -(-L2 // (D * W)))
    Bp = _round_up(max(B, 8), 8)
    n1p = _round_up(L1 + 1, chunk)
    ngc = n1p + W
    blen = ngc + W

    q = np.zeros((Bp, L1), np.int32)
    q[:B] = query
    qs = np.zeros((Bp, ngc), np.int32)
    qs[:, 1 : 1 + min(L1, ngc - 1)] = q[:, : min(L1, ngc - 1)]
    d_all = np.zeros((Bp, n_rounds * D * W), np.int32)
    d_all[:B, :L2] = db
    qlen = np.ones(Bp, np.int32)
    dlen = np.ones(Bp, np.int32)
    qlen[:B] = np.asarray(query_len, np.int32)
    dlen[:B] = np.asarray(db_len, np.int32)

    rep = NamedSharding(mesh, P())
    lane = NamedSharding(mesh, P(None, axis))
    qs_d = jax.device_put(qs, rep)
    n1_d = jax.device_put(qlen[:, None], rep)
    n2_d = jax.device_put(dlen[:, None], rep)
    zb = np.zeros((Bp, blen), np.int32)
    b_in = jax.device_put(np.zeros((Bp, 3, blen), np.int32), rep)
    finals = np.zeros((B, 3), np.int64)
    for r in range(n_rounds):
        fn = _jitted_seqpar(
            mesh, axis, W, ngc, chunk, scheme, compat, wildcard,
            chained=(r > 0), emit=(r + 1 < n_rounds),
        )
        seg = jax.device_put(
            np.ascontiguousarray(d_all[:, r * D * W : (r + 1) * D * W]),
            lane,
        )
        xb = jax.device_put(
            np.full((1, 1), r * D * W, np.int32), rep
        )
        args = (
            qs_d, seg, n1_d, n2_d, xb,
            b_in[:, 0], b_in[:, 1], b_in[:, 2],
        )
        if r + 1 < n_rounds:
            fr, b_in = fn(*args)
        else:
            fr = fn(*args)
        finals = finals + np.asarray(fr)[:B]
    finals = finals.astype(np.int32)
    # n2 == 0 pairs never hit a lane: closed-form corner.
    o, e = scheme.gap_open, scheme.gap_extend
    for b in range(B):
        if int(dlen[b]) == 0:
            n1 = int(qlen[b])
            if n1 == 0:
                finals[b] = (0, NEG_INF, NEG_INF)
            elif compat:
                finals[b] = (NEG_INF, NEG_INF, o + (n1 + 1) * e)
            else:
                finals[b] = (NEG_INF, o + n1 * e, NEG_INF)
    return finals


def seqpar_align(
    seq1: bytes,
    seq2: bytes,
    mesh: Optional[Mesh] = None,
    axis: str = "data",
    tile_lanes: int = 4096,
    chunk: int = 128,
    scheme: ScoringScheme = ScoringScheme(),
    compat: bool = True,
    band: int = 256,
    max_band: int = 4096,
):
    """ONE pair: mesh-sharded exact score AND an alignment (r5; the
    sequence-parallel axis was score-only through round 4).

    The exact Gotoh score comes from seqpar_fill (DP matrix sharded over
    the mesh, ppermute wavefront); the ALIGNMENT comes from a banded
    fast4 fill with band doubling until the banded score EQUALS the
    mesh-exact score -- at that point the banded path is provably
    optimal (the same Ukkonen-style certificate as
    models.gotoh._long_batch, with the certifying score computed across
    the mesh instead of on one chip).  Past max_band the Myers-Miller
    exact O(n)-memory alignment takes over (models.gotoh._mm_fallback's
    compat-rescore contract: in the rare compat corner where MM's
    textbook optimum cannot reach the compat-quirk score, the aligned
    strings are None and the score stands alone).

    Returns (score, aligned_seq1, aligned_seq2).
    """
    from sequencealigning_tpu.io.encode import pack_batch
    from sequencealigning_tpu.ops.nw_banded_diag import (
        nw_banded_diag_batch,
    )
    from sequencealigning_tpu.ops.traceback import (
        banded_diag_fast4_traceback_pair,
    )
    from sequencealigning_tpu.ops.traceback_device import (
        banded_diag_device_tbs,
        use_device_walk,
    )

    batch = pack_batch([(seq1, seq2)], batch_size=8)
    finals = seqpar_fill(
        batch.query, batch.db, batch.query_len, batch.db_len,
        mesh=mesh, axis=axis, tile_lanes=tile_lanes, chunk=chunk,
        scheme=scheme, compat=compat,
    )
    exact = int(np.asarray(finals)[0].max())
    b = max(128, band)
    while b <= max_band:
        res = nw_banded_diag_batch(
            batch.query, batch.db, batch.query_len, batch.db_len,
            band=b, scheme=scheme, compat=compat, with_dirs="fast4",
        )
        bf = np.asarray(res.finals)
        if int(bf[0].max()) == exact:
            if jax.default_backend() != "cpu":
                r = banded_diag_device_tbs(
                    res.dirs, bf[:1], [seq1], [seq2], res.k_lo_even,
                    compat=compat,
                    pair_idx=np.zeros(1, np.int32),
                )[0]
                if isinstance(r, tuple):
                    _score, alns = r
                    return exact, alns[0][0], alns[0][1]
            _score, alns = banded_diag_fast4_traceback_pair(
                np.asarray(res.dirs[:, 0, :]), bf[0], seq1, seq2,
                res.k_lo_even, compat=compat,
            )
            return exact, alns[0][0], alns[0][1]
        b *= 2
    from sequencealigning_tpu.config import AlignConfig, Algo
    from sequencealigning_tpu.models.gotoh import GotohAligner

    al = GotohAligner(
        AlignConfig(
            algo=Algo.NEEDLEMAN_WUNSCH, scoring=scheme, compat=compat
        )
    )
    r = al._mm_fallback((seq1, seq2), exact)
    return exact, r.get("aligned_query"), r.get("aligned_db")
