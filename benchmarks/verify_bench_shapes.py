"""Validate the exact bench.py kernel configurations against the scalar
oracle on the current backend (run on TPU to certify the headline numbers
are produced by a correct kernel, not a fast wrong one).

Samples pairs with mixed true lengths through every (batch, np_slots, bt,
dirs_mode) combination bench.py times, checks finals against
oracle_gotoh.gotoh_score, and (for fast4) walks + rescores one CIGAR.

Usage: python benchmarks/verify_bench_shapes.py
"""

from __future__ import annotations

import sys

import numpy as np


import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

def main() -> int:
    import jax
    import jax.numpy as jnp

    from sequencealigning_tpu.config import ScoringScheme
    from sequencealigning_tpu.io.encode import pack_batch, trim_for_stream
    from sequencealigning_tpu.ops import oracle_gotoh
    from sequencealigning_tpu.ops.nw_affine_stream import (
        build_stream_inputs,
        gotoh_fill_stream_pallas,
        plan_stream,
        stream_finals,
    )

    on_tpu = jax.default_backend() == "tpu"
    length = 2046 if on_tpu else 96
    configs = (
        [(4096, 128, 16, "fast4"), (8192, 128, 32, False), (2048, 128, 16, True)]
        if on_tpu
        else [(32, 2, 8, "fast4"), (32, 2, 8, False)]
    )
    rng = np.random.default_rng(17)
    failures = 0

    for n, np_slots, bt, dirs_mode in configs:
        pairs = []
        for _ in range(n):
            m = int(rng.integers(max(2, length // 2), length))
            ref = rng.choice(list(b"ACGT"), m).astype(np.uint8).tobytes()
            mut = bytearray(ref)
            for _ in range(max(1, m // 100)):
                p_ = int(rng.integers(0, m))
                mut[p_] = int(rng.choice([c for c in b"ACGT" if c != mut[p_]]))
            pairs.append((bytes(mut), ref))
        batch = trim_for_stream(pack_batch(pairs, batch_size=n))
        B, L1 = batch.query.shape
        _, L2 = batch.db.shape
        plan = plan_stream(B, L1, L2, np_slots=np_slots)
        args = tuple(
            jnp.asarray(a)
            for a in build_stream_inputs(
                np.asarray(batch.query, np.int32),
                np.asarray(batch.db, np.int32),
                batch.query_len.astype(np.int32),
                batch.db_len.astype(np.int32),
                plan,
            )
        )

        @jax.jit
        def fn(qs, ds, a, b, c, d, plan=plan, dm=dirs_mode, bt=bt):
            outs, dirs = gotoh_fill_stream_pallas(
                qs, ds, a, b, c, d, plan, ScoringScheme(), True, False, dm,
                bt=bt,
            )
            return stream_finals(outs, plan.np_slots), dirs

        finals, dirs = fn(*args)
        finals = np.asarray(finals)
        sample = rng.choice(n, size=min(4, n), replace=False)
        for b in sample:
            exp = oracle_gotoh.gotoh_score(pairs[b][0], pairs[b][1])
            got = int(finals[b].max())
            status = "OK" if got == exp else "MISMATCH"
            if got != exp:
                failures += 1
            print(
                f"[verify] n={n} np={np_slots} bt={bt} dirs={dirs_mode} "
                f"pair {b}: kernel={got} oracle={exp} {status}",
                file=sys.stderr,
            )
        if dirs_mode == "fast4":
            b = int(sample[0])
            from sequencealigning_tpu.ops.traceback import fast4_traceback_pair

            row, _slot, off = plan.pair_coords(b)
            # Slice the pair's dirs row on device: fetching the full tensor
            # through a slow host link is GBs.
            dirs_row = np.asarray(dirs[:, row, :])
            score, alns = fast4_traceback_pair(
                dirs_row, finals[b],
                pairs[b][0], pairs[b][1], d_offset=off,
            )
            a1, a2 = alns[0]
            ok = (
                a1.replace("-", "").encode() == pairs[b][0]
                and a2.replace("-", "").encode() == pairs[b][1]
            )
            if not ok:
                failures += 1
            print(
                f"[verify] fast4 CIGAR pair {b}: reconstructs={'OK' if ok else 'FAIL'}",
                file=sys.stderr,
            )

    # --- banded kernel at the config-4 bench shape -------------------------
    from sequencealigning_tpu.ops.nw_banded import nw_banded_batch
    from sequencealigning_tpu.ops.traceback import (
        banded_fast4_traceback_pair,
        banded_traceback_pair,
    )

    n, blen, band = (1024, 5115, 128) if on_tpu else (16, 150, 16)
    pairs = []
    for _ in range(n):
        m = int(rng.integers(max(2, blen // 2), blen))
        ref = rng.choice(list(b"ACGT"), m).astype(np.uint8).tobytes()
        mut = bytearray(ref)
        for _ in range(max(1, m // 100)):
            p_ = int(rng.integers(0, m))
            mut[p_] = int(rng.choice([c for c in b"ACGT" if c != mut[p_]]))
        pairs.append((bytes(mut), ref))
    batch = pack_batch(pairs, batch_size=n)
    for dm, walker in (("full", banded_traceback_pair),
                       ("fast4", banded_fast4_traceback_pair)):
        res = nw_banded_batch(
            batch.query, batch.db, batch.query_len, batch.db_len,
            band=band, with_dirs=dm,
        )
        finals = np.asarray(res.finals)
        sample = rng.choice(n, size=min(4, n), replace=False)
        for b in sample:
            exp = oracle_gotoh.gotoh_score(pairs[b][0], pairs[b][1])
            got = int(finals[b].max())
            if got != exp:
                failures += 1
            print(
                f"[verify] banded dirs={dm} pair {b}: kernel={got} "
                f"oracle={exp} {'OK' if got == exp else 'MISMATCH'}",
                file=sys.stderr,
            )
        b = int(sample[0])
        dirs_b = np.asarray(res.dirs[:, b, :])
        score, alns = walker(
            dirs_b, finals[b], pairs[b][0], pairs[b][1], res.k_lo,
        ) if dm == "fast4" else walker(
            dirs_b, finals[b], pairs[b][0], pairs[b][1], res.k_lo,
            max_alignments=1,
        )
        a1, a2 = alns[0]
        ok = (
            a1.replace("-", "").encode() == pairs[b][0]
            and a2.replace("-", "").encode() == pairs[b][1]
        )
        if not ok:
            failures += 1
        print(
            f"[verify] banded {dm} CIGAR pair {b}: "
            f"reconstructs={'OK' if ok else 'FAIL'}",
            file=sys.stderr,
        )

    # --- tiled long-pair fill ---------------------------------------------
    from sequencealigning_tpu.ops.nw_affine_tiled import nw_affine_tiled_batch

    tl = 2046 if on_tpu else 120
    pairs = []
    for _ in range(8):
        m = int(rng.integers(max(2, tl // 2), tl))
        ref = rng.choice(list(b"ACGT"), m).astype(np.uint8).tobytes()
        mut = bytearray(ref)
        for _ in range(max(1, m // 50)):
            p_ = int(rng.integers(0, m))
            mut[p_] = int(rng.choice([c for c in b"ACGT" if c != mut[p_]]))
        pairs.append((bytes(mut), ref))
    batch = pack_batch(pairs, batch_size=8)
    tiled = nw_affine_tiled_batch(
        batch.query, batch.db, batch.query_len, batch.db_len,
        tile_lanes=256 if on_tpu else 128,
        backend="pallas" if on_tpu else "lax",
    )
    for b in range(8):
        exp = oracle_gotoh.gotoh_score(pairs[b][0], pairs[b][1])
        got = int(tiled[b].max())
        if got != exp:
            failures += 1
        print(
            f"[verify] tiled pair {b}: kernel={got} oracle={exp} "
            f"{'OK' if got == exp else 'MISMATCH'}",
            file=sys.stderr,
        )

    print(f"[verify] {'PASS' if failures == 0 else f'{failures} FAILURES'}",
          file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
