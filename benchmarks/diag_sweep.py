"""Sweep the anti-diagonal banded kernel's (bt, chunk, unroll) on TPU.

Config-4 shape by default (1024 x ~5 kb, band 128).  Kernel-only timing
with device-resident inputs (mirrors configs_bench._banded_diag_kernel_only)
so the tunnel's transfer cost does not mask kernel deltas; GCUPS credits
the effective (row-kernel-padded) band per cell, same as BENCH_CONFIGS.

Usage: python benchmarks/diag_sweep.py [--pairs 1024] [--length 5115]
       [--band 128] [--cases fast4:128:128:8,score:256:64:16,...]
(case = mode:bt:chunk:unroll with mode in fast4|full|score)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

from sequencealigning_tpu.utils.compilecache import enable as _enable_cache

_enable_cache()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=1024)
    ap.add_argument("--length", type=int, default=5115)
    ap.add_argument("--band", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cases", default=None)
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")  # axon overrides the env
    import jax.numpy as jnp

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import _make_pairs

    from sequencealigning_tpu.io.encode import pack_batch, round_up
    from sequencealigning_tpu.ops import nw_banded_diag as nd

    if jax.default_backend() != "tpu":
        print("not on tpu; this sweep is meaningless off-chip", file=sys.stderr)
    rng = np.random.default_rng(7)
    pairs = _make_pairs(rng, args.pairs, args.length)
    batch = pack_batch(pairs, batch_size=args.pairs)
    qlen = batch.query_len
    dlen = batch.db_len
    B, L1 = batch.query.shape
    _, L2 = batch.db.shape
    diff = qlen.astype(np.int64) - dlen.astype(np.int64)
    k_lo = int(min(0, diff.min()) - args.band)
    k_hi = int(max(0, diff.max()) + args.band)
    k_lo_even = k_lo - (k_lo & 1)
    L = round_up((k_hi - k_lo_even + 2) // 2, 128)
    k_hi_eff = k_lo + round_up(k_hi - k_lo + 1, 128) - 1
    if k_lo_even + 2 * L - 1 < k_hi_eff:
        L += 128
    K_eff = k_hi_eff - k_lo + 1
    band_cells = float(
        (np.minimum(qlen.astype(np.int64), K_eff) * dlen.astype(np.int64)).sum()
    )
    dargs = (
        jnp.asarray(np.asarray(batch.query, np.int8)),
        jnp.asarray(np.asarray(batch.db, np.int8)),
        jnp.asarray(qlen, jnp.int32)[:, None],
        jnp.asarray(dlen, jnp.int32)[:, None],
    )

    if args.cases:
        cases = []
        for cs in args.cases.split(","):
            m, bt, ch, un = cs.split(":")
            cases.append((m, int(bt), int(ch), int(un)))
    else:
        cases = []
        for m in ("fast4", "score", "full"):
            wd = {"fast4": "fast4", "full": "full", "score": False}[m]
            bt0, ch0 = nd._pick_tile(B, L, wd)
            for un in (4, 8, 16, 32):
                cases.append((m, bt0, ch0, un))

    out = []
    for mode, bt, chunk, unroll in cases:
        wd = {"fast4": "fast4", "full": "full", "score": False}[mode]
        try:
            if chunk % unroll and unroll % chunk:
                raise ValueError("unroll must divide chunk")
            n_iters = round_up((L1 + L2 + 1) // 2 + 1, chunk)
            fn = nd._jitted_diag(
                "pallas", k_lo_even, L, n_iters, k_hi_eff,
                nd.ScoringScheme(), True, False, wd, bt, chunk, unroll,
            )
            t0 = time.perf_counter()
            np.asarray(fn(*dargs)[0])  # compile + warmup, forced read
            compile_s = time.perf_counter() - t0
            dt = float("inf")
            for _ in range(args.iters):
                t0 = time.perf_counter()
                np.asarray(fn(*dargs)[0])
                dt = min(dt, time.perf_counter() - t0)
            row = {
                "mode": mode, "bt": bt, "chunk": chunk, "unroll": unroll,
                "band_gcups": round(band_cells / dt / 1e9, 2),
                "ms": round(dt * 1e3, 2), "compile_s": round(compile_s, 1),
            }
        except Exception as ex:
            row = {
                "mode": mode, "bt": bt, "chunk": chunk, "unroll": unroll,
                "error": f"{type(ex).__name__}: {str(ex)[:160]}",
            }
        out.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
