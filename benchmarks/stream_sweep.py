"""Sweep (bt, chunk) for the streamed-pair kernel's dirs modes on TPU.

The dirs-mode VMEM model (PERF.md): the double-buffered dirs block is
(chunk/upack)*BT*P*4 bytes, so at bt=32/chunk=128 fast4 overflows (the
documented Mosaic crash at >=4096 pairs) while bt=32/chunk=64 should fit.
This tool measures each candidate to find the best headline configuration.

Usage: python benchmarks/stream_sweep.py [--pairs 4096] [--length 2046]
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
    ap.add_argument("--pairs", type=int, default=4096)
    ap.add_argument("--length", type=int, default=2046)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument(
        "--cases", default=None,
        help="comma list of wd:bt:chunk[:unroll[:dtype]] (wd in "
        "fast4|full|score; dtype in i32|i16)",
    )
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")  # axon overrides the env
    import jax.numpy as jnp

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import _make_pairs, _stream_args

    from sequencealigning_tpu.config import ScoringScheme
    from sequencealigning_tpu.io.encode import pack_batch, trim_for_stream
    from sequencealigning_tpu.ops.nw_affine_stream import (
        gotoh_fill_stream_pallas,
        plan_stream,
    )

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        print("not on tpu; this sweep is meaningless off-chip", file=sys.stderr)
    rng = np.random.default_rng(42)
    scheme = ScoringScheme()

    default_cases = [
        # headline today: fast4 bt16 chunk128
        ("fast4", 16, 128, 32, "i32"),
        # the VMEM-model fix candidates
        ("fast4", 32, 64, 32, "i32"),
        ("fast4", 32, 32, 32, "i32"),
        ("fast4", 16, 64, 32, "i32"),
        # co-optimal full mode (VERDICT bar: >=65 at 4096; HBM caps one
        # sweep at 2048, so per-sweep rate is what matters)
        ("full", 16, 128, 32, "i32"),
        ("full", 16, 64, 32, "i32"),
        ("full", 32, 32, 32, "i32"),
        ("full", 32, 64, 32, "i32"),
        # int16 state (2x lane density; compiles only on a Mosaic with
        # i16 vector support -- errors are recorded per case)
        ("fast4", 16, 128, 32, "i16"),
        ("score", 32, 128, 32, "i16"),
    ]
    if args.cases:
        cases = []
        for c in args.cases.split(","):
            parts = c.split(":")
            wd = parts[0]
            cases.append((
                wd, int(parts[1]), int(parts[2]),
                int(parts[3]) if len(parts) > 3 else 32,
                parts[4] if len(parts) > 4 else "i32",
            ))
    else:
        cases = default_cases

    pairs = _make_pairs(rng, args.pairs, args.length)
    batch = trim_for_stream(pack_batch(pairs, batch_size=args.pairs))
    cells = float(
        (batch.query_len.astype(np.int64) * batch.db_len.astype(np.int64)).sum()
    )
    B, L1 = batch.query.shape
    _, L2 = batch.db.shape

    out = []
    for wd, bt, chunk, unroll, sdt_name in cases:
        wd_arg = {"fast4": "fast4", "full": "full", "score": False}[wd]
        sdt = jnp.int16 if sdt_name == "i16" else jnp.int32
        n = args.pairs
        cells_n = cells
        if wd == "full" and on_tpu and args.pairs * args.length > 2048 * 2100:
            # one full-dirs sweep at 4096x2kb exceeds HBM; measure the
            # per-sweep rate at half batch (the drained-sub-batch rate)
            n = args.pairs // 2
            cells_n = cells / 2
        b = batch if n == args.pairs else trim_for_stream(
            pack_batch(pairs[:n], batch_size=n)
        )
        Bn = b.query.shape[0]
        try:
            plan = plan_stream(
                Bn, L1, L2, chunk=chunk, np_slots=max(1, min(128, Bn // 8))
            )
            sargs = tuple(jnp.asarray(a) for a in _stream_args(b, plan))

            @jax.jit
            def fn(qs, ds, a1, b1, c1, d1, plan=plan, wd_arg=wd_arg,
                   bt=bt, unroll=unroll, sdt=sdt):
                outs, _ = gotoh_fill_stream_pallas(
                    qs, ds, a1, b1, c1, d1, plan, scheme, True, False,
                    wd_arg, bt=bt, unroll=unroll, state_dtype=sdt,
                )
                return outs[0].sum(axis=2)

            t0 = time.perf_counter()
            np.asarray(fn(*sargs))  # compile + warmup (forced host read)
            compile_s = time.perf_counter() - t0
            dt = float("inf")
            for _ in range(args.iters):
                t0 = time.perf_counter()
                np.asarray(fn(*sargs))
                dt = min(dt, time.perf_counter() - t0)
            g = cells_n / dt / 1e9
            row = {
                "wd": wd, "bt": bt, "chunk": chunk, "unroll": unroll,
                "dtype": sdt_name,
                "pairs": n, "gcups": round(g, 2),
                "ms": round(dt * 1e3, 2), "compile_s": round(compile_s, 1),
            }
        except Exception as ex:
            row = {
                "wd": wd, "bt": bt, "chunk": chunk, "unroll": unroll,
                "dtype": sdt_name,
                "pairs": n,
                "error": f"{type(ex).__name__}: {str(ex)[:160]}",
            }
        out.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
