"""Per-stage host-timeline profile of the config-5 streaming path.

VERDICT round-3 item 1: the 1M-pair run sustains ~12.2k pairs/s while the
score-only stream kernel measures 114 GCUPS (~37 ms/batch at 4096 x 1022)
-- decompose the remaining ~300 ms/batch into named stages so the fix (or
the proof that the tunnel binds) is measured, not guessed.

Stages per batch (mirrors benchmarks/million_bench.py + parallel/streaming):
  synth      vectorized input synthesis (rng + mutate)
  pack       io.encode.pack_arrays
  prep       runner._stream_args host work WITHOUT device_put
  h2d        device_put of the 6 stream args (forced: tiny reduce readback)
  step       jitted sharded fill, dispatch->forced final read
  total_sync sum when run serially (upper bound)
  pipelined  measured ms/batch of the real double-buffered stream loop

Tunnel microbench: round-trip latency of a trivial op and device_put
bandwidth at several sizes, so the h2d stage can be attributed to link
speed vs host copy.

Usage: python benchmarks/stream_profile.py [--pairs 4096] [--length 1022]
       [--iters 8] [--out PROFILE_STREAM.json]
"""

from __future__ import annotations

import argparse
import json
import os as _os
import sys as _sys
import time

import numpy as np

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from sequencealigning_tpu.utils.compilecache import enable as _enable

_enable()


def _force(x):
    """Force a real host read (block_until_ready returns early through the
    axon tunnel; an np.asarray of a scalar-ish result does not)."""
    return np.asarray(x)


def synth(rng, n, length):
    alpha = np.frombuffer(b"ACGT", np.uint8)
    refs = alpha[rng.integers(0, 4, (n, length))]
    muts = refs.copy()
    n_mut = max(1, length // 100)
    rows = np.repeat(np.arange(n), n_mut)
    cols = rng.integers(0, length, n * n_mut)
    muts[rows, cols] = alpha[rng.integers(0, 4, n * n_mut)]
    lens = np.full(n, length, np.int32)
    return muts, refs, lens


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=4096)
    ap.add_argument("--length", type=int, default=1022)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    from sequencealigning_tpu.io.encode import pack_arrays
    from sequencealigning_tpu.parallel.runner import DataParallelRunner

    on_tpu = jax.default_backend() == "tpu"
    B, L = (args.pairs, args.length) if on_tpu else (64, 126)
    iters = args.iters if on_tpu else 2

    runner = DataParallelRunner(np_slots=128 if on_tpu else 2)
    rng = np.random.default_rng(7)

    # --- tunnel microbench -------------------------------------------------
    dev = jax.devices()[0]
    one = jax.device_put(np.ones((8, 128), np.int32), dev)
    tiny = jax.jit(lambda a: a.sum())
    _force(tiny(one))
    t0 = time.perf_counter()
    n_rt = 10
    for _ in range(n_rt):
        _force(tiny(one))
    rt_ms = (time.perf_counter() - t0) / n_rt * 1e3

    h2d = {}
    reduce_any = jax.jit(lambda a: a.astype(np.int32).sum())
    for mb in (1, 4, 8, 16):
        a = rng.integers(0, 127, (mb << 20,), dtype=np.int8)
        x = jax.device_put(a, dev)
        _force(reduce_any(x))  # warm compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            x = jax.device_put(a, dev)
            _force(reduce_any(x))
            best = min(best, time.perf_counter() - t0)
        best -= rt_ms / 1e3  # take out the forced-read round trip
        h2d[f"{mb}MB"] = {
            "ms": round(best * 1e3, 2),
            "MBps": round(mb / best, 1),
        }

    d2h = {}
    for mb in (1, 8):
        mk = jax.jit(
            lambda: jax.numpy.zeros((mb << 20,), np.int8), static_argnums=()
        )
        x = mk()
        _force(x[:8])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(x)
            best = min(best, time.perf_counter() - t0)
        d2h[f"{mb}MB"] = {
            "ms": round(best * 1e3, 2),
            "MBps": round(mb / best, 1),
        }

    # --- per-stage serial profile ------------------------------------------
    # Warm everything once.
    m, r, l = synth(rng, B, L)
    batch = pack_arrays(m, r, l, l, batch_size=B)
    dev_args, plan, _B, has_n = runner._stream_args(batch)
    fn = runner._stream_fn(plan, has_n=has_n)
    _force(fn(*dev_args))

    stages = {k: [] for k in ("synth", "pack", "prep", "h2d", "step")}
    for _ in range(iters):
        t0 = time.perf_counter()
        m, r, l = synth(rng, B, L)
        t1 = time.perf_counter()
        batch = pack_arrays(m, r, l, l, batch_size=B)
        t2 = time.perf_counter()
        host_args, plan2, _, has_n2 = runner._stream_args_host(batch)
        t3 = time.perf_counter()
        dev_args = runner._put_stream_args(host_args, has_n2)
        # force the transfer: tiny reduce on the largest operand
        _force(reduce_any(dev_args[0]))
        t4 = time.perf_counter()
        out = fn(*dev_args)
        _force(out)
        t5 = time.perf_counter()
        stages["synth"].append(t1 - t0)
        stages["pack"].append(t2 - t1)
        stages["prep"].append(t3 - t2)
        stages["h2d"].append(t4 - t3)
        stages["step"].append(t5 - t4)

    med = {k: round(float(np.median(v)) * 1e3, 2) for k, v in stages.items()}
    med["total_sync"] = round(sum(med.values()), 2)

    # --- pipelined loop (the real streaming path) ---------------------------
    from sequencealigning_tpu.parallel.streaming import stream_align

    from sequencealigning_tpu.io.encode import pack_wire

    def gen(n_batches, wire):
        rng2 = np.random.default_rng(11)
        pk = pack_wire if wire else pack_arrays
        for _ in range(n_batches):
            m, r, l = synth(rng2, B, L)
            yield pk(m, r, l, l, batch_size=B)

    n_batches = max(iters, 4)
    pipe = {}
    for wire in (False, True):
        stream_align(gen(2, wire), runner=runner, batch_size=B)  # warm
        t0 = time.perf_counter()
        n = stream_align(gen(n_batches, wire), runner=runner, batch_size=B)
        dt = time.perf_counter() - t0
        pipe["wire" if wire else "pairbatch"] = dt / n_batches * 1e3
    pipelined_ms = pipe["wire"]

    cells = B * L * L
    result = {
        "pairs": B,
        "length": L,
        "backend": jax.default_backend(),
        "tunnel_roundtrip_ms": round(rt_ms, 2),
        "h2d": h2d,
        "d2h": d2h,
        "stage_ms": med,
        "pipelined_ms_per_batch_pairbatch": round(pipe["pairbatch"], 2),
        "pipelined_ms_per_batch": round(pipelined_ms, 2),
        "pipelined_pairs_per_s": round(B / (pipelined_ms / 1e3), 1),
        "pipelined_gcups": round(cells / (pipelined_ms / 1e3) / 1e9, 2),
    }
    print(json.dumps(result, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
            f.write("\n")
    return 0


if __name__ == "__main__":
    _sys.exit(main())
