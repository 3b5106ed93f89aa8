"""Run the five BASELINE.md evaluation configs and write BENCH_CONFIGS.json.

Each config reports a throughput metric and a correctness check (sampled
against the scalar oracles / cross-algorithm identities).  Off-TPU the
sizes shrink to smoke-test scale; on TPU the full config shapes run.

Usage: python benchmarks/configs_bench.py [--out BENCH_CONFIGS.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

from sequencealigning_tpu.utils.compilecache import enable as _enable_cache

_enable_cache()


def _mkpairs(rng, n, length, divergence=0.01):
    pairs = []
    for _ in range(n):
        ref = rng.choice(list(b"ACGT"), length).astype(np.uint8).tobytes()
        mut = bytearray(ref)
        for _ in range(max(1, int(length * divergence))):
            p = int(rng.integers(0, len(mut)))
            mut[p] = int(rng.choice([c for c in b"ACGT" if c != mut[p]]))
        pairs.append((bytes(mut), ref))
    return pairs


def _cells(batch):
    return float(
        (batch.query_len.astype(np.int64) * batch.db_len.astype(np.int64)).sum()
    )


def config1_linear(on_tpu):
    """Linear-gap NW, single pair ~1 kb: exact score + CIGAR."""
    from sequencealigning_tpu.io.encode import pack_batch
    from sequencealigning_tpu.ops import oracle_linear
    from sequencealigning_tpu.ops.nw_linear import nw_linear_batch
    from sequencealigning_tpu.ops.traceback import linear_traceback_pair
    from sequencealigning_tpu.utils.cigar import cigar_from_pair

    length = 1023 if on_tpu else 96
    rng = np.random.default_rng(1)
    (s1, s2) = _mkpairs(rng, 1, length)[0]
    batch = pack_batch([(s1, s2)] * 8, batch_size=8)

    np.asarray(nw_linear_batch(
        batch.query, batch.db, batch.query_len, batch.db_len, with_dirs=True
    ).score)  # compile warmup (block: dispatch is async)
    t0 = time.perf_counter()
    res = nw_linear_batch(
        batch.query, batch.db, batch.query_len, batch.db_len, with_dirs=True
    )
    score = int(np.asarray(res.score)[0])
    dirs0 = np.asarray(res.dirs)[:, 0, :]
    hits = linear_traceback_pair(dirs0, s1, s2, max_hits=1)
    dt = time.perf_counter() - t0

    # Exact oracle check (score + first alignment's CIGAR).
    vlen = min(length, 192)
    exp = oracle_linear.linear_score(s1[:vlen], s2[:vlen])
    res_v = nw_linear_batch(
        *(lambda b: (b.query, b.db, b.query_len, b.db_len))(
            pack_batch([(s1[:vlen], s2[:vlen])] * 8, batch_size=8)
        ),
        with_dirs=False,
    )
    ok = int(np.asarray(res_v.score)[0]) == exp
    cigar = str(cigar_from_pair(hits[0][0], hits[0][1])) if hits else None
    return {
        "config": "1-linear-nw-1kb",
        "score": score,
        "cigar_len": len(cigar) if cigar else 0,
        "elapsed_s": round(dt, 4),
        "correct_vs_oracle": bool(ok),
    }


def config2_gotoh(on_tpu):
    """Affine-gap NW (Gotoh), 64 pairs ~2 kb: exact score + CIGAR."""
    from sequencealigning_tpu.io.encode import pack_batch, trim_for_stream
    from sequencealigning_tpu.ops import oracle_gotoh
    from sequencealigning_tpu.ops.nw_affine_stream import nw_affine_stream_batch
    from sequencealigning_tpu.utils.cigar import cigar_from_pair

    n, length = (64, 2046) if on_tpu else (16, 96)
    rng = np.random.default_rng(2)
    pairs = _mkpairs(rng, n, length)
    batch = trim_for_stream(pack_batch(pairs, batch_size=n))

    # Production first-path contract through the PUBLIC model layer:
    # the r5 fused fill+walk dispatch (one jitted call runs fill AND the
    # on-device walk; 2-bit wire H2D; the dirs tensor never crosses the
    # device boundary -- the round-2 host walk fetched ~300 MB here and
    # dominated elapsed_s at ~29 s on the tunneled rig).
    from sequencealigning_tpu.config import AlignConfig, Algo
    from sequencealigning_tpu.models.gotoh import GotohAligner

    al = GotohAligner(
        AlignConfig(
            algo=Algo.NEEDLEMAN_WUNSCH, first_only=True,
            traceback="device" if on_tpu else "auto",
        )
    )
    al._align_batch_impl(pairs)  # compile warmup (fill+walk+decode)
    t0 = time.perf_counter()
    out = al._align_batch_impl(pairs)
    dt_all = time.perf_counter() - t0

    n_aligned = sum(1 for r in out if isinstance(r, dict))
    # Sample-verify exact scores vs the scalar oracle.
    ok = True
    for b in rng.choice(n, size=2, replace=False):
        exp = oracle_gotoh.gotoh_score(pairs[b][0], pairs[b][1])
        r = out[b]
        ok &= isinstance(r, dict) and r["score"] == exp
        if isinstance(r, dict):
            ok &= _score_alignment(
                r["aligned_query"], r["aligned_db"]
            ) == r["score"]
    return {
        "config": "2-gotoh-64x2kb",
        "e2e_gcups": round(_cells(batch) / dt_all / 1e9, 3),
        "alignments_per_s": round(n / dt_all, 1),
        "tracebacks_ok": n_aligned,
        "elapsed_s": round(dt_all, 4),
        "api": "GotohAligner.align_batch (fused fill+walk dispatch)",
        "correct_vs_oracle": bool(ok),
    }


def _score_alignment(a1, a2, match=5, mismatch=-4, open_=-8, ext=-6):
    """Reference-convention affine score of a gapped alignment pair."""
    s = 0
    in_gap = None
    for c1, c2 in zip(a1, a2):
        if c1 == "-" or c2 == "-":
            g = "1" if c1 == "-" else "2"
            s += ext + (open_ if in_gap != g else 0)
            in_gap = g
        else:
            s += match if c1 == c2 else mismatch
            in_gap = None
    return s


def config3_wfa(on_tpu):
    """WFA exact, 128 pairs ~10 kb low-divergence: score + CIGAR parity."""
    from sequencealigning_tpu.config import ScoringScheme, WfaPenalties
    from sequencealigning_tpu.io.encode import pack_batch
    from sequencealigning_tpu.ops.nw_banded import nw_banded_batch
    from sequencealigning_tpu.ops.nw_banded_diag import (
        nw_banded_diag_batch,
    )
    from sequencealigning_tpu.ops.wfa import (
        wfa_textbook_batch,
        wfa_traceback_host,
    )

    n, length, s_max = (128, 10230, 512) if on_tpu else (16, 120, 128)
    rng = np.random.default_rng(3)
    pairs = _mkpairs(rng, n, length, divergence=0.005)
    batch = pack_batch(pairs, batch_size=n)
    pen = WfaPenalties()

    np.asarray(wfa_textbook_batch(
        batch.query, batch.db, batch.query_len, batch.db_len,
        penalties=pen, band=64, s_max=s_max,
    ).score)  # compile warmup (block: dispatch is async)
    t0 = time.perf_counter()
    res = wfa_textbook_batch(
        batch.query, batch.db, batch.query_len, batch.db_len,
        penalties=pen, band=64, s_max=s_max,
    )
    scores = np.asarray(res.score)
    conv = np.asarray(res.converged)
    dt = time.perf_counter() - t0

    # Production route (models/wfa banded engine, in-regime schemes): banded
    # Gotoh fast4 fill + two-band score certificate.  Timed to the finals
    # fetch; the dirs tensor stays on device (the traceback below fetches
    # it once, outside the timing -- this rig's device->host tunnel runs at
    # ~8 MB/s and would otherwise dominate, PERF.md).
    eq_scheme_r = ScoringScheme(
        match_=0, mismatch=-pen.mismatch,
        gap_open=-pen.gap_open, gap_extend=-pen.gap_extend,
    )

    def banded_route():
        # Mirrors models/wfa._banded_route: diag fill + (band+128) cert.
        r = nw_banded_diag_batch(
            batch.query, batch.db, batch.query_len, batch.db_len,
            band=128, scheme=eq_scheme_r, compat=False, with_dirs="fast4",
        )
        c = nw_banded_diag_batch(
            batch.query, batch.db, batch.query_len, batch.db_len,
            band=256, scheme=eq_scheme_r, compat=False, with_dirs=False,
        )
        return np.asarray(r.finals), np.asarray(c.finals)

    banded_route()  # warmup
    t0 = time.perf_counter()
    bf1, bf2 = banded_route()
    dt_banded = time.perf_counter() - t0
    certified = int((bf1.max(1) == bf2.max(1)).sum())
    banded_agree = int(((-bf1.max(1) == scores) & conv).sum())

    # Full auto route through the model layer (native capped leg + banded
    # escapes), alignments included -- the production contract.
    from sequencealigning_tpu.config import AlignConfig, Algo
    from sequencealigning_tpu.models.wfa import WfaAligner

    al = WfaAligner(AlignConfig(algo=Algo.WFA, compat=False))
    al._align_batch_impl(pairs)  # warm ALL compile paths (incl. escapes)
    t0 = time.perf_counter()
    routed = al._align_batch_impl(pairs)
    dt_auto = time.perf_counter() - t0
    auto_ok = sum(
        1 for r, s, c in zip(routed, scores, conv)
        if isinstance(r, dict) and c and r["score"] == int(s)
    )

    # Cross-algorithm identity: WFA penalty == -(affine NW score) under the
    # equivalent maximizing scheme (match=0, mismatch=-x, open=-o, ext=-e).
    eq_scheme = ScoringScheme(
        match_=0, mismatch=-pen.mismatch,
        gap_open=-pen.gap_open, gap_extend=-pen.gap_extend,
    )
    idx = [0, n // 2, n - 1]
    vb = pack_batch(([pairs[i] for i in idx] * 3)[:8], batch_size=8)
    nwres = nw_banded_batch(
        vb.query, vb.db, vb.query_len, vb.db_len,
        band=160, scheme=eq_scheme, compat=False, with_dirs=False,
    )
    nw_finals = np.asarray(nwres.finals)
    ok = all(
        conv[i] and int(scores[j_]) == -int(nw_finals[j_].max())
        for j_, i in enumerate(idx)
    )
    # Traceback validity on one pair.
    p0, a1, a2 = wfa_traceback_host(res, 0, pairs[0][0], pairs[0][1], pen)
    ok &= (
        a1.replace("-", "").encode() == pairs[0][0]
        and a2.replace("-", "").encode() == pairs[0][1]
    )
    return {
        "config": "3-wfa-128x10kb",
        "pairs_per_s": round(n / dt_auto, 2),
        "pairs_per_s_banded_cert": round(n / dt_banded, 2),
        "pairs_per_s_wavefront": round(n / dt, 2),
        "auto_route_exact": auto_ok,
        "banded_certified": certified,
        "banded_score_agree": banded_agree,
        "converged": int(conv.sum()),
        "elapsed_s": round(dt_auto, 4),
        "correct_vs_oracle": bool(
            ok and banded_agree == n and auto_ok == n
        ),
    }


def config4_banded(on_tpu):
    """Banded affine, 1024 pairs ~5 kb, fixed band: score + CIGAR."""
    from sequencealigning_tpu.io.encode import pack_batch
    from sequencealigning_tpu.ops.nw_affine_stream import nw_affine_stream_batch

    n, length, band = (1024, 5115, 128) if on_tpu else (16, 100, 16)
    rng = np.random.default_rng(4)
    pairs = _mkpairs(rng, n, length)
    batch = pack_batch(pairs, batch_size=n)

    from sequencealigning_tpu.ops.nw_banded_diag import (
        nw_banded_diag_batch,
    )
    from sequencealigning_tpu.ops.traceback import (
        banded_diag_traceback_pair,
    )

    np.asarray(nw_banded_diag_batch(
        batch.query, batch.db, batch.query_len, batch.db_len,
        band=band, with_dirs="full",
    ).finals)  # compile warmup (block: dispatch is async)
    t0 = time.perf_counter()
    res = nw_banded_diag_batch(
        batch.query, batch.db, batch.query_len, batch.db_len,
        band=band, with_dirs="full",
    )
    finals = np.asarray(res.finals)
    dt = time.perf_counter() - t0

    # Kernel-only rate (inputs device-resident): the end-to-end number
    # above charges the per-call int8 transfer, which on a tunneled dev
    # box dwarfs the fill; production hosts pay ~PCIe instead.
    dt_row_full = _banded_kernel_only(batch, band, "full")
    # Production engines: the anti-diagonal kernel in all three modes.
    dt_diag_full, diag_lanes = _banded_diag_kernel_only(batch, band, "full")
    dt_diag_f4, _ = _banded_diag_kernel_only(batch, band, "fast4")
    dt_diag_sc, _ = _banded_diag_kernel_only(batch, band, False)

    # Verify a sample against the full (unbanded) streamed fill.
    idx = [0, n // 2, n - 1]
    vb = pack_batch(([pairs[i] for i in idx] * 3)[:8], batch_size=8)
    full = nw_affine_stream_batch(
        vb.query, vb.db, vb.query_len, vb.db_len,
        with_dirs=False, np_slots=1,
    )
    ok = all(
        int(finals[i].max()) == int(full.finals[j_].max())
        for j_, i in enumerate(idx)
    )
    # Co-optimal banded traceback on one pair (diag full layout).
    dirs0 = np.asarray(res.dirs)[:, 0, :]
    score0, alns = banded_diag_traceback_pair(
        dirs0, finals[0], pairs[0][0], pairs[0][1], res.k_lo_even,
        max_alignments=1,
    )
    ok &= bool(alns) and score0 == int(finals[0].max())

    # Production alignment path: fast4 fill + on-device batch walk (the
    # band dirs tensor never crosses the device boundary).
    from sequencealigning_tpu.ops.traceback_device import (
        banded_diag_align_device,
    )

    res_f4 = nw_banded_diag_batch(
        batch.query, batch.db, batch.query_len, batch.db_len,
        band=band, with_dirs="fast4",
    )
    s1s = [p[0] for p in pairs]
    s2s = [p[1] for p in pairs]
    banded_diag_align_device(
        res_f4.dirs, np.asarray(res_f4.finals), s1s, s2s, res_f4.k_lo_even
    )  # compile warmup (walk)
    t0 = time.perf_counter()
    res_f4 = nw_banded_diag_batch(
        batch.query, batch.db, batch.query_len, batch.db_len,
        band=band, with_dirs="fast4",
    )
    f4_finals = np.asarray(res_f4.finals)
    alns_dev, _sc = banded_diag_align_device(
        res_f4.dirs, f4_finals, s1s, s2s, res_f4.k_lo_even
    )
    dt_e2e_aln = time.perf_counter() - t0
    n_aln = sum(a is not None for a in alns_dev)
    ok &= n_aln == n
    for i in idx:
        if alns_dev[i] is not None:
            ok &= _score_alignment(*alns_dev[i]) == int(f4_finals[i].max())

    # Credit the lanes the kernel actually computes: the band is padded to
    # the batch's length-diff spread and rounded up to 128 lanes.
    diff = batch.query_len.astype(np.int64) - batch.db_len.astype(np.int64)
    k_lo_ = int(min(0, diff.min()) - band)
    k_hi_ = int(max(0, diff.max()) + band)
    K = -(-(k_hi_ - k_lo_ + 1) // 128) * 128
    band_cells = float(batch.db_len.astype(np.int64).sum()) * K
    diag_cells = float(batch.db_len.astype(np.int64).sum()) * diag_lanes
    return {
        "config": "4-banded-1024x5kb",
        "band_gcups": round(diag_cells / dt_diag_full / 1e9, 3),
        "band_gcups_fast4": round(diag_cells / dt_diag_f4 / 1e9, 3),
        "band_gcups_score_only": round(diag_cells / dt_diag_sc / 1e9, 3),
        "band_gcups_row_full": round(band_cells / dt_row_full / 1e9, 3),
        "band_gcups_e2e": round(band_cells / dt / 1e9, 3),
        "alignments_per_s": round(n / dt_e2e_aln, 1),
        "device_walks_ok": n_aln,
        "band_lanes": K,
        "band_lanes_diag": diag_lanes,
        "elapsed_s": round(dt, 4),
        "correct_vs_oracle": bool(ok),
    }


def _banded_kernel_only(batch, band: int, dirs_mode) -> float:
    """Best-of-3 fill time with device-resident inputs."""
    import jax
    import jax.numpy as jnp

    from sequencealigning_tpu.io.encode import round_up
    from sequencealigning_tpu.ops import nw_banded as nb

    qlen = batch.query_len
    dlen = batch.db_len
    B = batch.query.shape[0]
    L2 = batch.db.shape[1]
    diff = qlen.astype(np.int64) - dlen.astype(np.int64)
    k_lo = int(min(0, diff.min()) - band)
    k_hi = int(max(0, diff.max()) + band)
    K = round_up(k_hi - k_lo + 1, 128)
    backend = "pallas" if jax.default_backend() == "tpu" else "lax"
    bt, chunk = nb._pick_tile(B, K, dirs_mode)
    xp = round_up(L2 + 1, max(chunk, 128)) if backend == "pallas" else L2 + 1
    fn = nb._jitted_banded(
        backend, k_lo, K, L2, xp, nb.ScoringScheme(), True, False,
        dirs_mode, bt, chunk,
    )
    args = (
        jnp.asarray(np.asarray(batch.query, np.int8)),
        jnp.asarray(np.asarray(batch.db, np.int8)),
        jnp.asarray(qlen, jnp.int32)[:, None],
        jnp.asarray(dlen, jnp.int32)[:, None],
    )
    np.asarray(fn(*args)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(*args)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def _banded_diag_kernel_only(batch, band: int, want_dirs):
    """Best-of-3 anti-diagonal fill time with device-resident inputs.
    want_dirs: False | "fast4" | "full".  Returns (seconds, effective
    diagonal count)."""
    import jax
    import jax.numpy as jnp

    from sequencealigning_tpu.io.encode import round_up
    from sequencealigning_tpu.ops import nw_banded_diag as nd

    qlen = batch.query_len
    dlen = batch.db_len
    B = batch.query.shape[0]
    L1 = batch.query.shape[1]
    L2 = batch.db.shape[1]
    diff = qlen.astype(np.int64) - dlen.astype(np.int64)
    k_lo = int(min(0, diff.min()) - band)
    k_hi = int(max(0, diff.max()) + band)
    k_lo_even = k_lo - (k_lo & 1)
    L = round_up((k_hi - k_lo_even + 2) // 2, 128)
    k_hi_eff = k_lo + round_up(k_hi - k_lo + 1, 128) - 1
    if k_lo_even + 2 * L - 1 < k_hi_eff:
        L += 128
    backend = "pallas" if jax.default_backend() == "tpu" else "lax"
    bt, chunk = nd._pick_tile(B, L, want_dirs)
    n_need = (L1 + L2 + 1) // 2 + 1
    n_iters = round_up(n_need, chunk) if backend == "pallas" else n_need
    fn = nd._jitted_diag(
        backend, k_lo_even, L, n_iters, k_hi_eff, nd.ScoringScheme(), True,
        False, want_dirs, bt, chunk,
    )
    args = (
        jnp.asarray(np.asarray(batch.query, np.int8)),
        jnp.asarray(np.asarray(batch.db, np.int8)),
        jnp.asarray(qlen, jnp.int32)[:, None],
        jnp.asarray(dlen, jnp.int32)[:, None],
    )
    np.asarray(fn(*args)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(*args)[0])
        best = min(best, time.perf_counter() - t0)
    # Credit the EFFECTIVE band (clipped to the row kernel's padded range)
    # so row and diag numbers are per-identical-cell comparable.
    return best, k_hi_eff - k_lo + 1


def config5_streaming(on_tpu):
    """Streamed data-parallel throughput (config 5's single-chip slice;
    multi-host scaling is validated structurally on the virtual mesh)."""
    from sequencealigning_tpu.parallel.runner import DataParallelRunner
    from sequencealigning_tpu.parallel.streaming import stream_align

    n, length, bsz = (32768, 1022, 8192) if on_tpu else (64, 60, 32)
    rng = np.random.default_rng(5)
    pairs = _mkpairs(rng, n, length)
    runner = DataParallelRunner(np_slots=64 if on_tpu else 8,
                                bt=16 if on_tpu else 8)

    # Warm up compile on one batch so the rate reflects steady state.
    stream_align(pairs[:bsz], runner=runner, batch_size=bsz)
    t0 = time.perf_counter()
    n_done = stream_align(pairs, runner=runner, batch_size=bsz)
    dt = time.perf_counter() - t0
    rate = n_done / dt
    return {
        "config": "5-streaming-dp",
        "pairs_per_s": round(rate, 1),
        "pairs": n_done,
        "length": length,
        "projected_1M_pairs_s": round(1e6 / rate, 1),
        "elapsed_s": round(dt, 4),
        # Input contract (VERDICT r4 weak #7): (query, db) BYTE pairs,
        # host-packed per batch on the prep thread, scores only.  The
        # pre-packed 2-bit wire path is BENCH_1M.json.
        "input_contract": "byte-pairs host-packed, scores only",
    }


def _link_probe():
    """Scalar round-trip latency and 1 MB D2H bandwidth of the
    host<->device link, measured right before the configs run."""
    import jax
    import jax.numpy as jnp

    try:
        # Distinct device arrays per rep: np.asarray on the same object
        # reuses jax's cached host copy and measures nothing.
        ys = [
            (jnp.arange(1 << 20, dtype=jnp.int32) + i).astype(jnp.uint8)
            for i in range(4)
        ]
        for y in ys:
            y.block_until_ready()
        np.asarray(ys[0])  # warm the transfer path
        lat = []
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(ys[i + 1][:8])
            lat.append(time.perf_counter() - t0)
        bw = []
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(ys[i + 1])
            bw.append(time.perf_counter() - t0)
        return {
            "roundtrip_ms": round(min(lat) * 1e3, 1),
            "d2h_mb_s": round(1.0 / min(bw), 1),
        }
    except Exception as ex:  # pragma: no cover - probe must never fail a run
        return {"error": f"{type(ex).__name__}: {ex}"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_CONFIGS.json")
    ap.add_argument("--only", default=None, help="comma-separated config ids")
    args = ap.parse_args()

    import jax

    on_tpu = jax.default_backend() == "tpu"
    fns = {
        "1": config1_linear,
        "2": config2_gotoh,
        "3": config3_wfa,
        "4": config4_banded,
        "5": config5_streaming,
    }
    only = set(args.only.split(",")) if args.only else set(fns)
    results = []
    for cid, fn in fns.items():
        if cid not in only:
            continue
        try:
            r = fn(on_tpu)
        except Exception as ex:
            r = {"config": cid, "error": f"{type(ex).__name__}: {ex}"}
        results.append(r)
        print(json.dumps(r), file=sys.stderr)
    import datetime

    out = {
        "date": datetime.date.today().isoformat(),
        "backend": jax.default_backend(),
        # Link health at run time: this rig reaches the chip through a
        # tunnel whose latency/bandwidth drift run-to-run (measured 1.7x
        # swings on identical code within one day).  Recording the link
        # makes cross-run comparisons honest: compare configs against
        # runs with similar link numbers, not across regimes.
        "link": _link_probe(),
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
