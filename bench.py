"""Benchmark: affine-gap NW (Gotoh) DP-fill throughput on one chip.

Workload = BASELINE config 2: a batch of 64 pairs of ~2 kb DNA.  Reports
GCUPS (1e9 DP cell updates / second), counting only true n1*n2 cells per
pair (padding work is not credited).  vs_baseline is against the 50
GCUPS/chip north-star target (BASELINE.md).

Prints ONE JSON line on stdout; human-readable detail goes to stderr.
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax

    from sequencealigning_tpu.config import ScoringScheme
    from sequencealigning_tpu.io.encode import pack_batch, round_up
    from sequencealigning_tpu.ops.nw_affine import gotoh_fill_pallas

    on_tpu = jax.default_backend() == "tpu"
    # 512 pairs amortizes the axon tunnel's ~26 ms per-call round trip
    # (dispatches are not overlapped by the tunnel); the kernel's intrinsic
    # rate is what production streaming achieves.
    n_pairs, length = (512, 2048) if on_tpu else (8, 256)

    rng = np.random.default_rng(42)
    pairs = []
    for _ in range(n_pairs):
        ref = rng.choice(list(b"ACGT"), length).astype(np.uint8).tobytes()
        mut = bytearray(ref)
        for _ in range(length // 100):  # ~1% divergence
            p = int(rng.integers(0, len(mut)))
            mut[p] = int(rng.choice([c for c in b"ACGT" if c != mut[p]]))
        pairs.append((bytes(mut), ref))

    batch = pack_batch(pairs, batch_size=n_pairs)
    B, L1 = batch.query.shape
    _, L2 = batch.db.shape
    P = round_up(L2 + 1, 128)
    s2v = np.zeros((B, P), np.int32)
    s2v[:, 1 : L2 + 1] = batch.db
    dsum = (batch.query_len + batch.db_len).astype(np.int32)[:, None]
    n2mask = (
        np.arange(P, dtype=np.int32)[None, :] == batch.db_len[:, None]
    ).astype(np.int32)
    args = (
        jax.numpy.asarray(batch.query, jax.numpy.int32),
        jax.numpy.asarray(s2v),
        jax.numpy.asarray(dsum),
        jax.numpy.asarray(n2mask),
    )

    cells = float(
        (batch.query_len.astype(np.int64) * batch.db_len.astype(np.int64)).sum()
    )

    def make_fn(with_dirs: bool):
        # Whole call under jit: per-op eager dispatch through the axon
        # tunnel costs ~0.7 s flat.  Timing forces a device->host read of
        # the finals (block_until_ready alone does not guarantee completion
        # through the tunnel).
        @jax.jit
        def fn(a, b, c, d):
            finals, _ = gotoh_fill_pallas(
                a, b, c, d, L1, L2, ScoringScheme(), True, False, with_dirs,
            )
            return finals
        return fn

    results = {}
    for label, with_dirs in (("fill+dirs", True), ("score_only", False)):
        fn = make_fn(with_dirs)
        np.asarray(fn(*args))  # compile + warmup
        n_iter = 5 if on_tpu else 1
        t0 = time.perf_counter()
        for _ in range(n_iter):
            np.asarray(fn(*args))
        dt = (time.perf_counter() - t0) / n_iter
        gcups = cells / dt / 1e9
        results[label] = gcups
        print(
            f"[bench] {label}: {dt*1e3:.2f} ms/batch, {gcups:.2f} GCUPS "
            f"({n_pairs} pairs x {length} bp, backend={jax.default_backend()})",
            file=sys.stderr,
        )

    primary = results["fill+dirs"]
    print(
        json.dumps(
            {
                "metric": "affine_nw_fill_gcups_per_chip",
                "value": round(primary, 3),
                "unit": "GCUPS",
                "vs_baseline": round(primary / 50.0, 4),
                "detail": {
                    "score_only_gcups": round(results["score_only"], 3),
                    "pairs": n_pairs,
                    "length": length,
                    "backend": jax.default_backend(),
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
