"""Data-parallel weak-scaling harness (BASELINE config-5 efficiency metric).

On a real multi-chip slice this measures true scaling efficiency (target
>= 90% at 2 hosts).  Without one, run it on the virtual CPU mesh to
validate the harness + sharding structurally:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python benchmarks/scaling_bench.py

Writes BENCH_SCALING.json: pairs/s and efficiency vs the 1-device mesh at
each device count (weak scaling: the batch grows with the mesh).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_SCALING.json")
    ap.add_argument("--pairs-per-device", type=int, default=None)
    ap.add_argument("--length", type=int, default=None)
    args = ap.parse_args()

    import os

    import jax

    # The axon TPU plugin overrides JAX_PLATFORMS; honor an explicit cpu
    # request (the virtual-mesh mode) via jax.config like tests/conftest.
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from sequencealigning_tpu.io.encode import pack_batch
    from sequencealigning_tpu.parallel.mesh import make_mesh
    from sequencealigning_tpu.parallel.runner import DataParallelRunner
    from sequencealigning_tpu.utils.timing import scaling_efficiency

    on_tpu = jax.default_backend() == "tpu"
    per_dev = args.pairs_per_device or (512 if on_tpu else 16)
    length = args.length or (1023 if on_tpu else 48)
    nd_all = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= nd_all]

    rng = np.random.default_rng(7)

    def mk_batch(n_pairs):
        pairs = []
        for _ in range(n_pairs):
            ref = rng.choice(list(b"ACGT"), length).astype(np.uint8).tobytes()
            pairs.append((ref, ref))
        return pack_batch(pairs, batch_size=n_pairs)

    batches = {n: mk_batch(n * per_dev) for n in counts}

    def make_runner(n):
        mesh = make_mesh((n,), ("data",), devices=jax.devices()[:n])
        return DataParallelRunner(mesh=mesh)

    results = scaling_efficiency(
        make_runner, lambda n: batches[n], counts, n_iter=3
    )
    out = {
        "backend": jax.default_backend(),
        "pairs_per_device": per_dev,
        "length": length,
        "results": {str(k): v for k, v in results.items()},
    }
    if jax.default_backend() == "cpu":
        out["note"] = (
            "virtual-mesh run: all fake devices share one host's cores, so "
            "weak-scaling efficiency is bounded by the host, not the "
            "sharding math -- this validates the harness + shardings "
            "structurally; efficiency targets apply to real-slice runs"
        )
    for n, r in results.items():
        print(
            f"[scaling] {n} dev: {r['pairs_per_s']:.1f} pairs/s, "
            f"efficiency {r['efficiency']:.2%}",
            file=sys.stderr,
        )
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
